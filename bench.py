"""Headline benchmark: batched BSQP solve throughput on one TPU chip.

Workload matches the reference's heatmap benchmark (examples/benchmark_fig8.py
:80-105 / BASELINE.md): indy7 figure-8 tracking MPC step, DEFAULT solver
params (max_sqp_iters=1, max_pcg_iters=200, dt=0.01), batched solve latency.

Timing note: on this tunneled TPU runtime, per-dispatch wall timing cannot
resolve sub-ms programs (the dispatch itself costs 50-400us with heavy
jitter, and block_until_ready does not reliably wait). The default timing
chains k closed-loop MPC cycles inside ONE jitted fori_loop (data-dependent
carry) and takes the slope between two chain lengths — pure sustained device
time per cycle (gato_tpu/utils/timing.py:time_loop_fn).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: solves/s at N=32, B=512 (reference: 512 / 2.84 ms ~= 180282
solves/s on its desktop GPU; BASELINE.json floor is 1,000 solves/s per chip).
Pass --grid for the full (N x B) latency table like the reference heatmap.
"""

import argparse
import json

import numpy as np

BASELINE_SOLVES_PER_S = 512 / 2.84e-3  # BASELINE.md N=32, B=512

# Reference heatmap (ms) for vs_baseline on --grid runs (BASELINE.md)
REFERENCE_MS = {
    (8, 1): 0.09, (8, 32): 0.10, (8, 128): 0.15, (8, 512): 0.58,
    (16, 1): 0.10, (16, 32): 0.12, (16, 128): 0.31, (16, 512): 1.37,
    (32, 1): 0.10, (32, 32): 0.17, (32, 128): 0.65, (32, 512): 2.84,
    (64, 1): 0.12, (64, 32): 0.37, (64, 128): 1.48, (64, 512): 7.76,
    (128, 1): 0.16, (128, 32): 0.93, (128, 128): 3.15, (128, 512): 19.98,
}


def pick_solver(N, B, requested="auto"):
    """Static per-shape linear-solver choice. On TPU at N<=128 the
    whole-solve megakernel (solve_kernel="auto", pcg-only) beats both the
    staged path and the direct BTD solve at every measured (N,B) cell
    (tools/tune_gates.py, round 3) — so pcg everywhere there. Off-TPU or at
    unsupported horizons: btd at large batch, staged pcg at small
    (the round-1/2 staged-path crossover)."""
    if requested != "auto":
        return requested
    import jax
    if jax.default_backend() == "tpu" and N <= 128:
        return "pcg"
    return "btd" if B >= 32 else "pcg"


def steady_state_problem(N, B, plant="indy7", settings=None):
    """Warm a batch into the MPC steady state (6 closed-loop fig-8 cycles:
    solve -> RK4 sim under the first planned control -> roll the reference
    window). Returns (model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, traj,
    step) — the inputs every benchmark/verification arm starts from, so
    different kernel arms are compared on the identical warm-started problem
    (the reference's heatmap also times warm-started solves inside the
    closed loop, examples/benchmark_fig8.py:80-105)."""
    import jax
    import jax.numpy as jnp

    from gato_tpu.api.common import figure8, rk4_step
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
    from gato_tpu.ops.cost import CostParams
    from gato_tpu.robots.model import load_robot
    from gato_tpu.solver.bsqp import solve_batched_jit
    from gato_tpu.solver.types import BSQPSettings, HyperParams

    p = DEFAULT_SOLVER_PARAMS
    model = load_robot(plant)
    nx, nu = model.nx, model.nu
    if settings is None:
        settings = BSQPSettings(N=N, max_sqp_iters=p["max_sqp_iters"],
                                max_pcg_iters=p["max_pcg_iters"],
                                linear_solver=pick_solver(N, B, "auto"))
    cp = CostParams.create(q_cost=p["q_cost"], qd_cost=p["qd_cost"],
                           u_cost=p["u_cost"], N_cost=p["N_cost"],
                           q_lim_cost=p["q_lim_cost"])
    hp = HyperParams.create(B, rho=p["rho"], mu=p["mu"], pcg_tol=p["pcg_tol"])

    dt = 0.01
    if plant == "indy7":
        traj = figure8(dt).reshape(-1, 6)
        q0 = INDY7_START_CONFIGS["ready"]
    else:
        # elbow-bent start with the fig-8 centered on its EE and sized to
        # the ~0.8 m workspace: from the vertical zero pose (singular) with
        # the indy7-placed reference, several warm-started lanes' PCG
        # legitimately diverges (200 iters, NaN) and the "benchmark"
        # measures NaN-scrubbed degenerate solves
        from gato_tpu.api.config import IIWA14_START_CONFIGS
        traj = figure8(dt, A_x=0.25, A_z=0.25,
                       offset=(0.393, -0.393, 0.21)).reshape(-1, 6)
        q0 = IIWA14_START_CONFIGS["bent"]
    x0 = np.concatenate([q0, np.zeros(model.nq)]).astype(np.float32)

    X = jnp.asarray(np.tile(x0, (B, N, 1)))
    U = jnp.zeros((B, N - 1, nu), jnp.float32)
    lam = jnp.zeros((B, N, nx), jnp.float32)
    # Per-lane external-wrench hypotheses, as the reference's fig-8 benchmark
    # has at B>1 (ForceEstimator lanes): keeps every lane's subproblem
    # distinct and prevents the converged-early-exit path from trivializing
    # the measured solve. Lane 0 is the zero hypothesis (the estimator always
    # carries one, force_estimator.py:85) and drives the simulation — a lane
    # with a persistent phantom wrench cannot hold the steady state at
    # max_sqp_iters=1 (its line search starts failing within ~10 cycles).
    rng = np.random.default_rng(0)
    f_ext_np = rng.uniform(-5.0, 5.0, (B, 6)).astype(np.float32)
    f_ext_np[0] = 0.0
    f_ext = jnp.asarray(f_ext_np)
    dtj = jnp.float32(dt)

    step = 0
    x_s = jnp.asarray(np.tile(x0, (B, 1)))
    sim = jax.jit(lambda x, u: rk4_step(model, x, u, dtj, substeps=10))
    for step in range(6):
        ref = jnp.asarray(
            np.tile(traj[step:step + N], (B, 1, 1)).astype(np.float32))
        X, U, lam, _, _ = solve_batched_jit(
            model, settings, cp, hp, X, U, lam, x_s, ref, f_ext, dtj)
        # "measured" state from an RK4 simulation under the first planned
        # control — keeps the persistent integrator mismatch the reference's
        # closed-loop benchmark has (trapezoidal plan vs RK4 plant)
        x_s = jnp.tile(sim(x_s[0], U[0, 0])[None], (B, 1))
        X = X.at[:, 0, :].set(x_s)
    ref = jnp.asarray(np.tile(traj[step:step + N], (B, 1, 1)).astype(np.float32))
    return model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, traj, step


def bench_solve(N, B, plant="indy7", solver="auto", sqp_iters=None,
                verbose_work=False, return_work=False, timing="device",
                **setting_overrides):
    """Steady-state MPC solve time.

    timing="device": sustained per-cycle device time, measured by chaining
    k closed-loop MPC cycles (solve -> RK4 sim -> rolled fig-8 reference
    window) inside one jitted fori_loop — one host dispatch per chain, so
    the tunnel's per-dispatch jitter doesn't pollute sub-ms cycles. This is
    also how the framework actually runs closed-loop (api/rollout.py).
    timing="wall": legacy per-dispatch wall timing (includes host dispatch).
    """
    import jax
    import jax.numpy as jnp

    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS
    from gato_tpu.api.common import rk4_step
    from gato_tpu.solver.bsqp import solve_batched, solve_batched_jit
    from gato_tpu.solver.types import BSQPSettings
    from gato_tpu.utils.timing import time_fn, time_loop_fn

    p = DEFAULT_SOLVER_PARAMS
    settings = BSQPSettings(
        N=N, max_sqp_iters=sqp_iters or p["max_sqp_iters"],
        max_pcg_iters=p["max_pcg_iters"],
        linear_solver=pick_solver(N, B, solver),
        **setting_overrides,
    )
    (model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, traj,
     step) = steady_state_problem(N, B, plant=plant, settings=settings)
    nx, nu = model.nx, model.nu

    def f(X, U, lam):
        return solve_batched_jit(model, settings, cp, hp, X, U, lam,
                                 x_s, ref, f_ext, dtj)

    if verbose_work:
        out = f(X, U, lam)
        st_ = out[4]
        print(f"  [work] iters_run={int(st_.num_iters_run)} "
              f"pcg_iters(lane0)={int(st_.pcg_iters[0, 0])} "
              f"step(lane0)={float(st_.ls_step_size[0, 0]):.4f}")

    if timing == "wall":
        # Constant inputs: every rep solves the identical steady-state
        # problem (the single device serializes queued executions).
        return time_fn(f, (X, U, lam))

    # Device-sustained timing: chain k MPC cycles in one jitted scan — the
    # same closed loop as the warm-up (solve -> RK4 sim under the first
    # planned control -> roll the fig-8 reference window), so every chained
    # step is the genuine steady-state solve (NOT a frozen re-solve, whose
    # fixed point drifts into line-search failure). Each cycle includes the
    # one-knot RK4 sim (a few dynamics evals — small next to the solve, and
    # charged against us where the reference's timings exclude its sim).
    traj_dev = jnp.asarray(traj.astype(np.float32))
    T = traj_dev.shape[0]

    if jax.default_backend() == "tpu":
        from gato_tpu.ops.pallas_sim import rk4_step_batched_pallas

        # the scalar-shaped XLA rk4 costs ~3.5ms at one lane on this image;
        # the Pallas kernel runs the whole step on VMEM tiles
        def sim_chain(x1, u1):
            return rk4_step_batched_pallas(
                model, x1[None], u1[None], dtj, substeps=2)[0]
    else:
        def sim_chain(x1, u1):
            return rk4_step(model, x1, u1, dtj, substeps=2)

    def cycle(carry):
        Xc, Uc, lamc, xsc, i = carry
        refc = jax.lax.dynamic_slice(traj_dev, (i % (T - N), 0), (N, 6))
        refc = jnp.broadcast_to(refc[None], (B, N, 6))
        Xo, Uo, lamo, _, st = solve_batched(
            model, settings, cp, hp, Xc, Uc, lamc, xsc, refc, f_ext, dtj)
        xs1 = sim_chain(xsc[0], Uo[0, 0])
        xsn = jnp.broadcast_to(xs1[None], (B, nx))
        Xo = Xo.at[:, 0, :].set(xsn)
        return (Xo, Uo, lamo, xsn, i + 1), st

    @jax.jit
    def run_k(X, U, lam, x_s, i0, k):
        carry = (X, U, lam, x_s, i0)
        carry = jax.lax.fori_loop(0, k, lambda _, c: cycle(c)[0], carry)
        return carry[0]

    args0 = (X, U, lam, x_s, jnp.int32(step + 1))

    work = None
    if verbose_work or return_work:
        # per-cycle work trace over 8 chained steady-state cycles — the
        # evidence that a timed cell is doing real Krylov work and not
        # timing the converged early-exit branch (VERDICT r3/r4 ask)
        @jax.jit
        def run_stats(X, U, lam, x_s, i0):
            def body(c, _):
                c, st = cycle(c)
                return c, (st.pcg_iters[0], st.ls_step_size[0])
            _, work = jax.lax.scan(body, (X, U, lam, x_s, i0), None, length=8)
            return work
        piters, steps_ = run_stats(*args0)
        piters = np.asarray(piters)   # (8, B)
        steps_ = np.asarray(steps_)   # (8, B)
        work = {
            "pcg_iters_lane0": piters[:, 0].astype(int).tolist(),
            "step_lane0": [round(float(s), 4) for s in steps_[:, 0]],
            "pcg_iters_mean": round(float(piters.mean()), 2),
            "pcg_iters_max": int(piters.max()),
            "steps_accepted_frac": round(float((steps_ > 0).mean()), 3),
        }
        if verbose_work:
            print(f"  [work] chained pcg_iters(lane0)={piters[:, 0]}"
                  f" step(lane0)={steps_[:, 0]}"
                  f" mean={work['pcg_iters_mean']}"
                  f" max={work['pcg_iters_max']}")

    t = time_loop_fn(lambda k: run_k(*args0, jnp.int32(k)))
    if return_work:
        return t, work
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--plant", default="indy7", choices=["indy7", "iiwa14"])
    ap.add_argument("--solver", default="auto", choices=["auto", "pcg", "btd"])
    ap.add_argument("--timing", default="device", choices=["device", "wall"])
    ap.add_argument("--grid", action="store_true")
    ap.add_argument("--verbose-work", action="store_true",
                    help="record an 8-cycle chained work trace (pcg iters, "
                         "step sizes) per cell; in --grid mode the trace is "
                         "embedded in each cell's row and cells whose steady "
                         "state legitimately converges (pcg_iters==0: the "
                         "timed program takes the exit branch) are annotated")
    args = ap.parse_args()

    if args.grid:
        # B=1024 matches the reference's maximum instantiated batch
        # (bindings.cu:253-264); it has no recorded reference heatmap cell,
        # so vs_ref is null there
        rows = {}
        for N in (8, 16, 32, 64, 128):
            for B in (1, 32, 128, 512, 1024):
                t = bench_solve(N, B, plant=args.plant, solver=args.solver,
                                timing=args.timing,
                                return_work=args.verbose_work,
                                verbose_work=args.verbose_work)
                work = None
                if args.verbose_work:
                    t, work = t
                # the reference heatmap is indy7-only (BASELINE.md); other
                # plants get no vs_ref rather than a misleading ratio
                ref = REFERENCE_MS.get((N, B)) if args.plant == "indy7" else None
                rows[f"N{N}_B{B}"] = {
                    "ms": round(t * 1e3, 3),
                    "vs_ref": round(ref / (t * 1e3), 3) if ref else None,
                }
                if work is not None:
                    rows[f"N{N}_B{B}"]["work"] = work
                    if work["pcg_iters_max"] == 0:
                        rows[f"N{N}_B{B}"]["note"] = (
                            "steady state converged: chained pcg_iters all 0 "
                            "— this cell times the solver's converged exit "
                            "branch, not a full Krylov solve")
                print(f"N={N:3d} B={B:3d}: {t*1e3:8.3f} ms"
                      + (f"  (ref {ref} ms, x{ref/(t*1e3):.2f})" if ref else ""))
        # staged-path columns at large batch, kernels off: the
        # reference-parity PCG pipeline (the reference's only solver,
        # gato/bsqp/kernels/pcg.cuh) and the direct BTD solve — recorded so
        # the staged pcg-vs-btd crossover and the megakernel's margin over
        # both are documented from data (VERDICT r2 item 7)
        if args.solver == "auto":
            for N, B in ((32, 128), (32, 512)):
                for tag, overrides in (
                        ("pcg", dict(solver="pcg", iter_kernel="off",
                                     solve_kernel="off")),
                        ("btd", dict(solver="btd"))):
                    t = bench_solve(N, B, plant=args.plant,
                                    timing=args.timing, **overrides)
                    ref = (REFERENCE_MS.get((N, B))
                           if args.plant == "indy7" else None)
                    rows[f"N{N}_B{B}_{tag}"] = {
                        "ms": round(t * 1e3, 3),
                        "vs_ref": round(ref / (t * 1e3), 3) if ref else None,
                    }
                    print(f"N={N:3d} B={B:3d} ({tag}): {t*1e3:8.3f} ms")
        print(json.dumps({"metric": "bsqp_grid", "value": rows,
                          "unit": "ms", "vs_baseline": None}))
        return

    t = bench_solve(args.N, args.B, plant=args.plant, solver=args.solver, timing=args.timing)
    solves_per_s = args.B / t
    print(json.dumps({
        "metric": f"{args.plant}_N{args.N}_B{args.B}_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
