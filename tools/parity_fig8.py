"""Closed-loop fig-8 tracking-error parity artifact (VERDICT round-1 item 3,
BASELINE.md target #2).

Runs the reference workload — figure-8 EE tracking MPC on indy7, DEFAULT
solver params, dt=0.01, one knot advanced per cycle — through the on-device
closed loop (api/rollout.py::closed_loop_rollout, the same solve the Python
MPC drives) for a grid of (N, B) and records the average/max EE tracking
error into PARITY_RESULTS.json. The reference prints the same quantity as
"Avg error" (python/bsqp/mpc_controller.py:274); its paper reports cm-level
errors for this task.

Tracking error definition matches run_mpc_fig8: after each cycle's sim step
the measured EE position is compared against knot 1 of the next reference
window (mpc_controller.py:263). The first quarter of the run is treated as
transient and excluded from the steady-state average.

Usage: python tools/parity_fig8.py [--cells N8_B1,N32_B1,...] [--cycles 400]
       (default cells: N in {8,32,128} x B in {1,32,128})
"""

import argparse
import json
import os
import sys

import numpy as np

# runnable as `python tools/parity_fig8.py` without an editable install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                   if "__file__" in globals() else ".", "PARITY_RESULTS.json")
OUT = os.path.normpath(OUT)


def run_cell(N, B, cycles, seed=0, sqp_iters=None, realtime=False):
    """realtime=True reproduces the reference benchmark's REAL-TIME
    EMULATION (mpc_controller.py:189-216): the simulation advances by the
    measured solve time each cycle, not by a full dt knot. With ~0.1-1 ms
    solves and dt=10 ms knots that means tens of solver calls per knot —
    the regime where the reference's max_sqp_iters=1 heatmap configuration
    tracks at cm level. The fixed one-knot-per-cycle mode (realtime=False)
    under-iterates the solver ~dt/t_solve-fold relative to what the
    reference's own benchmark loop ever executed; its N=128 errors are a
    harder workload, not a solver-quality gap (BASELINE.md note)."""
    import jax
    import jax.numpy as jnp

    from gato_tpu.api.common import figure8
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
    from gato_tpu.api.rollout import closed_loop_rollout
    from gato_tpu.ops.cost import CostParams
    from gato_tpu.robots.model import load_robot
    from gato_tpu.solver.types import BSQPSettings, HyperParams

    p = DEFAULT_SOLVER_PARAMS
    model = load_robot("indy7")
    dt = 0.01
    settings = BSQPSettings(N=N, max_sqp_iters=sqp_iters or p["max_sqp_iters"],
                            max_pcg_iters=p["max_pcg_iters"])
    cp = CostParams.create(q_cost=p["q_cost"], qd_cost=p["qd_cost"],
                           u_cost=p["u_cost"], N_cost=p["N_cost"],
                           q_lim_cost=p["q_lim_cost"])
    hp = HyperParams.create(B, rho=p["rho"], mu=p["mu"], pcg_tol=p["pcg_tol"])

    t_solve = None
    if realtime:
        import bench
        t_solve = bench.bench_solve(N, B, solver="pcg")
        # solves per knot, like the reference's sim-by-solve-time loop
        # (granularity: whole sub-knot fractions; capped at 100/knot)
        m = int(max(1, min(100, round(dt / t_solve))))
        control_dt = dt / m
    else:
        m, control_dt = 1, dt

    # fine-resolution reference: window k starts at sample k (control_dt
    # apart); its N knots stride m samples (dt apart)
    n_steps = cycles * m
    need = n_steps + N * m + 2
    period_samples = int(6 / control_dt)
    reps = need // period_samples + 2
    traj = figure8(control_dt, cycles=reps).reshape(-1, 6).astype(np.float32)
    n_steps = min(n_steps, traj.shape[0] - N * m - 2)
    idx = np.arange(n_steps)[:, None] + np.arange(N)[None, :] * m
    refs = traj[idx]

    q0 = INDY7_START_CONFIGS["ready"]
    x0 = np.concatenate([q0, np.zeros(6)]).astype(np.float32)

    rng = np.random.default_rng(seed)
    f_ext = rng.uniform(-5.0, 5.0, (B, 6)).astype(np.float32)
    f_ext[0] = 0.0  # the estimator always carries the zero hypothesis

    xs, ees, us = closed_loop_rollout(
        model, model, settings, cp, hp, jnp.asarray(x0), jnp.asarray(refs),
        jnp.asarray(f_ext), jnp.float32(dt), control_dt=control_dt,
        sim_substeps=max(1, 4 // m) if realtime else 4)
    ees = np.asarray(ees)
    goals = refs[:, 1, :3]  # knot-1 goal of the window each cycle tracked
    errs = np.linalg.norm(ees - goals, axis=1)
    tail = errs[n_steps // 4:]
    out = {
        "cycles": int(n_steps),
        "avg_err_m": round(float(tail.mean()), 5),
        "max_err_m": round(float(tail.max()), 5),
        "avg_err_all_m": round(float(errs.mean()), 5),
    }
    if realtime:
        out["t_solve_ms"] = round(t_solve * 1e3, 4)
        out["solves_per_knot"] = m
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="")
    ap.add_argument("--cycles", type=int, default=400)
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--sqp-iters", type=int, default=None,
                    help="override max_sqp_iters (cells get a _sqpK suffix); "
                         "at N=128 the DEFAULT 1-iteration budget leaves the "
                         "solve unconverged (0.34 m avg err) while 3 "
                         "iterations track at 0.043 m — the gap is iteration "
                         "budget, not solver quality")
    ap.add_argument("--platform", default="",
                    help="force jax platform (e.g. cpu) — the tracking-error "
                         "artifact is backend-independent to float roundoff")
    ap.add_argument("--realtime", action="store_true",
                    help="reference-faithful real-time emulation: the sim "
                         "advances by the measured device solve time per "
                         "cycle (cells get an _rt suffix); run on TPU")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.cells:
        cells = []
        for c in args.cells.split(","):
            n, b = c.strip().split("_")
            cells.append((int(n[1:]), int(b[1:])))
    else:
        cells = [(N, B) for N in (8, 32, 128) for B in (1, 32, 128)]

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    import jax
    results.setdefault("meta", {})
    # backend is recorded PER CELL (cells accumulate across runs on
    # different backends); meta.backend was a single global field in the
    # round-2 artifact — migrate it onto any unlabeled cells, then drop it
    old_backend = results["meta"].pop("backend", None)
    if old_backend:
        for k, v in results.items():
            if k != "meta" and isinstance(v, dict):
                v.setdefault("backend", old_backend)
    results["meta"]["workload"] = ("indy7 fig-8 closed loop, DEFAULT params, "
                                   "dt=0.01, control_dt=dt, zero-wrench lane "
                                   "drives; error vs knot-1 goal, steady "
                                   "state = last 3/4 of run")
    for N, B in cells:
        key = (f"N{N}_B{B}" + (f"_sqp{args.sqp_iters}" if args.sqp_iters
                               else "") + ("_rt" if args.realtime else ""))
        r = run_cell(N, B, args.cycles, sqp_iters=args.sqp_iters,
                     realtime=args.realtime)
        r["backend"] = jax.default_backend()
        results[key] = r
        print(f"{key}: avg {r['avg_err_m']*100:.2f} cm  "
              f"max {r['max_err_m']*100:.2f} cm  ({r['cycles']} cycles)")
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
