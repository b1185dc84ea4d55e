"""On-TPU real-body parity check for the fused Pallas kernels.

The CI tests exercise the fused-iteration (ops/pallas_iter.py) and
whole-solve (ops/pallas_solve.py) kernel BODIES on plain arrays (interpret
runs of the real pallas_call are impractically slow on CPU — CLAUDE.md), so
a real lowering bug (tiling, VMEM overflow, bf16 contraction) would only
show up on the chip. This tool runs the actual kernels on the TPU against
the staged XLA path (setup_kkt -> build_schur -> pcg -> dz, the oracle that
tests/test_solver.py validates against a dense KKT solve) on identical
warm-started fig-8 MPC problems and records max deviations per (N, B) cell.

Two granularities:
  core:  sqp_iter_pallas vs the staged pipeline for ONE iteration's
         (dZX, dZU, lam, pcg_iters) — tight, no line-search discretization.
  solve: full solve_batched with iter_kernel / solve_kernel fused vs off —
         end-to-end (X, U, stats) through merit + line search + rho.

Usage (TPU): python tools/tpu_verify_kernels.py [--out TPU_KERNEL_PARITY.json]
"""

import argparse
import json
import sys

import numpy as np


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def core_parity(N, B, plant="indy7"):
    """One fused iteration core vs the staged XLA pipeline, split into the
    two claims that are actually testable (VERDICT r3 weak #4):

    pcg_same_inputs — identical Schur systems (XLA assembly) through the XLA
      PCG and the standalone Pallas PCG kernel: SAME preconditioner, SAME
      exit test (pcg.cuh:85-92), so per-lane iteration counts must be EQUAL.

    fused — sqp_iter_pallas assembles KKT/Schur INSIDE the kernel from the
      channelized dynamics; its float32 rounding differs from the XLA
      assembly, so on warm-started near-tolerance systems its PCG stops at
      different per-lane counts (counts are NOT comparable across different
      assemblies) and the inexact-solve lam difference is amplified into dz
      by R^-1 ~ 1/u_cost ~ 5e5 (schur_linsys.cuh dz recovery). The
      meaningful quality metric recorded instead: the fused lam's
      preconditioned residual |r^T z| evaluated in the XLA-assembled system
      must satisfy the same exit criterion (abs_tol + eps * |rho_init|, a
      small slack for the assembly delta) that stopped the XLA arm — i.e.
      both arms return valid inexact-Newton duals of the same contract.
      End-to-end equivalence (identical accepted steps through merit + line
      search) is the solve_iter/solve_solve sections' job.
    """
    import jax
    import jax.numpy as jnp

    from bench import steady_state_problem
    from gato_tpu.ops.kkt import setup_kkt
    from gato_tpu.ops.pallas_iter import sqp_iter_pallas
    from gato_tpu.ops.pallas_pcg import pcg_solve_batched_pallas
    from gato_tpu.ops.pcg import PCG_ABS_TOL, pcg_solve_batched
    from gato_tpu.ops.schur import btd_matvec, build_schur, compute_dz
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS

    (model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, _traj,
     _step) = steady_state_problem(N, B, plant=plant)
    skip = jnp.zeros(B, dtype=bool)
    max_pcg = DEFAULT_SOLVER_PARAMS["max_pcg_iters"]

    @jax.jit
    def assemble(X, U):
        kkt = jax.vmap(lambda X_, U_, xs_, r_, fe_: setup_kkt(
            model, cp, X_, U_, xs_, r_, fe_, dtj, 2))(X, U, x_s, ref, f_ext)
        schur = jax.vmap(lambda k, r: build_schur(k, r, model.nq))(kkt, hp.rho)
        return kkt, schur

    kkt, schur = assemble(X, U)

    def rho_of(lam_v):
        """|r^T z| of lam_v in the XLA-assembled system (the PCG exit
        quantity, pcg.cuh:85-92)."""
        mv = jax.vmap(btd_matvec)
        r = schur.gamma - mv(schur.S_main, schur.S_lower, lam_v)
        z = mv(schur.P_main, schur.P_lower, r)
        return jnp.abs(jnp.sum(r * z, axis=(-2, -1)))

    # the big arrays MUST be jit arguments, not captured constants: a
    # captured operand reaches the Pallas custom-call as an XLA constant
    # materialized in scoped VMEM, doubling the kernel's footprint past the
    # 16 MiB limit (observed OOM at B=32)
    args = (schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
            schur.gamma, lam, hp.pcg_tol)

    @jax.jit
    def run_xla(Sm, Sl, Pm, Pl, g, l0, tol):
        return pcg_solve_batched(Sm, Sl, Pm, Pl, g, l0, tol, max_pcg,
                                 skip=skip)

    @jax.jit
    def run_pal(Sm, Sl, Pm, Pl, g, l0, tol):
        return pcg_solve_batched_pallas(Sm, Sl, Pm, Pl, g, l0, tol, max_pcg,
                                        skip=skip)

    lam_a, it_a = run_xla(*args)
    # same VMEM bound as the solver's auto gate (solver/bsqp.py)
    nx = model.nx
    B_pad = max(8, -(-B // 8) * 8)
    N_pad = -(-N // 128) * 128
    vmem = (4 * nx * nx + 2 * nx + 2) * B_pad * N_pad * 4
    run_pallas_pcg = vmem <= 10 * 2**20
    if run_pallas_pcg:
        lam_b, it_b = run_pal(*args)

    @jax.jit
    def fused(X, U, lam):
        return sqp_iter_pallas(model, cp, X, U, x_s, ref, f_ext, lam,
                               hp.rho, hp.pcg_tol, skip, dtj, max_pcg, 2)

    dzx_c, dzu_c, lam_c, it_c = fused(X, U, lam)
    dZX_a, dZU_a, _, _ = jax.jit(
        lambda l: jax.vmap(compute_dz)(kkt, schur, l))(lam_a)

    thresh = np.asarray(PCG_ABS_TOL
                        + np.asarray(hp.pcg_tol) * np.asarray(rho_of(lam)))
    rho_a = np.asarray(rho_of(lam_a))
    rho_c = np.asarray(rho_of(lam_c))
    scale = max(float(np.max(np.abs(np.asarray(dZX_a)))), 1e-9)
    same = ({
        "iters_equal": bool((np.asarray(it_a) == np.asarray(it_b)).all()),
        "iters_xla": np.asarray(it_a).tolist(),
        "iters_pallas": np.asarray(it_b).tolist(),
        "lam_maxdiff": _maxdiff(lam_a, lam_b),
    } if run_pallas_pcg else
        {"skipped": f"vmem estimate {vmem/2**20:.1f} MiB > solver gate"})
    return {
        "pcg_same_inputs": same,
        "fused": {
            "iters_fused": np.asarray(it_c).tolist(),
            "exit_rho_ratio_xla_arm": float(np.max(rho_a / thresh)),
            "exit_rho_ratio_fused_arm": float(np.max(rho_c / thresh)),
            "lam_maxdiff": _maxdiff(lam_a, lam_c),
            "dzx_maxdiff": _maxdiff(dZX_a, dzx_c),
            "dzu_maxdiff": _maxdiff(dZU_a, dzu_c),
            "dz_scale": scale,
            "dzu_amplification_Rinv": float(
                1.0 / max(float(np.asarray(cp.u_cost)), 1e-12)),
        },
    }


def solve_parity(N, B, arm, plant="indy7"):
    """Full solve: iter_kernel or solve_kernel fused vs both off."""
    import jax
    import numpy as np

    from bench import steady_state_problem
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS
    from gato_tpu.solver.bsqp import solve_batched_jit
    from gato_tpu.solver.types import BSQPSettings

    p = DEFAULT_SOLVER_PARAMS

    def mk(**kw):
        return BSQPSettings(N=N, max_sqp_iters=p["max_sqp_iters"],
                            max_pcg_iters=p["max_pcg_iters"],
                            linear_solver="pcg", **kw)

    base = mk(iter_kernel="off", solve_kernel="off")
    (model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, _traj,
     _step) = steady_state_problem(N, B, plant=plant, settings=base)
    test = (mk(iter_kernel="fused", solve_kernel="off") if arm == "iter"
            else mk(solve_kernel="fused"))

    outs = {}
    for name, st in (("off", base), ("fused", test)):
        Xo, Uo, _lam, _hp, stats = solve_batched_jit(
            model, st, cp, hp, X, U, lam, x_s, ref, f_ext, dtj)
        outs[name] = jax.tree.map(np.asarray, (Xo, Uo, stats))
    (X0, U0, s0), (X1, U1, s1) = outs["off"], outs["fused"]
    return {
        "X_maxdiff": _maxdiff(X0, X1), "U_maxdiff": _maxdiff(U0, U1),
        "final_merit_reldiff": float(np.max(
            np.abs(s0.final_merit - s1.final_merit)
            / np.maximum(np.abs(s0.final_merit), 1e-6))),
        "step_equal": bool(np.array_equal(s0.ls_step_size, s1.ls_step_size)),
        "pcg_iters_off": s0.pcg_iters[0].tolist(),
        "pcg_iters_fused": s1.pcg_iters[0].tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TPU_KERNEL_PARITY.json")
    ap.add_argument("--cells",
                    default="8:1,8:32,16:32,32:1,32:8,64:8,128:1,32:64")
    ap.add_argument("--plant", default="indy7", choices=["indy7", "iiwa14"])
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    cells = [tuple(map(int, c.split(":"))) for c in args.cells.split(",")]
    results = {"meta": {"backend": backend,
                        "device": str(jax.devices()[0]),
                        "note": "real-body Pallas-vs-XLA parity; "
                                "warm-started fig-8 MPC problems. Cells "
                                "beyond one kernel grid chunk (e.g. N32_B64)"
                                " exercise the chained per-iteration driver "
                                "(ops/pallas_solve.py::"
                                "sqp_solve_pallas_chained)."}}
    pre = "" if args.plant == "indy7" else f"{args.plant}_"
    for N, B in cells:
        key = f"{pre}N{N}_B{B}"
        print(f"--- {key} core", flush=True)
        results[key] = {"core": core_parity(N, B, plant=args.plant)}
        for arm in ("iter", "solve"):
            print(f"--- {key} solve[{arm}]", flush=True)
            results[key][f"solve_{arm}"] = solve_parity(N, B, arm,
                                                        plant=args.plant)
        print(json.dumps(results[key], indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
