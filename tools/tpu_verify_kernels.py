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


def core_parity(N, B):
    """One fused iteration core vs the staged XLA pipeline."""
    import jax
    import jax.numpy as jnp

    from bench import steady_state_problem
    from gato_tpu.ops.kkt import setup_kkt
    from gato_tpu.ops.pallas_iter import sqp_iter_pallas
    from gato_tpu.ops.pcg import pcg_solve_batched
    from gato_tpu.ops.schur import build_schur, compute_dz
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS

    (model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, _traj,
     _step) = steady_state_problem(N, B)
    skip = jnp.zeros(B, dtype=bool)
    max_pcg = DEFAULT_SOLVER_PARAMS["max_pcg_iters"]

    @jax.jit
    def staged(X, U, lam):
        kkt = jax.vmap(lambda X_, U_, xs_, r_, fe_: setup_kkt(
            model, cp, X_, U_, xs_, r_, fe_, dtj, 2))(X, U, x_s, ref, f_ext)
        schur = jax.vmap(lambda k, r: build_schur(k, r, model.nq))(kkt, hp.rho)
        lam_o, iters = pcg_solve_batched(
            schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
            schur.gamma, lam, hp.pcg_tol, max_pcg, skip=skip)
        dZX, dZU, _, _ = jax.vmap(compute_dz)(kkt, schur, lam_o)
        return dZX, dZU, lam_o, iters

    @jax.jit
    def fused(X, U, lam):
        return sqp_iter_pallas(model, cp, X, U, x_s, ref, f_ext, lam,
                               hp.rho, hp.pcg_tol, skip, dtj, max_pcg, 2)

    ax, au, al, ai = jax.tree.map(np.asarray, staged(X, U, lam))
    bx, bu, bl, bi = jax.tree.map(np.asarray, fused(X, U, lam))
    # dz scale for relative context (the step the line search consumes)
    scale = max(float(np.max(np.abs(ax))), 1e-9)
    return {
        "dzx_maxdiff": _maxdiff(ax, bx), "dzu_maxdiff": _maxdiff(au, bu),
        "lam_maxdiff": _maxdiff(al, bl), "dz_scale": scale,
        "pcg_iters_xla": np.asarray(ai).tolist(),
        "pcg_iters_fused": np.asarray(bi).tolist(),
    }


def solve_parity(N, B, arm):
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
     _step) = steady_state_problem(N, B, settings=base)
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
    ap.add_argument("--cells", default="8:1,8:32,16:32,32:1,32:8,64:8,128:1")
    args = ap.parse_args()

    import jax
    from gato_tpu.ops.pallas_iter import iter_capacity

    backend = jax.default_backend()
    cells = [tuple(map(int, c.split(":"))) for c in args.cells.split(",")]
    results = {"meta": {"backend": backend,
                        "device": str(jax.devices()[0]),
                        "note": "real-body Pallas-vs-XLA parity; "
                                "warm-started fig-8 MPC problems"}}
    for N, B in cells:
        if B > iter_capacity(N):
            continue
        key = f"N{N}_B{B}"
        print(f"--- {key} core", flush=True)
        results[key] = {"core": core_parity(N, B)}
        for arm in ("iter", "solve"):
            print(f"--- {key} solve[{arm}]", flush=True)
            results[key][f"solve_{arm}"] = solve_parity(N, B, arm)
        print(json.dumps(results[key], indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
