"""Batched hyperparameter search (gato_hparam_batch.ipynb analogue): one
solver instance runs B lanes with different per-lane rho on the SAME problem
and we compare the best-lane convergence against a single adaptive-rho solve,
over a set of random EE goals (iiwa14, N=64 in the notebook; configurable)."""

import argparse
import os
import sys

# runnable without an editable install; never PYTHONPATH=. (CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gato_tpu.api.interface import BSQP
from gato_tpu.api.config import PICKPLACE_SOLVER_PARAMS
from gato_tpu.dynamics.algorithms import ee_position
from gato_tpu.robots.model import load_robot


def run_trial(solver, x0, goal, N):
    B = solver.batch_size
    ref = np.tile(np.concatenate([goal, np.zeros(3)]), (B, N)).astype(np.float32)
    XU = np.tile(np.concatenate(
        [np.tile(np.concatenate([x0, np.zeros(solver.nu, np.float32)]), N - 1), x0]
    ), (B, 1))
    solver.reset_dual()
    solver.reset_rho()
    solver.solve(np.tile(x0, (B, 1)), ref, XU)
    s = solver.get_stats()
    curve = s["best_merit_per_iter_normalized"]
    return np.asarray(curve, dtype=np.float64)


def main(plant="iiwa14", N=64, batch=16, trials=10, max_iters=10, seed=0,
         save=None):
    rng = np.random.default_rng(seed)
    model = load_robot(plant)
    nq = model.nq
    params = dict(PICKPLACE_SOLVER_PARAMS, max_sqp_iters=max_iters)

    rho_batch = np.logspace(-5, 0, batch).astype(np.float32)
    batched = BSQP(plant_type=plant, batch_size=batch, N=N, dt=0.03125,
                   rho_batch=rho_batch, adapt_rho=False,
                   **{k: v for k, v in params.items()
                      if k not in ("rho",)})
    single = BSQP(plant_type=plant, batch_size=1, N=N, dt=0.03125,
                  adapt_rho=True, **params)

    curves_b, curves_s = [], []
    for t in range(trials):
        q0 = rng.uniform(-0.4, 0.4, nq).astype(np.float32)
        x0 = np.concatenate([q0, np.zeros(nq, np.float32)])
        ee0 = np.asarray(ee_position(model, jnp.asarray(q0)))[:3]
        goal = ee0 + rng.uniform(-0.25, 0.25, 3)
        cb = run_trial(batched, x0, goal, N)
        cs = run_trial(single, x0, goal, N)
        L = min(len(cb), len(cs))
        if L:
            curves_b.append(cb[:L])
            curves_s.append(cs[:L])

    L = min(len(c) for c in curves_b + curves_s)
    cb = np.mean([c[:L] for c in curves_b], axis=0)
    cs = np.mean([c[:L] for c in curves_s], axis=0)
    print("\nnormalized best merit per SQP iteration (mean over trials):")
    print("iter   batched-rho   single-adaptive")
    for i in range(L):
        print(f"{i+1:4d}   {cb[i]:11.4f}   {cs[i]:15.4f}")
    if L:
        print(f"\nfinal: batched {cb[-1]:.4f} vs single {cs[-1]:.4f} "
              f"({'batched wins' if cb[-1] < cs[-1] else 'single wins'})")
    if save:
        # convergence-regression artifact, the reference's
        # examples/gato_hparam_batch_results.pkl analogue
        import json
        with open(save, "w") as f:
            json.dump({"plant": plant, "N": N, "batch": batch,
                       "trials": trials, "max_iters": max_iters,
                       "rho_grid": "logspace(-5, 0, batch)",
                       "batched_rho_curve": [round(float(v), 5) for v in cb],
                       "single_adaptive_curve": [round(float(v), 5) for v in cs],
                       "note": ("normalized best-merit per SQP iteration, "
                                "mean over trials; lower is better")}, f,
                      indent=1)
        print(f"saved -> {save}")
    return cb, cs


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--plant", default="iiwa14")
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--max-iters", type=int, default=10)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    main(args.plant, args.N, args.batch, args.trials, args.max_iters,
         save=args.save)
