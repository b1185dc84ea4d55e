"""Figure-8 tracking under a constant external disturbance with batched
force-hypothesis estimation (gato_fig8_tracking.ipynb analogue): runs
B in {1, 32, 128} under a -60 N world-z EE force and reports how batching
plus the ForceEstimator improves tracking — the reference notebook's
headline qualitative result (batch hypotheses buy robustness)."""

import argparse
import json
import os
import sys

# runnable without an editable install; never PYTHONPATH=. (CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gato_tpu.api.common import figure8
from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
from gato_tpu.api.mpc import MPC_GATO


def main(batch_sizes=(1, 32, 128), fz=-60.0, N=32, sim_time=5.0, save=None):
    traj = figure8(0.01)
    x0 = np.concatenate([INDY7_START_CONFIGS["ready"], np.zeros(6)]).astype(np.float32)
    f_ext = np.array([0.0, 0.0, fz, 0.0, 0.0, 0.0])

    summary = {}
    detail = {}
    for B in batch_sizes:
        print(f"\n=== batch {B}, f_ext z = {fz} N ===", flush=True)
        mpc = MPC_GATO(plant_type="indy7", N=N, dt=0.01, batch_size=B,
                       constant_f_ext=f_ext,
                       solver_params=DEFAULT_SOLVER_PARAMS)
        _, stats = mpc.run_mpc_fig8(x0, traj, sim_dt=0.001, sim_time=sim_time)
        d = np.asarray(stats["goal_distances"])
        summary[B] = float(np.mean(d))
        tail = d[len(d) // 4:]
        detail[str(B)] = {
            "mean_err_m": round(float(np.mean(d)), 5),
            "steady_err_m": round(float(np.mean(tail)), 5),
            "max_err_m": round(float(np.max(d)), 5),
            "cycles": int(len(d)),
        }

    print("\nmean tracking error under disturbance:")
    for B, e in summary.items():
        print(f"  B={B:4d}: {e:.4f} m")
    if save:
        import jax
        rec = {
            "meta": {
                "workload": f"indy7 fig-8 MPC, DEFAULT params, constant "
                            f"{fz} N world-z EE force on the sim plant, "
                            f"sphere ForceEstimator hypotheses at B>1 "
                            f"(gato_fig8_tracking.ipynb headline sweep), "
                            f"N={N}, sim_time={sim_time}s",
                "backend": jax.default_backend(),
            },
            "cells": detail,
        }
        with open(save, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"saved -> {save}")
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 32, 128])
    ap.add_argument("--fz", type=float, default=-60.0)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--sim-time", type=float, default=5.0)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    main(tuple(args.batch_sizes), args.fz, N=args.N, sim_time=args.sim_time,
         save=args.save)
