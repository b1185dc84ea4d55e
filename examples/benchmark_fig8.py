"""Figure-8 MPC benchmark across batch sizes (examples/benchmark_fig8.py
analogue): runs the closed-loop fig-8 task per batch size, reports tracking
error, solve time, and the speedup-vs-batch-1 table; pickles results for the
heatmap plot (plots/fig8_heatmap.py)."""

import argparse
import pickle

import numpy as np

from gato_tpu.api.common import figure8
from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
from gato_tpu.api.mpc import MPC_GATO


def run(N, batch_sizes, sim_time, f_ext=None, plant="indy7", dt=0.01,
        sim_dt=0.001, save=None):
    traj = figure8(dt)
    q0 = INDY7_START_CONFIGS["ready"] if plant == "indy7" else np.zeros(7)
    x0 = np.concatenate([q0, np.zeros_like(q0)]).astype(np.float32)

    results = {}
    for B in batch_sizes:
        print(f"\n=== N={N} batch={B} ===")
        mpc = MPC_GATO(plant_type=plant, N=N, dt=dt, batch_size=B,
                       constant_f_ext=f_ext,
                       solver_params=DEFAULT_SOLVER_PARAMS)
        _, stats = mpc.run_mpc_fig8(x0, traj, sim_dt=sim_dt, sim_time=sim_time)
        results[B] = {
            "avg_error_m": float(np.mean(stats["goal_distances"])),
            "avg_solve_ms": float(np.mean(stats["solve_times"])),
            "stats": {k: v for k, v in stats.items()
                      if k in ("timestamps", "goal_distances", "solve_times")},
        }

    print(f"\n{'B':>6} {'err (m)':>10} {'solve (ms)':>12} {'solves/s':>12}")
    for B in batch_sizes:
        r = results[B]
        sps = B / (r["avg_solve_ms"] / 1e3) if r["avg_solve_ms"] else float("nan")
        print(f"{B:>6} {r['avg_error_m']:>10.4f} {r['avg_solve_ms']:>12.3f} "
              f"{sps:>12.0f}")

    if save:
        with open(save, "wb") as f:
            pickle.dump({"N": N, "results": results}, f)
        print(f"saved -> {save}")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--batch-sizes", type=int, nargs="+",
                    default=[1, 32, 128, 512])
    ap.add_argument("--sim-time", type=float, default=5.0)
    ap.add_argument("--fz", type=float, default=0.0,
                    help="constant world z-force on the EE (N)")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    f_ext = np.array([0, 0, args.fz, 0, 0, 0]) if args.fz else None
    run(args.N, args.batch_sizes, args.sim_time, f_ext=f_ext, save=args.save)
