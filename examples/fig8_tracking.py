"""Figure-8 tracking under a constant external disturbance with batched
force-hypothesis estimation (gato_fig8_tracking.ipynb analogue): runs
B in {1, 32, 128} under a -60 N world-z EE force and reports how batching
plus the ForceEstimator improves tracking."""

import argparse

import numpy as np

from gato_tpu.api.common import figure8
from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
from gato_tpu.api.mpc import MPC_GATO


def main(batch_sizes=(1, 32, 128), fz=-60.0, N=32, sim_time=5.0):
    traj = figure8(0.01)
    x0 = np.concatenate([INDY7_START_CONFIGS["ready"], np.zeros(6)]).astype(np.float32)
    f_ext = np.array([0.0, 0.0, fz, 0.0, 0.0, 0.0])

    summary = {}
    for B in batch_sizes:
        print(f"\n=== batch {B}, f_ext z = {fz} N ===")
        mpc = MPC_GATO(plant_type="indy7", N=N, dt=0.01, batch_size=B,
                       constant_f_ext=f_ext,
                       solver_params=DEFAULT_SOLVER_PARAMS)
        _, stats = mpc.run_mpc_fig8(x0, traj, sim_dt=0.001, sim_time=sim_time)
        summary[B] = float(np.mean(stats["goal_distances"]))

    print("\nmean tracking error under disturbance:")
    for B, e in summary.items():
        print(f"  B={B:4d}: {e:.4f} m")
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 32, 128])
    ap.add_argument("--fz", type=float, default=-60.0)
    ap.add_argument("--sim-time", type=float, default=5.0)
    args = ap.parse_args()
    main(tuple(args.batch_sizes), args.fz, sim_time=args.sim_time)
