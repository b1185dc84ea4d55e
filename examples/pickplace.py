"""Pick-and-place with a swinging pendulum payload (gato_pickplace.ipynb
analogue): iiwa14 + 15 kg pendulum on the EE (sim model only; the solver sees
the robot alone), goal sequence with reached/timeout outcomes, batch
hypotheses handle the unmodeled payload."""

import argparse

import numpy as np

from gato_tpu.api.config import (PICKPLACE_DEFAULT_GOALS, PICKPLACE_MPC_DEFAULTS,
                                 PICKPLACE_SOLVER_PARAMS, PENDULUM_DEFAULT_PARAMS)
from gato_tpu.api.mpc import MPC_GATO


def main(batch_sizes=(1, 8, 32), N=32, goals=None, goal_timeout=None,
         viz=None):
    goals = goals or PICKPLACE_DEFAULT_GOALS
    x0 = np.zeros(14, np.float32)

    outcomes = {}
    for B in batch_sizes:
        print(f"\n=== batch {B}, pendulum "
              f"{PENDULUM_DEFAULT_PARAMS['mass']} kg ===")
        mpc = MPC_GATO(
            plant_type="iiwa14", N=N, dt=0.03125, batch_size=B,
            pendulum_config=PENDULUM_DEFAULT_PARAMS,
            solver_params=PICKPLACE_SOLVER_PARAMS,
            control_dt=0.002,  # ~the reference's measured solve times
        )
        _, stats = mpc.run_mpc_goals(
            x0, goals, sim_dt=0.001,
            goal_timeout=goal_timeout or PICKPLACE_MPC_DEFAULTS["goal_timeout"],
            goal_threshold=PICKPLACE_MPC_DEFAULTS["goal_threshold"],
            velocity_threshold=PICKPLACE_MPC_DEFAULTS["velocity_threshold"],
        )
        outcomes[B] = stats["goal_outcomes"]
        if viz:
            # skeleton-strip render of the rollout (the reference notebook's
            # meshcat animation role; gato_tpu/utils/viz.py)
            from gato_tpu.utils.viz import plot_rollout
            qs = np.asarray(stats["joint_positions"])
            goal_pts = np.asarray(goals, np.float32)
            out = viz.replace(".png", f"_B{B}.png")
            plot_rollout(mpc.solver_model, qs[:: max(1, len(qs) // 120)],
                         ref=goal_pts, path=out)
            print(f"  viz -> {out}")

    print("\nsummary:")
    for B, o in outcomes.items():
        reached = sum(1 for x in o if x == "reached")
        print(f"  B={B:4d}: {reached}/{len(o)} goals  {o}")
    return outcomes


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--viz", default=None,
                    help="write rollout skeleton PNGs here (e.g. pp.png)")
    args = ap.parse_args()
    main(tuple(args.batch_sizes), args.N, viz=args.viz)
