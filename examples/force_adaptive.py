"""Force-adaptive MPC demo: recover an unknown EE wrench while holding a
pose (the reference's force-estimator experiment, fully on device).

Runs the on-device estimator rollout (api/rollout.py::
closed_loop_rollout_estimator) twice — with the reference's sphere-search
estimator and with the Gauss-Newton observer — and reports the wrench
recovery error and tracking quality of each.

Usage: python examples/force_adaptive.py [--steps 150] [--B 16]
       [--force 12 -8 5] [--save force_est.json]
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from gato_tpu.api.rollout import closed_loop_rollout_estimator
from gato_tpu.dynamics.algorithms import ee_position
from gato_tpu.ops.cost import CostParams
from gato_tpu.robots.model import load_robot
from gato_tpu.solver.types import BSQPSettings, HyperParams


def main(steps=150, B=16, N=8, force=(12.0, -8.0, 5.0), seed=0, save=None):
    model = load_robot("indy7")
    st = BSQPSettings(N=N, max_sqp_iters=1, max_pcg_iters=30)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    hold = ee_position(model, q0)[:3]
    refs = jnp.tile(jnp.concatenate([hold, jnp.zeros(3, jnp.float32)]),
                    (steps, N, 1))
    true_w = jnp.asarray(list(force) + [0, 0, 0], jnp.float32)

    out = {"true_force_N": [round(float(v), 3) for v in force],
           "steps": steps, "B": B, "N": N}
    for mode in ("sphere", "observer"):
        xs, ees, fests, errs = closed_loop_rollout_estimator(
            model, st, cp, hp, x0, refs, true_w, jnp.float32(0.01),
            jnp.float32(0.01), B, jax.random.PRNGKey(seed), sim_substeps=2,
            estimator=mode)
        est = np.asarray(fests)
        ferr = np.linalg.norm(est[:, :3] - np.asarray(true_w[:3])[None],
                              axis=1)
        d = np.linalg.norm(np.asarray(ees) - np.asarray(hold)[None], axis=1)
        out[mode] = {
            "final_estimate_N": [round(float(v), 3) for v in est[-1, :3]],
            "force_err_N_t0": round(float(ferr[0]), 3),
            "force_err_N_final": round(float(ferr[-1]), 3),
            "ee_hold_err_m_tail": round(float(d[-10:].mean()), 4),
        }
        print(f"{mode:9s}: force err {ferr[0]:6.2f} -> {ferr[-1]:6.2f} N, "
              f"EE hold {d[-10:].mean()*100:.2f} cm, "
              f"estimate {np.round(est[-1, :3], 2)}")
    if save:
        with open(save, "w") as f:
            json.dump(out, f, indent=1)
        print(f"saved -> {save}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--force", type=float, nargs=3, default=[12.0, -8.0, 5.0])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    main(args.steps, args.B, args.N, tuple(args.force), args.seed, args.save)
