"""Minimal standalone batched BSQP solve (the examples/bsqp.cu analogue):
B=16, N=16, indy7, one solve from a fixed initial state, print the first
trajectory entries."""

import numpy as np
import jax.numpy as jnp

from gato_tpu.api.interface import BSQP
from gato_tpu.dynamics.algorithms import ee_position
from gato_tpu.robots.model import load_robot


def main():
    B, N = 16, 16
    solver = BSQP(plant_type="indy7", batch_size=B, N=N, dt=0.01,
                  max_sqp_iters=5, max_pcg_iters=100, pcg_tol=1e-5,
                  q_cost=2.0, qd_cost=1e-2, u_cost=2e-6, N_cost=50.0,
                  q_lim_cost=0.01, rho=0.01)

    model = load_robot("indy7")
    q0 = np.array([-1.0967, -0.099, 0.8313, -0.1091, 0.497, 0.015])
    x0 = np.concatenate([q0, np.zeros(6)]).astype(np.float32)
    ee0 = np.asarray(ee_position(model, jnp.asarray(q0, jnp.float32)))[:3]
    goal = ee0 + np.array([0.1, -0.05, 0.05])
    ref = np.tile(np.concatenate([goal, np.zeros(3)]), (B, N)).astype(np.float32)

    XU = np.tile(
        np.concatenate([np.tile(np.concatenate([x0, np.zeros(6, np.float32)]),
                                N - 1), x0]), (B, 1))
    xcur = np.tile(x0, (B, 1))

    XU_out, t_us = solver.solve(xcur, ref, XU)
    print(f"solve time: {t_us} us")
    print("first knot state:", XU_out[0, :12])
    print("first control   :", XU_out[0, 12:18])
    stats = solver.get_stats()
    print("sqp iters:", stats["sqp_iters"][:4], "steps:",
          stats["step_size"][:, 0] if stats["step_size"].size else [])
    print("initial merit:", stats["initial_merit"][0],
          "final merit:", stats["final_merit"][0])


if __name__ == "__main__":
    main()
