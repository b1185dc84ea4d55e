"""Task utilities: reference trajectories, simulation, warm starts.

Re-design of python/bsqp/common.py. The reference simulates with Pinocchio
(RK4 over pin.aba, common.py:49-91); here the simulator is the same JAX
dynamics core as the solver *plus* an optional independently-parameterized
model (e.g. pendulum-augmented), which preserves the reference's
sim-vs-solver model mismatch experiments.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.algorithms import fd, fk
from ..robots.model import RobotModel


def figure8(dt, A_x=0.4, A_z=0.4, offset=(0.0, 0.5, 0.6), period=6, cycles=5,
            theta=math.pi / 4):
    """Rotated-lemniscate EE reference (common.py:10-46). Returns a flat
    array of [x, y, z, 0, 0, 0] per timestep, tiled over `cycles`."""
    ts = np.linspace(0, 2 * np.pi, int(period / dt))
    x = offset[0] + A_x * np.sin(ts)
    y = np.full_like(ts, offset[1])
    z = offset[2] + A_z * np.sin(2 * ts) / 2 + A_z / 2
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0.0],
            [np.sin(theta), np.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    pts = (R @ np.stack([x, y, z])).T
    out = np.zeros((len(ts), 6))
    out[:, :3] = pts
    return np.tile(out.reshape(-1), cycles)


def world_wrench_to_ee_frame(model: RobotModel, q, w_world):
    """Express a world-frame wrench [force(3); torque(3)] acting at the EE
    link origin in the EE link frame, as the solver's [n; f] spatial force."""
    Rs, _ = fk(model, q)
    R = Rs[-1]  # world <- ee
    f_l = R.T @ w_world[:3]
    n_l = R.T @ w_world[3:]
    return jnp.concatenate([n_l, f_l])


@partial(jax.jit, static_argnames=("substeps",))
def rk4_step(model: RobotModel, x, u, dt, f_ext_world=None, substeps: int = 1):
    """RK4 forward simulation step (common.py:49-91 analogue). f_ext_world is
    a constant world-frame wrench applied at the EE link, re-expressed in the
    EE frame at each evaluation."""
    nq = model.nq if u.shape[-1] == model.nq else u.shape[-1]
    nq = model.nq

    def deriv(x):
        q, qd = x[:nq], x[nq:]
        fe = None
        if f_ext_world is not None:
            fe = world_wrench_to_ee_frame(model, q, f_ext_world)
        return jnp.concatenate([qd, fd(model, q, qd, u, f_ext=fe)])

    h = dt / substeps

    def one(x, _):
        k1 = deriv(x)
        k2 = deriv(x + 0.5 * h * k1)
        k3 = deriv(x + 0.5 * h * k2)
        k4 = deriv(x + h * k3)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    x, _ = jax.lax.scan(one, x, None, length=substeps)
    return x


def initialize_warm_start(x_start, N, nx, nu):
    """Tile the start state over the horizon (common.py:93-99)."""
    XU = np.zeros(N * (nx + nu) - nu, dtype=np.float32)
    for i in range(N):
        s = i * (nx + nu)
        XU[s:s + nx] = x_start
    return XU


def sample_axis_angle(mag_range=(0.0, 0.6), rng=None):
    rng = rng or np.random.default_rng()
    mag = rng.uniform(*mag_range)
    v = rng.normal(size=3)
    return v / (np.linalg.norm(v) + 1e-12) * mag


def sample_pendulum_params(length_range=(0.3, 0.7), damping_range=(0.1, 0.6),
                           angle_range=(0.0, 0.6), mass=15.0, rng=None):
    rng = rng or np.random.default_rng()
    return {
        "mass": mass,
        "length": rng.uniform(*length_range),
        "damping": rng.uniform(*damping_range),
        "initial_angle": sample_axis_angle(angle_range, rng),
    }
