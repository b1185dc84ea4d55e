"""Cross-implementation oracle: native C++ rigid-body runtime vs JAX core.

This recreates the reference's implicit Pinocchio-vs-GRiD cross-validation
(SURVEY.md §4): two independent implementations of the same algorithms must
agree on dynamics, kinematics, and simulation.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gato_tpu.robots.model import PLANT_URDFS, from_parsed
from gato_tpu.robots.urdf import parse_urdf
from gato_tpu.dynamics import rnea, crba, fd, ee_position
from gato_tpu.native import NativeRobot


@pytest.fixture(scope="module", params=["indy7", "iiwa14"])
def pair(request):
    parsed = parse_urdf(PLANT_URDFS[request.param])
    return from_parsed(parsed, dtype=jnp.float64), NativeRobot(parsed)


def _rand(nq, seed):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1.5, 1.5, nq), rng.uniform(-2, 2, nq),
            rng.uniform(-30, 30, nq))


def test_rnea_cross(pair):
    model, native = pair
    q, qd, qdd = _rand(model.nq, 0)
    tau_j = np.asarray(rnea(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd)))
    tau_c = native.rnea(q, qd, qdd)
    np.testing.assert_allclose(tau_j, tau_c, rtol=1e-9, atol=1e-9)


def test_rnea_fext_cross(pair):
    model, native = pair
    q, qd, qdd = _rand(model.nq, 1)
    fe = np.random.default_rng(2).uniform(-40, 40, 6)
    tau_j = np.asarray(rnea(model, jnp.asarray(q), jnp.asarray(qd),
                            jnp.asarray(qdd), f_ext=jnp.asarray(fe)))
    tau_c = native.rnea(q, qd, qdd, f_ext=fe)
    np.testing.assert_allclose(tau_j, tau_c, rtol=1e-9, atol=1e-9)


def test_crba_cross(pair):
    model, native = pair
    q, _, _ = _rand(model.nq, 3)
    M_j = np.asarray(crba(model, jnp.asarray(q)))
    M_c = native.crba(q)
    np.testing.assert_allclose(M_j, M_c, rtol=1e-9, atol=1e-9)


def test_fd_cross(pair):
    model, native = pair
    q, qd, tau = _rand(model.nq, 4)
    qdd_j = np.asarray(fd(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(tau)))
    qdd_c = native.fd(q, qd, tau)
    np.testing.assert_allclose(qdd_j, qdd_c, rtol=1e-7, atol=1e-8)


def test_fk_cross(pair):
    model, native = pair
    q, _, _ = _rand(model.nq, 5)
    ee_j = np.asarray(ee_position(model, jnp.asarray(q)))
    ee_c = native.ee_pose(q)
    np.testing.assert_allclose(ee_j, ee_c, rtol=1e-9, atol=1e-9)


def test_rk4_cross(pair):
    """Native RK4 simulator matches the JAX one (api/common.rk4_step)."""
    from gato_tpu.api.common import rk4_step

    model, native = pair
    q, qd, tau = _rand(model.nq, 6)
    x = np.concatenate([q, qd])
    fe_world = np.array([5.0, -10.0, 20.0, 1.0, 0.0, -2.0])
    xn_j = np.asarray(rk4_step(model, jnp.asarray(x), jnp.asarray(tau),
                               0.001, f_ext_world=jnp.asarray(fe_world)))
    xn_c = native.rk4(x, tau, 0.001, f_ext_world=fe_world)
    np.testing.assert_allclose(xn_j, xn_c, rtol=1e-7, atol=1e-9)
