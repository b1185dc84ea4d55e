"""Dynamics-core correctness tests.

The reference has no test suite (SURVEY.md §4); its implicit oracle was
cross-validation against Pinocchio in closed loop. Pinocchio is unavailable
here, so we use strong internal-consistency oracles instead: FD/ID inversion,
CRBA vs RNEA-column mass matrices, energy conservation, exact-AD cross-checks
of the analytic gradients, and hand-computed FK values from the URDF.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.dynamics import (
    rnea, crba, fd, fd_and_grad, fk, ee_position, ee_xyz_jacobian,
    kinetic_energy, potential_energy,
)
from gato_tpu.dynamics.algorithms import fd as forward_dynamics


@pytest.fixture(scope="module", params=["indy7", "iiwa14"])
def model(request):
    # float64 for strict algorithm-equivalence oracles; float32 behavior is
    # covered by test_vmap_batching and the solver-level tests.
    return load_robot(request.param, dtype=jnp.float64)


def _rand(model, seed=0):
    rng = np.random.default_rng(seed)
    dt = model.R_tree.dtype
    lo, hi = np.array(model.joint_limits[:, 0]), np.array(model.joint_limits[:, 1])
    q = jnp.asarray(rng.uniform(0.5 * lo, 0.5 * hi), dtype=dt)
    qd = jnp.asarray(rng.uniform(-1, 1, model.nq), dtype=dt)
    tau = jnp.asarray(rng.uniform(-20, 20, model.nq), dtype=dt)
    return q, qd, tau


def test_urdf_dims(model):
    assert model.nq in (6, 7)
    assert model.inertia.shape == (model.nq, 6, 6)
    # spatial inertias are symmetric positive semi-definite
    I = np.asarray(model.inertia)
    assert np.allclose(I, np.swapaxes(I, -1, -2), atol=1e-5)
    for k in range(model.nq):
        assert np.all(np.linalg.eigvalsh(I[k]) > -1e-6)


def test_indy7_fk_zero_config():
    """Hand-computed FK at q=0 from the raw URDF joint origins."""
    model = load_robot("indy7")
    ee = np.asarray(ee_position(model, jnp.zeros(6)))
    # Compose URDF origins (independent re-derivation, from indy7.urdf):
    import math

    def rpy(r, p, y):
        cr, sr, cp, sp, cy, sy = (
            math.cos(r), math.sin(r), math.cos(p), math.sin(p),
            math.cos(y), math.sin(y),
        )
        Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        return Rz @ Ry @ Rx

    h = 1.570796327
    origins = [
        (rpy(0, 0, 0), [0, 0, 0.0775]),
        (rpy(h, h, 0), [0, -0.109, 0.222]),
        (rpy(0, 0, 0), [-0.45, 0, -0.0305]),
        (rpy(-h, 0, h), [-0.267, 0, -0.075]),
        (rpy(h, h, 0), [0, -0.114, 0.083]),
        (rpy(-h, 0, h), [-0.168, 0, 0.069]),
    ]
    R = np.eye(3)
    p = np.zeros(3)
    for Rj, pj in origins:
        p = p + R @ np.array(pj)
        R = R @ Rj
    np.testing.assert_allclose(ee[:3], p, atol=1e-5)


def test_mass_matrix_crba_vs_rnea_columns(model):
    q, qd, _ = _rand(model)
    M = crba(model, q)
    # M columns via RNEA: M e_i = ID(q, 0, e_i) - ID(q, 0, 0)
    zero = jnp.zeros(model.nq)
    bias = rnea(model, q, zero, zero)
    cols = [rnea(model, q, zero, jnp.eye(model.nq)[i]) - bias for i in range(model.nq)]
    M_ref = jnp.stack(cols, axis=-1)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref), rtol=1e-9, atol=1e-10)
    # symmetric positive definite
    Mn = np.asarray(M, dtype=np.float64)
    np.testing.assert_allclose(Mn, Mn.T, atol=1e-4)
    assert np.all(np.linalg.eigvalsh(Mn) > 0)


def test_fd_id_roundtrip(model):
    q, qd, tau = _rand(model, seed=1)
    qdd = fd(model, q, qd, tau)
    tau_back = rnea(model, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau), rtol=1e-3, atol=2e-3)


def test_fd_id_roundtrip_with_fext(model):
    q, qd, tau = _rand(model, seed=2)
    f_ext = jnp.asarray(np.random.default_rng(3).uniform(-30, 30, 6), dtype=model.R_tree.dtype)
    qdd = fd(model, q, qd, tau, f_ext=f_ext)
    tau_back = rnea(model, q, qd, qdd, f_ext=f_ext)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau), rtol=1e-3, atol=2e-3)
    # wrench must change the answer
    qdd0 = fd(model, q, qd, tau)
    assert not np.allclose(np.asarray(qdd), np.asarray(qdd0), atol=1e-3)


def test_gravity_compensation(model):
    q, _, _ = _rand(model, seed=4)
    zero = jnp.zeros(model.nq)
    tau_g = rnea(model, q, zero, zero)
    qdd = fd(model, q, zero, tau_g)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=5e-3)


def test_energy_conservation(model):
    """Passive (tau=0) dynamics conserve total energy under RK4."""
    q, qd, _ = _rand(model, seed=5)
    qd = 0.3 * qd
    zero = jnp.zeros(model.nq)

    def deriv(x):
        return jnp.concatenate(
            [x[model.nq:], fd(model, x[: model.nq], x[model.nq:], zero)]
        )

    def rk4_step(x, dt):
        k1 = deriv(x)
        k2 = deriv(x + 0.5 * dt * k1)
        k3 = deriv(x + 0.5 * dt * k2)
        k4 = deriv(x + dt * k3)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    x = jnp.concatenate([q, qd])
    e0 = kinetic_energy(model, q, qd) + potential_energy(model, q)
    step = jax.jit(rk4_step)
    for _ in range(100):
        x = step(x, 1e-3)
    e1 = kinetic_energy(model, x[: model.nq], x[model.nq:]) + potential_energy(
        model, x[: model.nq]
    )
    assert abs(float(e1 - e0)) < 2e-2 * max(1.0, abs(float(e0)))


def test_fd_grad_matches_autodiff(model):
    q, qd, tau = _rand(model, seed=6)
    f_ext = jnp.asarray([3.0, -2.0, 1.0, 5.0, 0.5, -4.0], dtype=model.R_tree.dtype)
    qdd, dq, dqd, dtau = fd_and_grad(model, q, qd, tau, f_ext=f_ext)
    qdd_direct = fd(model, q, qd, tau, f_ext=f_ext)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_direct), rtol=1e-4, atol=1e-4)

    J = jax.jacfwd(lambda q_, qd_, t_: fd(model, q_, qd_, t_, f_ext=f_ext), (0, 1, 2))(
        q, qd, tau
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(J[0]), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dqd), np.asarray(J[1]), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dtau), np.asarray(J[2]), rtol=5e-3, atol=5e-3)


def test_ee_jacobian_matches_autodiff(model):
    q, _, _ = _rand(model, seed=7)
    J = ee_xyz_jacobian(model, q)
    J_ad = jax.jacfwd(lambda q_: ee_position(model, q_)[:3])(q)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=1e-4, atol=1e-5)


def test_vmap_batching(model):
    """Dynamics vectorize over a batch axis (the framework's core axis)."""
    rng = np.random.default_rng(8)
    B = 16
    dt = model.R_tree.dtype  # match the model: mixed f32/f64 scatters are
    # a FutureWarning (and will be an error) under standard promotion
    q = jnp.asarray(rng.uniform(-1, 1, (B, model.nq)), dtype=dt)
    qd = jnp.asarray(rng.uniform(-1, 1, (B, model.nq)), dtype=dt)
    tau = jnp.asarray(rng.uniform(-10, 10, (B, model.nq)), dtype=dt)
    qdd_b = jax.vmap(lambda a, b, c: fd(model, a, b, c))(q, qd, tau)
    for i in range(0, B, 5):
        qdd_i = fd(model, q[i], qd[i], tau[i])
        np.testing.assert_allclose(np.asarray(qdd_b[i]), np.asarray(qdd_i), rtol=2e-4, atol=1e-4)


def test_aba_matches_crba_fd(model):
    """ABA (O(n), no mass matrix) agrees with CRBA+Cholesky forward dynamics
    (parity with the reference's generated-but-unused ABA)."""
    from gato_tpu.dynamics.algorithms import aba

    q, qd, tau = _rand(model, seed=11)
    f_ext = jnp.asarray(np.arange(6, dtype=np.float64) - 2.5,
                        dtype=model.R_tree.dtype)
    qdd_aba = aba(model, q, qd, tau, f_ext=f_ext)
    qdd_fd = fd(model, q, qd, tau, f_ext=f_ext)
    np.testing.assert_allclose(np.asarray(qdd_aba), np.asarray(qdd_fd),
                               rtol=1e-7, atol=1e-8)
