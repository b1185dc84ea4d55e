"""Channelized (codegen-style) merit must match the array-based merit."""

import numpy as np
import jax
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.ops.cost import CostParams
from gato_tpu.ops.merit import default_alphas, merit_alphas, merit_value
from gato_tpu.ops.merit_fast import merit_alphas_batched, merit_value_batched


def test_merit_fast_matches_reference_path():
    model = load_robot("indy7")
    cp = CostParams.create(q_cost=2., qd_cost=1e-2, u_cost=2e-6, N_cost=50.,
                           q_lim_cost=0.01, vel_lim_cost=1e-3,
                           ctrl_lim_cost=1e-4)
    rng = np.random.default_rng(0)
    B, N, nx, nu = 3, 6, 12, 6
    X = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, nx)), jnp.float32)
    U = jnp.asarray(rng.uniform(-8, 8, (B, N - 1, nu)), jnp.float32)
    dZX = jnp.asarray(rng.uniform(-0.05, 0.05, (B, N, nx)), jnp.float32)
    dZU = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N - 1, nu)), jnp.float32)
    x_s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nx)), jnp.float32)
    ref = jnp.asarray(rng.uniform(-0.5, 0.8, (B, N, 6)), jnp.float32)
    fe = jnp.asarray(rng.uniform(-20, 20, (B, 6)), jnp.float32)
    mu = jnp.asarray([10., 5., 2.], jnp.float32)
    al = default_alphas(8)
    dt = jnp.float32(0.01)

    ref_m = jax.vmap(
        lambda X_, U_, dx_, du_, xs_, r_, f_, m_: merit_alphas(
            model, cp, X_, U_, dx_, du_, xs_, r_, f_, m_, dt, al)
    )(X, U, dZX, dZU, x_s, ref, fe, mu)
    fast_m = merit_alphas_batched(model, cp, X, U, dZX, dZU, x_s, ref, fe,
                                  mu, dt, al)
    scale = float(jnp.abs(ref_m).max())
    assert float(jnp.abs(ref_m - fast_m).max()) < 1e-6 * max(scale, 1.0)

    ref_1 = jax.vmap(
        lambda X_, U_, xs_, r_, f_, m_: merit_value(
            model, cp, X_, U_, xs_, r_, f_, m_, dt)
    )(X, U, x_s, ref, fe, mu)
    fast_1 = merit_value_batched(model, cp, X, U, x_s, ref, fe, mu, dt)
    assert float(jnp.abs(ref_1 - fast_1).max()) < 1e-6 * max(scale, 1.0)


def test_channelized_dynamics_cross_check():
    """Channelized core vs array core for both plants (f64)."""
    from gato_tpu.robots.urdf import parse_urdf
    from gato_tpu.robots.model import PLANT_URDFS
    from gato_tpu.dynamics.channelized import ChannelizedDynamics
    from gato_tpu.dynamics.algorithms import fd, ee_position

    for plant in ("indy7", "iiwa14"):
        robot = parse_urdf(PLANT_URDFS[plant])
        cd = ChannelizedDynamics(robot)
        model = load_robot(plant, dtype=jnp.float64)
        nq = robot.nq
        rng = np.random.default_rng(1)
        B = 5
        q = rng.uniform(-1.5, 1.5, (nq, B))
        qd = rng.uniform(-2, 2, (nq, B))
        tau = rng.uniform(-30, 30, (nq, B))
        fe = rng.uniform(-20, 20, (6, B))
        cs = [jnp.asarray(np.cos(q[i])) for i in range(nq)]
        ss = [jnp.asarray(np.sin(q[i])) for i in range(nq)]
        qdd_ref = np.stack([
            np.asarray(fd(model, jnp.asarray(q[:, b]), jnp.asarray(qd[:, b]),
                          jnp.asarray(tau[:, b]), f_ext=jnp.asarray(fe[:, b])))
            for b in range(B)], axis=1)
        qdd_ch = np.stack([np.asarray(t) for t in cd.fd(
            cs, ss, [jnp.asarray(qd[i]) for i in range(nq)],
            [jnp.asarray(tau[i]) for i in range(nq)],
            f_ext=[jnp.asarray(fe[i]) for i in range(6)])])
        np.testing.assert_allclose(qdd_ch, qdd_ref, rtol=1e-5, atol=1e-6)

        ee_ref = np.stack([np.asarray(ee_position(model, jnp.asarray(q[:, b])))[:3]
                           for b in range(B)], axis=1)
        p_ee, _, _ = cd.fk_ee(cs, ss)
        np.testing.assert_allclose(np.stack([np.asarray(p) for p in p_ee]),
                                   ee_ref, rtol=1e-6, atol=1e-7)
