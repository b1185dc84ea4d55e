"""On-device force estimator: exact parity with the numpy class + force
recovery in the fully on-device estimator rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from gato_tpu.api.force_estimator import ForceEstimator
from gato_tpu.api.force_estimator_device import (FEState, fe_generate,
                                                 fe_init, fe_update,
                                                 fibonacci_sphere,
                                                 rotation_from_uniforms)


def test_estimator_step_parity_with_numpy_class():
    """Drive both implementations with identical randomness / winners /
    errors for 12 updates: every state field and generated batch matches."""
    B = 10
    ref = ForceEstimator(B, seed=0)
    dirs = jnp.asarray(fibonacci_sphere(B - 3))
    st = fe_init(10.0)
    rng = np.random.default_rng(42)

    upd = jax.jit(lambda s, b, e, u: fe_update(s, dirs, b, e, u))
    gen = jax.jit(lambda s: fe_generate(s, dirs))

    for step in range(12):
        np.testing.assert_allclose(np.asarray(gen(st)), ref.generate_batch(),
                                   rtol=1e-5, atol=1e-5)
        best = int(rng.integers(0, B))
        errs = rng.uniform(0.01, 2.0, B).astype(np.float32)
        u = rng.random(3)
        # inject the same rotation into the numpy class that the device
        # update derives from u
        ref.update(best, errs)
        ref.current_rotation = np.asarray(rotation_from_uniforms(
            jnp.asarray(u, jnp.float32)))
        st = upd(st, jnp.int32(best), jnp.asarray(errs),
                 jnp.asarray(u, jnp.float32))
        np.testing.assert_allclose(np.asarray(st.estimate), ref.estimate,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st.momentum), ref.momentum,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st.smoothed),
                                   ref.smoothed_estimate,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(st.radius), ref.radius, rtol=1e-5)
        np.testing.assert_allclose(float(st.confidence), ref.confidence,
                                   atol=1e-6)


def test_estimator_rollout_recovers_constant_wrench():
    """Constant lateral EE force on the plant; the on-device loop's smoothed
    estimate must move from 0 toward the true force and the tracking loop
    must stay finite (the reference's force_estimator experiment, on
    device)."""
    from gato_tpu.api.rollout import closed_loop_rollout_estimator
    from gato_tpu.ops.cost import CostParams
    from gato_tpu.robots.model import load_robot
    from gato_tpu.solver.types import BSQPSettings, HyperParams

    model = load_robot("indy7")
    N, B, steps = 8, 16, 100
    st = BSQPSettings(N=N, max_sqp_iters=1, max_pcg_iters=30)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    from gato_tpu.dynamics.algorithms import ee_position
    hold = ee_position(model, q0)[:3]
    refs = jnp.tile(jnp.concatenate([hold, jnp.zeros(3, jnp.float32)]),
                    (steps, N, 1))
    true_w = jnp.asarray([12.0, -8.0, 5.0, 0, 0, 0], jnp.float32)

    xs, ees, fests, errs = closed_loop_rollout_estimator(
        model, st, cp, hp, x0, refs, true_w, jnp.float32(0.01),
        jnp.float32(0.01), B, jax.random.PRNGKey(0), sim_substeps=2,
        initial_radius=10.0)
    assert np.isfinite(np.asarray(xs)).all()
    est = np.asarray(fests)
    # the ported random-search estimator is stochastic and plateaus far
    # from the true wrench (reference behavior — its radius schedule
    # freezes exploration; see the observer test for the converging mode):
    # assert the loop is healthy and the estimator ENGAGED, not accuracy
    assert np.linalg.norm(est[-1, :3]) > 1.0  # moved off the zero init
    # hypothesis scoring locked on: small one-step prediction errors
    assert np.asarray(errs)[-20:].mean() < 0.25
    # and the plant holds the pose under the unmodeled disturbance
    d = np.linalg.norm(np.asarray(ees) - np.asarray(hold)[None], axis=1)
    assert d[-10:].mean() < 0.1


def test_observer_rollout_converges_to_true_wrench():
    """estimator="observer" (Gauss-Newton on the measured transition — the
    beyond-reference mode): the wrench estimate must converge to ~N-level
    where the reference's random search plateaus at ~75-85%% error."""
    from gato_tpu.api.rollout import closed_loop_rollout_estimator
    from gato_tpu.ops.cost import CostParams
    from gato_tpu.robots.model import load_robot
    from gato_tpu.solver.types import BSQPSettings, HyperParams
    from gato_tpu.dynamics.algorithms import ee_position

    model = load_robot("indy7")
    N, B, steps = 8, 4, 40
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
    true_w = jnp.asarray([12.0, -8.0, 5.0, 0, 0, 0], jnp.float32)

    xs, ees, fests, errs = closed_loop_rollout_estimator(
        model, st, cp, hp, x0, refs, true_w, jnp.float32(0.01),
        jnp.float32(0.01), B, jax.random.PRNGKey(0), sim_substeps=2,
        estimator="observer")
    assert np.isfinite(np.asarray(xs)).all()
    est = np.asarray(fests)
    tail = np.linalg.norm(est[-5:] - np.asarray(true_w)[None], axis=1).mean()
    assert tail < 2.0, tail
    # with the true wrench identified, predictions match the plant
    assert np.asarray(errs)[-5:].mean() < 0.01
    d = np.linalg.norm(np.asarray(ees) - np.asarray(hold)[None], axis=1)
    assert d[-5:].mean() < 0.05
