"""On-device closed-loop rollout: converges to a nearby goal, stays finite
with a pendulum-augmented simulation plant."""

import numpy as np
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.api.mpc import add_pendulum
from gato_tpu.api.rollout import closed_loop_rollout
from gato_tpu.ops.cost import CostParams
from gato_tpu.solver.types import BSQPSettings, HyperParams
from gato_tpu.dynamics.algorithms import ee_position


def test_rollout_reaches_nearby_goal():
    model = load_robot("indy7")
    N, B, steps = 8, 2, 60
    st = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=40)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    goal = ee_position(model, q0)[:3] + jnp.asarray([0.06, -0.04, 0.05],
                                               jnp.float32)
    refs = jnp.tile(jnp.concatenate([goal, jnp.zeros(3, jnp.float32)]),
                    (steps, N, 1))
    xs, ees, us = closed_loop_rollout(
        model, model, st, cp, hp, x0, refs, jnp.zeros((B, 6), jnp.float32),
        jnp.float32(0.01), jnp.float32(0.004), sim_substeps=2,
    )
    d = np.linalg.norm(np.asarray(ees) - np.asarray(goal), axis=1)
    assert np.isfinite(np.asarray(xs)).all()
    assert d[-1] < 0.03


def test_rollout_pendulum_sim_stays_finite():
    model = load_robot("iiwa14")
    sim_model = add_pendulum(model, mass=15.0, length=0.3)
    N, B, steps = 8, 2, 30
    st = BSQPSettings(N=N, max_sqp_iters=1, max_pcg_iters=30)
    cp = CostParams.create(q_cost=5.0, qd_cost=1e-2, u_cost=5e-7,
                           N_cost=50.0, q_lim_cost=0.0)
    hp = HyperParams.create(B, rho=1e-3, mu=10.0, pcg_tol=1e-4)
    x_sim0 = np.zeros(2 * sim_model.nq, np.float32)
    x_sim0[model.nq:model.nq + 3] = [0.3, 0.0, 0.0]
    goal = np.array([0.5, -0.1865, 0.5], np.float32)
    refs = jnp.tile(jnp.asarray(np.concatenate([goal, np.zeros(3)]),
                                jnp.float32), (steps, N, 1))
    fe = jnp.zeros((B, 6), jnp.float32).at[1, 5].set(-15 * 9.81)
    xs, ees, us = closed_loop_rollout(
        model, sim_model, st, cp, hp, jnp.asarray(x_sim0), refs, fe,
        jnp.float32(0.03125), jnp.float32(0.002), sim_substeps=2,
        pendulum_damping=0.4,
    )
    assert np.isfinite(np.asarray(xs)).all()


def test_rollout_phantom_wrench_lanes_dont_drive():
    """With per-lane wrench hypotheses and a zero-wrench simulation, the
    best-lane selection must keep driving with a lane consistent with the
    measured state (the reference's evaluate_best_trajectory semantics,
    mpc_controller.py:294-309) — NOT the lowest-merit lane, which can be a
    phantom-wrench lane whose control destabilizes the plant (this diverged
    to NaN within 300 cycles before the fix)."""
    model = load_robot("indy7")
    N, B, steps = 8, 4, 60
    st = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=40)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    goal = ee_position(model, q0)[:3] + jnp.asarray([0.05, -0.03, 0.04],
                                                    jnp.float32)
    refs = jnp.tile(jnp.concatenate([goal, jnp.zeros(3, jnp.float32)]),
                    (steps, N, 1))
    rng = np.random.default_rng(3)
    fe = rng.uniform(-8.0, 8.0, (B, 6)).astype(np.float32)
    fe[0] = 0.0  # the estimator always carries the zero hypothesis
    xs, ees, us = closed_loop_rollout(
        model, model, st, cp, hp, x0, refs, jnp.asarray(fe),
        jnp.float32(0.01), jnp.float32(0.004), sim_substeps=2,
    )
    assert np.isfinite(np.asarray(xs)).all()
    d = np.linalg.norm(np.asarray(ees) - np.asarray(goal), axis=1)
    assert d[-1] < 0.03


def test_goals_rollout_outcome_semantics():
    """closed_loop_rollout_goals mirrors run_mpc_goals' bookkeeping: a goal
    at the current EE is 'reached' (code 1) almost immediately, a far goal
    then runs out its per-goal budget and records 'timeout' (code 2), and
    the reached time is recorded only for the reached goal."""
    import jax

    from gato_tpu.api.rollout import closed_loop_rollout_goals

    model = load_robot("indy7")
    N, B = 8, 1
    st = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=40)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    ee0 = ee_position(model, q0)[:3]
    # goal 0: where the arm already is; goal 1: far outside the workspace
    goals = jnp.stack([ee0, ee0 + jnp.asarray([2.0, 2.0, 2.0], jnp.float32)])
    control_dt, timeout = 0.01, 0.25
    n_steps = int(2 * timeout / control_dt) + 2
    out = closed_loop_rollout_goals(
        model, model, st, cp, hp, x0, goals, jnp.float32(0.01),
        jnp.float32(control_dt), jax.random.PRNGKey(0), batch_size=B,
        n_steps=n_steps, goal_timeout=timeout, goal_threshold=0.05,
        velocity_threshold=1.0, sim_substeps=2)
    xs, ees, dists, gidx, bests, oc, rt, fests, radii = out
    oc, rt = np.asarray(oc), np.asarray(rt)
    assert oc[0] == 1, oc          # reached
    assert oc[1] == 2, oc          # timeout
    assert 0.0 < rt[0] <= timeout  # reached within its budget
    assert rt[1] == -1.0           # never reached
    # after both goals resolve, the goal index stays clamped at the last one
    assert int(np.asarray(gidx)[-1]) == 1
    assert np.isfinite(np.asarray(xs)).all()
