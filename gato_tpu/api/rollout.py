"""Fully on-device closed-loop MPC rollout.

A capability beyond the reference: the entire closed loop — batched BSQP
solve, best-lane selection, simulator stepping (optionally on a different,
e.g. pendulum-augmented, plant), warm-start carry-over and rho resets — runs
as ONE jitted lax.scan. No host round-trips per cycle, which makes
closed-loop evaluation ~100x faster than the Python-stepped loop on this
image's tunneled runtime, and enables sweeping controller configurations
on-device.

Two rollouts: `closed_loop_rollout` (fixed per-lane f_ext hypotheses,
best-lane selection by one-step prediction) and
`closed_loop_rollout_estimator` (force-ADAPTIVE MPC: the wrench estimator
runs inside the scan — either the reference's sphere-search algorithm or
the beyond-reference Gauss-Newton observer, estimator="observer"). The
Python MPC_GATO loop (api/mpc.py) remains the host-stepped full-featured
path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..dynamics.algorithms import fd, fk
from ..ops.cost import CostParams
from ..ops.integrators import sim_step
from ..ops.pallas_sim import rk4_step_batched_pallas
from ..robots.model import RobotModel
from ..solver.bsqp import solve_batched
from ..solver.types import BSQPSettings, HyperParams


def _rk4(model, x, u, h, f_ext=None):
    nq = model.nq

    def deriv(x):
        return jnp.concatenate(
            [x[nq:], fd(model, x[:nq], x[nq:], u, f_ext=f_ext)])

    k1 = deriv(x)
    k2 = deriv(x + 0.5 * h * k1)
    k3 = deriv(x + 0.5 * h * k2)
    k4 = deriv(x + h * k3)
    return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


@partial(jax.jit, static_argnames=("settings", "sim_substeps",
                                   "pendulum_damping"))
def closed_loop_rollout(
    model: RobotModel,          # solver plant
    sim_model: RobotModel,      # simulation plant (may be augmented)
    settings: BSQPSettings,
    cp: CostParams,
    hp: HyperParams,
    x_sim0,                     # (nx_sim,) initial simulator state
    refs,                       # (n_steps, N, 6) reference windows per cycle
    f_ext,                      # (B, 6) per-lane wrench hypotheses
    dt,                         # solver discretization timestep
    control_dt,                 # seconds simulated per MPC cycle
    sim_substeps: int = 4,
    pendulum_damping: float | None = None,
):
    """Returns (x_sim trajectory (n_steps, nx_sim), ee positions
    (n_steps, 3), chosen controls (n_steps, nu))."""
    B = f_ext.shape[0]
    N = settings.N
    nq, nx, nu = model.nq, model.nx, model.nu
    nq_s = sim_model.nq

    def robot_state(x_sim):
        return jnp.concatenate([x_sim[:nq], x_sim[nq_s:nq_s + nq]])

    x0 = robot_state(x_sim0)
    X = jnp.tile(x0, (B, N, 1))
    U = jnp.zeros((B, N - 1, nu), x0.dtype)
    lam = jnp.zeros((B, N, nx), x0.dtype)
    h = control_dt / sim_substeps

    def body(carry, ref_k):
        x_sim, X, U, lam, x_last, u_last = carry
        x_cur = robot_state(x_sim)
        x_s = jnp.tile(x_cur, (B, 1))
        X = X.at[:, 0, :].set(x_s)

        Xo, Uo, lam, hp_out, stats = solve_batched(
            model, settings, cp, hp, X, U, lam, x_s,
            jnp.tile(ref_k[None], (B, 1, 1)), f_ext, dt,
        )
        if B > 1:
            # the reference's evaluate_best_trajectory
            # (mpc_controller.py:294-309): the winning hypothesis is the one
            # whose one-step rollout of the PREVIOUS cycle's (state, control)
            # best explains the state just measured — NOT the lowest merit
            # (a phantom-wrench lane can out-merit the true model and its
            # control destabilizes the plant)
            pred = jax.vmap(
                lambda fe: sim_step(model, x_last, u_last, control_dt,
                                    f_ext=fe,
                                    integrator_type=settings.integrator_type)
            )(f_ext)
            errs = jnp.linalg.norm(pred - x_cur[None, :], axis=1)
            # mask non-finite prediction errors (dead lanes) out of the
            # argmin — NaN would win it under numpy semantics
            best = jnp.argmin(jnp.where(jnp.isfinite(errs), errs, jnp.inf))
        else:
            best = 0
        u0 = Uo[best, 0]
        if pendulum_damping is not None:
            qd_p = x_sim[nq_s + nq:]
            u_sim = jnp.concatenate([u0, -pendulum_damping * qd_p])
        else:
            u_sim = u0

        if jax.default_backend() == "tpu":
            # single-lane XLA rk4 lowers to scalar code (~3.5ms/step on this
            # image); the Pallas kernel keeps the step on VMEM vector tiles
            def sub(x, _):
                return rk4_step_batched_pallas(
                    sim_model, x[None], u_sim[None], h)[0], None
        else:
            def sub(x, _):
                return _rk4(sim_model, x, u_sim, h), None

        x_sim, _ = jax.lax.scan(sub, x_sim, None, length=sim_substeps)

        # broadcast the best lane's plan to every lane (mpc_controller.py:241)
        X = jnp.tile(Xo[best][None], (B, 1, 1))
        U = jnp.tile(Uo[best][None], (B, 1, 1))
        _, ps = fk(model, robot_state(x_sim)[:nq])
        return (x_sim, X, U, lam, x_cur, u0), (x_sim, ps[-1], u0)

    u_init = jnp.zeros((nu,), x0.dtype)
    (x_sim, X, U, lam, _, _), (xs, ees, us) = jax.lax.scan(
        body, (x_sim0, X, U, lam, x0, u_init), refs
    )
    return xs, ees, us


@partial(jax.jit, static_argnames=("settings", "batch_size", "n_steps",
                                   "sim_substeps", "pendulum_damping",
                                   "goal_timeout", "goal_threshold",
                                   "velocity_threshold", "initial_radius",
                                   "score_substeps"))
def closed_loop_rollout_goals(
    model: RobotModel,          # solver plant (robot only)
    sim_model: RobotModel,      # simulation plant (e.g. pendulum-augmented)
    settings: BSQPSettings,
    cp: CostParams,
    hp: HyperParams,
    x_sim0,                     # (nx_sim,) initial simulator state
    goals,                      # (G, 3) EE waypoint sequence
    dt,                         # solver discretization timestep
    control_dt,                 # seconds simulated per MPC cycle
    key,                        # PRNG key for the estimator's rotations
    batch_size: int,
    n_steps: int,               # scan length; >= goal_timeout*G/control_dt
                                # guarantees every goal resolves in-scan
    goal_timeout: float = 5.0,
    goal_threshold: float = 0.05,
    velocity_threshold: float = 1.0,
    sim_substeps: int = 2,
    pendulum_damping: float | None = None,
    initial_radius: float = 5.0,
    score_substeps: int = 0,
):
    """Goal-sequence (pick-and-place) MPC entirely on device: the host
    loop of MPC_GATO.run_mpc_goals (api/mpc.py, the reference's
    mpc_controller.py:361-599) as ONE jitted lax.scan — goal switching on
    reached/timeout, the sphere-search force estimator, best-hypothesis
    selection and warm-start carry all inside the scan. Semantics mirror the
    host loop cycle for cycle: simulate under the current best plan's first
    control, measure, test reached (dist < goal_threshold AND |qd|_1 <
    velocity_threshold) / timeout, advance the goal, generate hypotheses
    from the estimator state, solve, score the fresh hypothesis batch on the
    one-step transition just observed (solver.sim_forward's integrator,
    mpc_controller.py:294-309), select, update the estimator
    (alpha=0.6, beta=0.5; radius in [2, 20], smoothing 0.5 — the MPC_GATO
    pickplace configuration).

    Returns (x_sim traj (n_steps, nx_sim), ee (n_steps, 3), dist-to-goal
    (n_steps,), goal index per cycle (n_steps,), best lane per cycle
    (n_steps,), outcomes (G,) int32 [0 pending / 1 reached / 2 timeout],
    reached_times (G,) [-1 if not reached])."""
    from .common import world_wrench_to_ee_frame
    from .force_estimator_device import fe_generate, fe_init, fe_update, \
        fibonacci_sphere

    B = batch_size
    N = settings.N
    G = goals.shape[0]
    nq, nx, nu = model.nq, model.nx, model.nu
    nq_s = sim_model.nq

    def robot_state(x_sim):
        return jnp.concatenate([x_sim[:nq], x_sim[nq_s:nq_s + nq]])

    def ee_transform(q, W):
        return jax.vmap(lambda w: world_wrench_to_ee_frame(model, q, w))(W)

    x0 = robot_state(x_sim0)
    X = jnp.tile(x0, (B, N, 1))
    U = jnp.zeros((B, N - 1, nu), x0.dtype)
    lam = jnp.zeros((B, N, nx), x0.dtype)
    h = control_dt / sim_substeps

    use_est = B > 3
    dirs = jnp.asarray(fibonacci_sphere(max(B - 3, 0)))
    fe_state = fe_init(initial_radius)

    def ref_for(goal):
        return jnp.broadcast_to(goal[None, None, :], (B, N, 3))

    def hyps(fe_state, q):
        if use_est:
            W = fe_generate(fe_state, dirs)
        else:
            W = jnp.zeros((B, 6), x0.dtype)
        return W, ee_transform(q, W)

    # warm-up solve at goal 0 (the host loop's pre-loop solve,
    # mpc_controller.py:424-428)
    W0, batch0 = hyps(fe_state, x0[:nq])
    Xo, Uo, lam, _, _ = solve_batched(
        model, settings, cp, hp, X, U, lam, jnp.tile(x0, (B, 1)),
        ref_for(goals[0]), batch0, dt)
    X = jnp.tile(Xo[0][None], (B, 1, 1))
    U = jnp.tile(Uo[0][None], (B, 1, 1))

    if jax.default_backend() == "tpu":
        def sim_adv(x_sim, u_sim):
            def sub(x, _):
                return rk4_step_batched_pallas(
                    sim_model, x[None], u_sim[None], h)[0], None
            return jax.lax.scan(sub, x_sim, None, length=sim_substeps)[0]
    else:
        def sim_adv(x_sim, u_sim):
            def sub(x, _):
                return _rk4(sim_model, x, u_sim, h), None
            return jax.lax.scan(sub, x_sim, None, length=sim_substeps)[0]

    def body(carry, _):
        (x_sim, X, U, lam, fe_state, key, goal_idx, goal_start, t,
         outcomes, reached_t, done) = carry

        x_last = robot_state(x_sim)
        u_last = U[0, 0]
        if pendulum_damping is not None:
            qd_p = x_sim[nq_s + nq:]
            u_sim = jnp.concatenate([u_last, -pendulum_damping * qd_p])
        else:
            u_sim = u_last
        x_sim = sim_adv(x_sim, u_sim)
        t = t + control_dt
        x_cur = robot_state(x_sim)

        _, ps = fk(model, x_cur[:nq])
        ee = ps[-1]
        goal = goals[goal_idx]
        dist = jnp.linalg.norm(ee - goal)
        vel = jnp.sum(jnp.abs(x_cur[nq:]))
        reached = jnp.logical_and(dist < goal_threshold,
                                  vel < velocity_threshold)
        timeout = (t - goal_start) >= goal_timeout
        fire = jnp.logical_and(jnp.logical_or(reached, timeout),
                               jnp.logical_not(done))
        code = jnp.where(reached, 1, 2).astype(jnp.int32)
        outcomes = outcomes.at[goal_idx].set(
            jnp.where(fire, code, outcomes[goal_idx]))
        reached_t = reached_t.at[goal_idx].set(
            jnp.where(jnp.logical_and(fire, reached), t,
                      reached_t[goal_idx]))
        goal_idx = jnp.where(fire, goal_idx + 1, goal_idx)
        done = jnp.logical_or(done, goal_idx >= G)
        goal_idx = jnp.clip(goal_idx, 0, G - 1)
        goal_start = jnp.where(fire, t, goal_start)
        goal = goals[goal_idx]

        key, sub = jax.random.split(key)
        W, batch = hyps(fe_state, x_cur[:nq])
        x_s = jnp.tile(x_cur, (B, 1))
        X = X.at[:, 0, :].set(x_s)
        Xo, Uo, lam, _, _ = solve_batched(
            model, settings, cp, hp, X, U, lam, x_s, ref_for(goal),
            batch, dt)

        if use_est:
            # score the fresh hypothesis batch on the transition just
            # observed. score_substeps=0: exactly the host loop's
            # evaluate_best_trajectory (one solver-integrator step over the
            # cycle timestep, solver.sim_forward). score_substeps>0:
            # RK4-substepped prediction with the plant's own integrator —
            # the closed_loop_rollout_estimator treatment, which removes
            # the one-step integrator-mismatch floor from the ranking
            if score_substeps > 0:
                hs = control_dt / score_substeps

                def pred_one(fe):
                    def sub(x, _):
                        return _rk4(model, x, u_last, hs, f_ext=fe), None
                    return jax.lax.scan(sub, x_last, None,
                                        length=score_substeps)[0]
                pred = jax.vmap(pred_one)(batch)
            else:
                pred = jax.vmap(
                    lambda fe: sim_step(
                        model, x_last, u_last, control_dt, f_ext=fe,
                        integrator_type=settings.integrator_type)
                )(batch)
            errs = jnp.linalg.norm(pred - x_cur[None, :], axis=1)
            errs = jnp.where(jnp.isfinite(errs), errs, jnp.inf)
            best = jnp.argmin(errs)
            fe_state = fe_update(fe_state, dirs, best, errs,
                                 jax.random.uniform(sub, (3,)),
                                 alpha=0.6, beta=0.5,
                                 min_radius=2.0, max_radius=20.0,
                                 smoothing_factor=0.5)
        else:
            best = jnp.int32(0)

        X = jnp.tile(Xo[best][None], (B, 1, 1))
        U = jnp.tile(Uo[best][None], (B, 1, 1))
        out = (x_sim, ee, dist, goal_idx, best, fe_state.smoothed,
               fe_state.radius)
        return (x_sim, X, U, lam, fe_state, key, goal_idx, goal_start, t,
                outcomes, reached_t, done), out

    carry0 = (x_sim0, X, U, lam, fe_state, key,
              jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
              jnp.zeros(G, jnp.int32), jnp.full(G, -1.0, jnp.float32),
              jnp.asarray(False))
    carry, (xs, ees, dists, gidx, bests, fests, radii) = jax.lax.scan(
        body, carry0, None, length=n_steps)
    return xs, ees, dists, gidx, bests, carry[9], carry[10], fests, radii


@partial(jax.jit, static_argnames=("settings", "batch_size", "sim_substeps",
                                   "estimator"))
def closed_loop_rollout_estimator(
    model: RobotModel,
    settings: BSQPSettings,
    cp: CostParams,
    hp: HyperParams,
    x_sim0,                    # (nx,) initial state
    refs,                      # (n_steps, N, 6) reference windows per cycle
    true_f_ext,                # (6,) ground-truth WORLD-frame wrench
                               # [force; torque] applied at the EE link
    dt,
    control_dt,
    batch_size: int,
    key,                       # PRNG key for the estimator's rotations
    sim_substeps: int = 4,
    initial_radius: float = 10.0,
    estimator: str = "sphere",
):
    """Force-adaptive MPC entirely on device: each scan cycle generates the
    wrench-hypothesis batch from the estimator state, solves, picks the lane
    whose one-step prediction best explains the measured state (the
    reference's evaluate_best_trajectory, mpc_controller.py:294-309), steps
    the true plant under `true_f_ext`, and runs the estimator update — the
    full loop of the reference's examples/force_estimator.py experiment with
    zero host round-trips. Returns (x_sim traj, ee traj, smoothed force
    estimates (n_steps, 6), per-cycle min prediction errors (n_steps,))."""
    from .common import world_wrench_to_ee_frame
    from .force_estimator_device import (fe_generate, fe_init, fe_update,
                                         fibonacci_sphere, observer_update)

    B = batch_size
    N = settings.N
    nq, nx, nu = model.nq, model.nx, model.nu
    dirs = jnp.asarray(fibonacci_sphere(B - 3))

    x0 = x_sim0[:nx]
    X = jnp.tile(x0, (B, N, 1))
    U = jnp.zeros((B, N - 1, nu), x0.dtype)
    lam = jnp.zeros((B, N, nx), x0.dtype)
    h = control_dt / sim_substeps
    fe0 = fe_init(initial_radius)

    def body(carry, ref_k):
        x_sim, X, U, lam, x_last, u_last, batch_last, fe_state, key = carry
        x_cur = x_sim  # pre-step state: the scoring anchor for NEXT cycle
        x_s = jnp.tile(x_sim, (B, 1))
        X = X.at[:, 0, :].set(x_s)
        # hypotheses live in the WORLD frame (estimator dims [:3] = force,
        # the reference's convention); the solver wants EE-frame [n; f]
        # (mpc_controller.py:279-292 transform, done on device here)
        if estimator == "observer":
            # the Gauss-Newton observer needs no exploration lanes: lane 0
            # carries the estimate, lane 1 the zero (safety) hypothesis
            w_obs = fe_state.estimate
            batch_w = jnp.concatenate(
                [w_obs[None], jnp.zeros((1, 6), w_obs.dtype),
                 jnp.tile(w_obs[None], (B - 2, 1))])
        else:
            batch_w = fe_generate(fe_state, dirs)
        batch = jax.vmap(
            lambda w: world_wrench_to_ee_frame(model, x_sim[:nq], w)
        )(batch_w)

        Xo, Uo, lam, hp_out, stats = solve_batched(
            model, settings, cp, hp, X, U, lam, x_s,
            jnp.tile(ref_k[None], (B, 1, 1)), batch, dt,
        )
        # score the PREVIOUS cycle's hypotheses against the state they
        # predicted. Unlike the reference (one trapezoidal step,
        # mpc_controller.py:294-309) the prediction uses the SAME RK4
        # substepping as the plant: the integrator-mismatch floor of the
        # one-step score otherwise swamps the per-step effect of a ~10 N
        # hypothesis error and the estimator cannot converge
        def pred_one(fe):
            def sub(x, _):
                return _rk4(model, x, u_last, h, f_ext=fe), None
            return jax.lax.scan(sub, x_last, None, length=sim_substeps)[0]

        pred = jax.vmap(pred_one)(batch_last)
        errs = jnp.linalg.norm(pred - x_sim[None, :], axis=1)
        errs = jnp.where(jnp.isfinite(errs), errs, jnp.inf)
        best = jnp.argmin(errs)
        key, sub = jax.random.split(key)
        if estimator == "observer":
            def pred_w(w):
                fe_l = world_wrench_to_ee_frame(model, x_last[:nq], w)

                def st(x, _):
                    return _rk4(model, x, u_last, h, f_ext=fe_l), None
                return jax.lax.scan(st, x_last, None,
                                    length=sim_substeps)[0]

            w_new = observer_update(pred_w, fe_state.estimate, x_sim)
            # no valid transition before the first control was applied
            w_new = jnp.where(fe_state.err_count > 0, w_new,
                              fe_state.estimate)
            from dataclasses import replace as _replace
            fe_state = _replace(
                fe_state, estimate=w_new, smoothed=w_new,
                err_hist=jnp.concatenate(
                    [fe_state.err_hist[1:], jnp.min(errs)[None]]),
                err_count=fe_state.err_count + 1)
        else:
            fe_state = fe_update(fe_state, dirs, best, errs,
                                 jax.random.uniform(sub, (3,)),
                                 alpha=0.6, beta=0.5,  # mpc_controller.py:244
                                 min_radius=1.0, max_radius=100.0)

        u0 = Uo[best, 0]
        # the true wrench is constant in the WORLD frame; re-express at the
        # current configuration (once per cycle: the EE rotates little in
        # one control period)
        fe_loc = world_wrench_to_ee_frame(model, x_cur[:nq], true_f_ext)
        if jax.default_backend() == "tpu":
            def sub_step(x, _):
                return rk4_step_batched_pallas(
                    model, x[None], u0[None], h,
                    f_ext=fe_loc[None])[0], None
        else:
            def sub_step(x, _):
                return _rk4(model, x, u0, h, f_ext=fe_loc), None
        x_sim, _ = jax.lax.scan(sub_step, x_sim, None, length=sim_substeps)

        X = jnp.tile(Xo[best][None], (B, 1, 1))
        U = jnp.tile(Uo[best][None], (B, 1, 1))
        _, ps = fk(model, x_sim[:nq])
        out = (x_sim, ps[-1], fe_state.smoothed, jnp.min(errs))
        return (x_sim, X, U, lam, x_cur, u0, batch, fe_state, key), out

    u_init = jnp.zeros((nu,), x0.dtype)
    batch0 = fe_generate(fe0, dirs)
    carry0 = (x_sim0, X, U, lam, x0, u_init, batch0, fe0, key)
    _, (xs, ees, fests, errs) = jax.lax.scan(body, carry0, refs)
    return xs, ees, fests, errs
