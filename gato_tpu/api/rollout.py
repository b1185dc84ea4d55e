"""Fully on-device closed-loop MPC rollout.

A capability beyond the reference: the entire closed loop — batched BSQP
solve, best-lane selection, simulator stepping (optionally on a different,
e.g. pendulum-augmented, plant), warm-start carry-over and rho resets — runs
as ONE jitted lax.scan. No host round-trips per cycle, which makes
closed-loop evaluation ~100x faster than the Python-stepped loop on this
image's tunneled runtime, and enables sweeping controller configurations
on-device.

The Python MPC_GATO loop (api/mpc.py) remains the full-featured path (force
estimator adaptation is host-side); this rollout covers fixed per-lane
f_ext hypotheses with on-device best-lane selection by final merit.
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


def _rk4(model, x, u, h):
    nq = model.nq

    def deriv(x):
        return jnp.concatenate([x[nq:], fd(model, x[:nq], x[nq:], u)])

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
            best = jnp.argmin(
                jnp.linalg.norm(pred - x_cur[None, :], axis=1))
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
