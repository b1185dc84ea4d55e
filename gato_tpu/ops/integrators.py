"""Explicit integrators, defects, and analytic linearization (A, B).

Re-design of gato/dynamics/integrator.cuh:20-257. INTEGRATOR_TYPE semantics
match the reference: 0 = Euler, 1 = semi-implicit Euler, 2 = trapezoidal
(the default used everywhere). ANGLE_WRAP is supported for parity
(integrator.cuh:11-18) but off by default, as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dynamics.algorithms import fd, fd_and_grad
from ..robots.model import RobotModel


def _angle_wrap(q):
    """Reference angle_wrap (integrator.cuh:11-18), pi truncated to 3.14159."""
    pi = 3.14159
    q = jnp.where(q > pi, -(q - pi), q)
    q = jnp.where(q < -pi, -(q + pi), q)
    return q


def integrate(q, qd, qdd, dt, integrator_type: int = 2, angle_wrap: bool = False):
    """One explicit step (integrator.cuh:20-45)."""
    if integrator_type == 0:  # Euler
        q_next = q + dt * qd
        qd_next = qd + dt * qdd
    elif integrator_type == 1:  # semi-implicit Euler
        qd_next = qd + dt * qdd
        q_next = q + dt * qd_next
    elif integrator_type == 2:  # trapezoidal
        qd_next = qd + dt * qdd
        q_next = q + dt * qd + 0.5 * qdd * dt * dt
    else:
        raise ValueError(f"unknown integrator type {integrator_type}")
    if angle_wrap:
        q_next = _angle_wrap(q_next)
    return q_next, qd_next


def sim_step(model: RobotModel, x, u, dt, f_ext=None, integrator_type: int = 2):
    """Forward-dynamics step x_{k+1} = f(x_k, u_k) (integrator.cuh:190-209)."""
    nq = model.nq
    q, qd = x[:nq], x[nq:]
    qdd = fd(model, q, qd, u, f_ext=f_ext)
    q_n, qd_n = integrate(q, qd, qdd, dt, integrator_type)
    return jnp.concatenate([q_n, qd_n])


def defect(model: RobotModel, x, u, x_next, dt, f_ext=None, integrator_type: int = 2):
    """Signed integrator defect e_k = x_{k+1} - f(x_k, u_k)
    (integrator.cuh:48-62 with ABSVAL=false, as used for the KKT c vector)."""
    return x_next - sim_step(model, x, u, dt, f_ext, integrator_type)


def linearize(model: RobotModel, x, u, dt, f_ext=None, integrator_type: int = 2):
    """qdd plus discrete dynamics Jacobians A = dx'/dx, B = dx'/du.

    Mirrors integrator_gradient_inner (integrator.cuh:65-188); e.g. for the
    trapezoidal default:
      A = [[I + dt^2/2 dqdd_dq,  dt I + dt^2/2 dqdd_dqd],
           [dt dqdd_dq,          I + dt dqdd_dqd       ]]
      B = [[dt^2/2 dqdd_du], [dt dqdd_du]]
    """
    nq = model.nq
    q, qd = x[:nq], x[nq:]
    qdd, dq, dqd, dtau = fd_and_grad(model, q, qd, u, f_ext=f_ext)

    eye = jnp.eye(nq, dtype=x.dtype)
    if integrator_type == 0:
        a11, a12 = eye, dt * eye
        b1 = jnp.zeros_like(dtau)
        a21, a22 = dt * dq, eye + dt * dqd
        b2 = dt * dtau
    elif integrator_type == 1:
        a11, a12 = eye + dt * dt * dq, dt * eye + dt * dt * dqd
        b1 = dt * dt * dtau
        a21, a22 = dt * dq, eye + dt * dqd
        b2 = dt * dtau
    elif integrator_type == 2:
        h = 0.5 * dt * dt
        a11, a12 = eye + h * dq, dt * eye + h * dqd
        b1 = h * dtau
        a21, a22 = dt * dq, eye + dt * dqd
        b2 = dt * dtau
    else:
        raise ValueError(f"unknown integrator type {integrator_type}")

    A = jnp.block([[a11, a12], [a21, a22]])
    B = jnp.concatenate([b1, b2], axis=0)
    return qdd, A, B
