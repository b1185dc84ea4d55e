"""EE-tracking cost with log-barrier limits: values, gradients, GN Hessians.

Re-design of the reference plant cost layer (indy7_plant.cuh:130-148 barriers,
:266-323 trackingcost, :325-447 trackingCostGradientAndHessian). Semantics are
matched exactly, including:
  - the limit margin baked into the limit tables (JOINT_LIMIT_MARGIN = -0.1,
    indy7_plant.cuh:60-97): limits are narrowed by 0.1,
  - barrier distance clamps of 1e-10 (value) and 1e-6 (gradient),
  - the rank-1 outer-product Hessian  w * g g^T  with g = J^T (ee - ref)
    (NOT the standard Gauss-Newton J^T J; see indy7_plant.cuh:380-387),
  - barrier-gradient outer products across the whole qq block,
  - terminal knots use N_cost for the tracking term and have no control cost.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..dynamics.algorithms import ee_position, ee_position_and_jacobian
from .batch_linalg import mtv
from ..robots.model import RobotModel

LIMIT_MARGIN = 0.1  # reference: JOINT_LIMIT_MARGIN<T>() == -0.1 applied as
# {lower - margin, upper + margin}, i.e. narrowed by 0.1.


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CostParams:
    """Dynamic (traceable) cost weights; mirrors the 7 weights threaded through
    every reference kernel launch (bsqp.cuh:43-45)."""

    q_cost: jax.Array
    qd_cost: jax.Array
    u_cost: jax.Array
    N_cost: jax.Array
    q_lim_cost: jax.Array
    vel_lim_cost: jax.Array
    ctrl_lim_cost: jax.Array

    @staticmethod
    def create(q_cost=2.0, qd_cost=1e-4, u_cost=1e-6, N_cost=50.0,
               q_lim_cost=1e-3, vel_lim_cost=0.0, ctrl_lim_cost=0.0,
               dtype=jnp.float32):
        c = lambda v: jnp.asarray(v, dtype=dtype)
        return CostParams(c(q_cost), c(qd_cost), c(u_cost), c(N_cost),
                          c(q_lim_cost), c(vel_lim_cost), c(ctrl_lim_cost))


def effective_limits(model: RobotModel):
    """(lo, hi) triples for q, qd, u with the reference margin applied."""
    jl = (model.joint_limits[:, 0] + LIMIT_MARGIN, model.joint_limits[:, 1] - LIMIT_MARGIN)
    vl = (model.velocity_limits[:, 0] + LIMIT_MARGIN, model.velocity_limits[:, 1] - LIMIT_MARGIN)
    cl = (model.effort_limits[:, 0] + LIMIT_MARGIN, model.effort_limits[:, 1] - LIMIT_MARGIN)
    return jl, vl, cl


def barrier(x, lo, hi):
    """-log(x - lo) - log(hi - x), distances clamped at 1e-10
    (indy7_plant.cuh:130-138). Computed as -log(d_min * d_max): one
    transcendental instead of two (identical clamping semantics)."""
    d_min = jnp.maximum(x - lo, 1e-10)
    d_max = jnp.maximum(hi - x, 1e-10)
    return -jnp.log(d_min * d_max)


def barrier_grad(x, lo, hi):
    """d/dx barrier, distances clamped at 1e-6 (indy7_plant.cuh:140-148)."""
    d_min = jnp.maximum(x - lo, 1e-6)
    d_max = jnp.maximum(hi - x, 1e-6)
    return -1.0 / d_min + 1.0 / d_max


def knot_cost(model: RobotModel, cp: CostParams, x, u, ref6, terminal):
    """Single-knot tracking cost (indy7_plant.cuh:266-323).

    terminal: python bool — terminal knots swap q_cost -> N_cost and drop the
    control terms (u may be None there).
    """
    nq = model.nq
    q, qd = x[:nq], x[nq:]
    (jlo, jhi), (vlo, vhi), (clo, chi) = effective_limits(model)

    ee = ee_position(model, q)[:3]
    err = ee - ref6[:3]
    w_track = cp.N_cost if terminal else cp.q_cost
    cost = 0.5 * w_track * jnp.sum(err * err)
    cost = cost + 0.5 * cp.qd_cost * jnp.sum(qd * qd)
    cost = cost + cp.q_lim_cost * jnp.sum(barrier(q, jlo, jhi))
    cost = cost + cp.vel_lim_cost * jnp.sum(barrier(qd, vlo, vhi))
    if not terminal:
        cost = cost + 0.5 * cp.u_cost * jnp.sum(u * u)
        cost = cost + cp.ctrl_lim_cost * jnp.sum(barrier(u, clo, chi))
    return cost


def knot_cost_grad_hess(model: RobotModel, cp: CostParams, x, u, ref6, terminal):
    """Gradient and (rank-1 outer-product) Hessian of the knot cost.

    Returns (Q (nx,nx), qv (nx,)) and, for non-terminal knots,
    (R (nu,nu), rv (nu,)); mirrors trackingCostGradientAndHessian
    (indy7_plant.cuh:325-421) including its quirks:
      - tracking Hessian = w * g g^T with g = J_xyz^T (ee - ref) (the weight
        applied once, not squared),
      - q-barrier contributes q_lim_cost * bg bg^T over the whole qq block,
      - qd/u blocks are diagonal (weight + lim_cost * bg_i^2).
    """
    nq, nx = model.nq, model.nx
    q, qd = x[:nq], x[nq:]
    (jlo, jhi), (vlo, vhi), (clo, chi) = effective_limits(model)

    ee, J = ee_position_and_jacobian(model, q)  # xyz + (3, nq), one FK
    err = ee - ref6[:3]
    w_track = cp.N_cost if terminal else cp.q_cost

    g = mtv(J, err)  # (nq,) unweighted tracking gradient direction
    bg_q = barrier_grad(q, jlo, jhi)
    bg_qd = barrier_grad(qd, vlo, vhi)

    grad_q = w_track * g + cp.q_lim_cost * bg_q
    grad_qd = cp.qd_cost * qd + cp.vel_lim_cost * bg_qd
    qv = jnp.concatenate([grad_q, grad_qd])

    Q = jnp.zeros((nx, nx), dtype=x.dtype)
    Q = Q.at[:nq, :nq].set(
        w_track * jnp.outer(g, g) + cp.q_lim_cost * jnp.outer(bg_q, bg_q)
    )
    Q = Q.at[nq:, nq:].set(jnp.diag(cp.qd_cost + cp.vel_lim_cost * bg_qd * bg_qd))

    if terminal:
        return Q, qv, None, None

    bg_u = barrier_grad(u, clo, chi)
    rv = cp.u_cost * u + cp.ctrl_lim_cost * bg_u
    R = jnp.diag(cp.u_cost + cp.ctrl_lim_cost * bg_u * bg_u)
    return Q, qv, R, rv
