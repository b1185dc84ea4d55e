"""L1 merit function over candidate steps x + alpha dz.

Re-design of gato/bsqp/kernels/merit.cuh:16-92. One extra vmap axis replaces
the reference's grid z-dimension over alphas; the per-knot atomicAdd
accumulation becomes a sum over the knot axis.

merit(alpha) = sum_k cost_k(xu_k + alpha dz_k)
             + mu * [ sum_{k<N-1} |e_k|_1 + |x_0 + alpha dz_0 - x_s|_1 ]
with e_k the integrator defect at the stepped candidate (merit.cuh:67-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dynamics.algorithms import fd, fk, joint_transforms
from ..robots.model import RobotModel
from .cost import CostParams, barrier, effective_limits, knot_cost
from .integrators import integrate


def _knot_cost_and_defect(model, cp, x, u, x_next, ref6, f_ext, dt,
                          integrator_type):
    """Fused per-knot merit terms sharing one set of joint transforms between
    the tracking cost's FK and the defect's forward dynamics (the reference
    gets this reuse for free inside one thread block, merit.cuh:56-84)."""
    nq = model.nq
    q, qd = x[:nq], x[nq:]
    E, r, R_link = joint_transforms(model, q)

    _, ps = fk(model, q, R_link=R_link)
    (jlo, jhi), (vlo, vhi), (clo, chi) = effective_limits(model)
    err = ps[-1] - ref6[:3]
    cost = 0.5 * cp.q_cost * jnp.sum(err * err)
    cost = cost + 0.5 * cp.qd_cost * jnp.sum(qd * qd)
    cost = cost + cp.q_lim_cost * jnp.sum(barrier(q, jlo, jhi))
    cost = cost + cp.vel_lim_cost * jnp.sum(barrier(qd, vlo, vhi))
    cost = cost + 0.5 * cp.u_cost * jnp.sum(u * u)
    cost = cost + cp.ctrl_lim_cost * jnp.sum(barrier(u, clo, chi))

    qdd = fd(model, q, qd, u, f_ext=f_ext, transforms=(E, r))
    q_n, qd_n = integrate(q, qd, qdd, dt, integrator_type)
    defect = jnp.sum(jnp.abs(x_next - jnp.concatenate([q_n, qd_n])))
    return cost, defect


def merit_value(
    model: RobotModel,
    cp: CostParams,
    X,  # (N, nx)
    U,  # (N-1, nu)
    x_s,  # (nx,)
    ref,  # (N, 6)
    f_ext,  # (6,)
    mu,  # scalar
    dt,
    integrator_type: int = 2,
):
    costs, defects = jax.vmap(
        lambda x, u, xn, r6: _knot_cost_and_defect(
            model, cp, x, u, xn, r6, f_ext, dt, integrator_type
        )
    )(X[:-1], U, X[1:], ref[:-1])
    cost_N = knot_cost(model, cp, X[-1], None, ref[-1], terminal=True)
    cost = jnp.sum(costs) + cost_N
    constraint = jnp.sum(defects) + jnp.sum(jnp.abs(X[0] - x_s))
    return cost + mu * constraint


def merit_alphas(
    model: RobotModel,
    cp: CostParams,
    X, U, dZX, dZU, x_s, ref, f_ext, mu, dt,
    alphas,  # (A,)
    integrator_type: int = 2,
):
    """Merit at X + alpha dZX, U + alpha dZU for each alpha: returns (A,)."""

    def one(alpha):
        return merit_value(
            model, cp, X + alpha * dZX, U + alpha * dZU,
            x_s, ref, f_ext, mu, dt, integrator_type,
        )

    return jax.vmap(one)(alphas)


def default_alphas(num_alphas: int = 8, dtype=jnp.float32):
    """alpha_j = 2^-j (merit.cuh:40)."""
    return 0.5 ** jnp.arange(num_alphas, dtype=dtype)
