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

from ..robots.model import RobotModel
from .cost import CostParams, knot_cost
from .integrators import sim_step


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
    costs = jax.vmap(
        lambda x, u, r6: knot_cost(model, cp, x, u, r6, terminal=False)
    )(X[:-1], U, ref[:-1])
    cost_N = knot_cost(model, cp, X[-1], None, ref[-1], terminal=True)
    cost = jnp.sum(costs) + cost_N

    defects = jax.vmap(
        lambda x, u, xn: jnp.sum(
            jnp.abs(xn - sim_step(model, x, u, dt, f_ext, integrator_type))
        )
    )(X[:-1], U, X[1:])
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
