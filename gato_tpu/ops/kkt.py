"""Batched KKT system setup: linearize dynamics + quadraticize cost per knot.

Re-design of gato/bsqp/kernels/setup_kkt.cuh. The reference maps one CUDA
block per (knot, solve); here knots are a vmapped array axis and the batch is
an outer vmap, so XLA fuses the whole setup into one program.

Conventions (matching setup_kkt.cuh:52-101):
  c[0]   = x_0 - x_s                     (initial-state residual)
  c[k+1] = x_{k+1} - f(x_k, u_k)         (signed integrator defect)
  A_k, B_k: discrete dynamics Jacobians at knot k (k = 0..N-2)
  Q_k, q_k: cost Hessian/gradient at knots 0..N-1 (terminal uses N_cost)
  R_k, r_k: control cost at knots 0..N-2
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..robots.model import RobotModel
from .cost import CostParams, knot_cost_grad_hess
from .integrators import integrate, linearize


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KKTSystem:
    """Data contract mirroring the reference KKTSystem (gato/types.cuh:63-72)."""

    Q: jax.Array  # (N, nx, nx)
    q: jax.Array  # (N, nx)
    R: jax.Array  # (N-1, nu, nu)
    r: jax.Array  # (N-1, nu)
    A: jax.Array  # (N-1, nx, nx)
    B: jax.Array  # (N-1, nx, nu)
    c: jax.Array  # (N, nx)


def setup_kkt(
    model: RobotModel,
    cp: CostParams,
    X,  # (N, nx)
    U,  # (N-1, nu)
    x_s,  # (nx,)
    ref,  # (N, 6) EE reference
    f_ext,  # (6,)
    dt,
    integrator_type: int = 2,
) -> KKTSystem:
    nq = model.nq

    def lin_knot(x, u, x_next):
        qdd, A, B = linearize(model, x, u, dt, f_ext=f_ext, integrator_type=integrator_type)
        q_n, qd_n = integrate(x[:nq], x[nq:], qdd, dt, integrator_type)
        defect = x_next - jnp.concatenate([q_n, qd_n])
        return A, B, defect

    A, B, defects = jax.vmap(lin_knot)(X[:-1], U, X[1:])

    def cost_knot(x, u, ref6):
        return knot_cost_grad_hess(model, cp, x, u, ref6, terminal=False)

    Q, q, R, r = jax.vmap(cost_knot)(X[:-1], U, ref[:-1])
    QN, qN, _, _ = knot_cost_grad_hess(model, cp, X[-1], None, ref[-1], terminal=True)

    c = jnp.concatenate([(X[0] - x_s)[None], defects], axis=0)
    return KKTSystem(
        Q=jnp.concatenate([Q, QN[None]], axis=0),
        q=jnp.concatenate([q, qN[None]], axis=0),
        R=R,
        r=r,
        A=A,
        B=B,
        c=c,
    )
