"""Codegen-style fused merit sweep over (lane, alpha, knot) work items.

Same semantics as ops/merit.py (the reference's computeMeritBatched,
merit.cuh:16-92), but built on the channelized dynamics core
(dynamics/channelized.py): robot constants fold at trace time, every op is a
wide elementwise op over the flattened (B * num_alphas * (N-1)) work axis, and
XLA fuses the whole sweep into a handful of kernels instead of ~850 fusions
with ~175 MB of HBM temporaries (measured on the array-based path).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..dynamics.channelized import ChannelizedDynamics, chadd
from ..robots.model import RobotModel, get_parsed
from .cost import LIMIT_MARGIN, CostParams


@functools.lru_cache(maxsize=None)
def _get_cd(key: str) -> ChannelizedDynamics:
    return ChannelizedDynamics(get_parsed(key))


def _limits(cd_key: str):
    p = get_parsed(cd_key)
    jl = (p.joint_limits[:, 0] + LIMIT_MARGIN, p.joint_limits[:, 1] - LIMIT_MARGIN)
    vl = (p.velocity_limits[:, 0] + LIMIT_MARGIN, p.velocity_limits[:, 1] - LIMIT_MARGIN)
    cl = (p.effort_limits[:, 0] + LIMIT_MARGIN, p.effort_limits[:, 1] - LIMIT_MARGIN)
    return jl, vl, cl


def _barrier_sum(xs, lo, hi):
    """Sum_i -log(clamp(x_i-lo_i) * clamp(hi_i-x_i)); limits python floats."""
    total = None
    for i, x in enumerate(xs):
        d1 = jnp.maximum(x - float(lo[i]), 1e-10)
        d2 = jnp.maximum(float(hi[i]) - x, 1e-10)
        total = chadd(total, -jnp.log(d1 * d2))
    return total


def _sq_sum(xs):
    total = None
    for x in xs:
        total = chadd(total, x * x)
    return total


def _knot_terms(cd, key, cp: CostParams, q, qd, u, xn, r3, fe, dt,
                integrator_type):
    """cost, defect channels for one non-terminal knot work item."""
    (jlo, jhi), (vlo, vhi), (clo, chi) = _limits(key)
    cs = [jnp.cos(x) for x in q]
    ss = [jnp.sin(x) for x in q]

    p_ee, _, _ = cd.fk_ee(cs, ss)
    err = [p_ee[k] - r3[k] for k in range(3)]
    cost = 0.5 * cp.q_cost * _sq_sum(err)
    cost = cost + 0.5 * cp.qd_cost * _sq_sum(qd)
    cost = cost + cp.q_lim_cost * _barrier_sum(q, jlo, jhi)
    cost = cost + cp.vel_lim_cost * _barrier_sum(qd, vlo, vhi)
    cost = cost + 0.5 * cp.u_cost * _sq_sum(u)
    cost = cost + cp.ctrl_lim_cost * _barrier_sum(u, clo, chi)

    qdd = cd.fd(cs, ss, qd, u, f_ext=fe)
    nq = cd.nq
    defect = None
    for i in range(nq):
        if integrator_type == 0:
            q_n = q[i] + dt * qd[i]
            qd_n = qd[i] + dt * qdd[i]
        elif integrator_type == 1:
            qd_n = qd[i] + dt * qdd[i]
            q_n = q[i] + dt * qd_n
        else:
            qd_n = qd[i] + dt * qdd[i]
            q_n = q[i] + dt * qd[i] + (0.5 * dt * dt) * qdd[i]
        defect = chadd(defect, jnp.abs(xn[i] - q_n))
        defect = chadd(defect, jnp.abs(xn[nq + i] - qd_n))
    return cost, defect


def _terminal_cost(cd, key, cp: CostParams, q, qd, r3):
    (jlo, jhi), (vlo, vhi), _ = _limits(key)
    cs = [jnp.cos(x) for x in q]
    ss = [jnp.sin(x) for x in q]
    p_ee, _, _ = cd.fk_ee(cs, ss)
    err = [p_ee[k] - r3[k] for k in range(3)]
    cost = 0.5 * cp.N_cost * _sq_sum(err)
    cost = cost + 0.5 * cp.qd_cost * _sq_sum(qd)
    cost = cost + cp.q_lim_cost * _barrier_sum(q, jlo, jhi)
    cost = cost + cp.vel_lim_cost * _barrier_sum(qd, vlo, vhi)
    return cost


def merit_alphas_batched(model: RobotModel, cp: CostParams, X, U, dZX, dZU,
                         x_s, ref, f_ext, mu, dt, alphas,
                         integrator_type: int = 2):
    """Merit at X + alpha dZX for every (lane, alpha): returns (B, A).

    Shapes: X (B,N,nx), U (B,N-1,nu), x_s (B,nx), ref (B,N,6), f_ext (B,6),
    mu (B,), alphas (A,).
    """
    cd = _get_cd(model.key)
    nq = cd.nq
    B, N, nx = X.shape
    A = alphas.shape[0]

    al = alphas[None, :, None, None]
    Xc = X[:, None] + al * dZX[:, None]  # (B, A, N, nx)
    Uc = U[:, None] + al * dZU[:, None]  # (B, A, N-1, nu)

    M = B * A * (N - 1)
    xk = Xc[:, :, :-1].reshape(M, nx)
    xn = Xc[:, :, 1:].reshape(M, nx)
    uk = Uc.reshape(M, nq)
    r3 = jnp.broadcast_to(ref[:, None, :-1, :3], (B, A, N - 1, 3)).reshape(M, 3)
    fe = jnp.broadcast_to(f_ext[:, None, None, :], (B, A, N - 1, 6)).reshape(M, 6)

    q = [xk[:, i] for i in range(nq)]
    qd = [xk[:, nq + i] for i in range(nq)]
    u = [uk[:, i] for i in range(nq)]
    xn_ch = [xn[:, i] for i in range(nx)]
    r3_ch = [r3[:, i] for i in range(3)]
    fe_ch = [fe[:, i] for i in range(6)]

    cost, defect = _knot_terms(cd, model.key, cp, q, qd, u, xn_ch, r3_ch,
                               fe_ch, dt, integrator_type)
    cost = cost.reshape(B, A, N - 1).sum(axis=-1)
    defect = defect.reshape(B, A, N - 1).sum(axis=-1)

    # terminal knot
    xT = Xc[:, :, -1].reshape(B * A, nx)
    rT = jnp.broadcast_to(ref[:, None, -1, :3], (B, A, 3)).reshape(B * A, 3)
    qT = [xT[:, i] for i in range(nq)]
    qdT = [xT[:, nq + i] for i in range(nq)]
    costT = _terminal_cost(cd, model.key, cp, qT, qdT,
                           [rT[:, i] for i in range(3)]).reshape(B, A)

    # initial-state violation, charged once (merit.cuh:74-83)
    x0c = Xc[:, :, 0]  # (B, A, nx)
    init_viol = jnp.sum(jnp.abs(x0c - x_s[:, None, :]), axis=-1)

    return cost + costT + mu[:, None] * (defect + init_viol)


def merit_value_batched(model: RobotModel, cp: CostParams, X, U, x_s, ref,
                        f_ext, mu, dt, integrator_type: int = 2):
    """Plain batched merit (B,) — the NumAlphas=1, dz=0 case."""
    zX = jnp.zeros_like(X)
    zU = jnp.zeros_like(U)
    one = jnp.ones((1,), X.dtype)
    return merit_alphas_batched(model, cp, X, U, zX, zU, x_s, ref, f_ext,
                                mu, dt, one, integrator_type)[:, 0]
