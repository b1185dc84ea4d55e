"""Pallas TPU kernel for the fused merit sweep.

The channelized merit (ops/merit_fast.py) already folds robot constants and
runs wide elementwise ops, but XLA still splits it into many fusions with HBM
round-trips between them. This kernel runs the whole per-work-item pipeline —
FK, tracking cost, barriers, forward dynamics (CRBA + Cholesky + RNEA),
integration, defect — on (8, 128) VMEM blocks per channel, one grid program
per 1024 work items, with zero intermediate HBM traffic. The kernel body IS
dynamics/channelized.py: the same traced algorithm serves XLA and Pallas.

On CPU (tests) the kernel runs in interpreter mode automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..robots.model import RobotModel
from .cost import CostParams
from .merit_fast import _get_cd, _knot_terms, _terminal_cost

_TILE = 1024  # work items per program: 8 sublanes x 128 lanes


def _interpret():
    return jax.default_backend() != "tpu"


def _pack(channels, M_pad):
    """Stack (M,) channels -> (C, G, 8, 128)."""
    a = jnp.stack(channels, axis=0)  # (C, M)
    C = a.shape[0]
    pad = M_pad - a.shape[1]
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
    return a.reshape(C, M_pad // _TILE, 8, 128)


def _merit_knot_kernel(cd, key, cp_ref_count, nq, nx, integrator_type,
                       chans_ref, w_ref, out_ref):
    """chans_ref: (C, 1, 8, 128) channel block; w_ref: (W, 1, 1) scalar params
    (cost weights + dt) in SMEM; out_ref: (2, 1, 8, 128) cost/defect."""
    idx = 0

    def take(n):
        nonlocal idx
        out = [chans_ref[idx + i, 0] for i in range(n)]
        idx += n
        return out

    q = take(nq)
    qd = take(nq)
    u = take(nq)
    xn = take(nx)
    r3 = take(3)
    fe = take(6)

    w = [w_ref[i, 0, 0] for i in range(8)]
    cp = CostParams(q_cost=w[0], qd_cost=w[1], u_cost=w[2], N_cost=w[3],
                    q_lim_cost=w[4], vel_lim_cost=w[5], ctrl_lim_cost=w[6])
    dt = w[7]

    cost, defect = _knot_terms(cd, key, cp, q, qd, u, xn, r3, fe, dt,
                               integrator_type)
    out_ref[0, 0] = cost
    out_ref[1, 0] = defect


def merit_knot_sweep(model: RobotModel, cp: CostParams, xk, xn, uk, r3, fe,
                     dt, integrator_type: int = 2):
    """Fused per-knot (cost, defect) over M work items.
    xk, xn: (M, nx); uk: (M, nu); r3: (M, 3); fe: (M, 6). Returns (M,) x2."""
    cd = _get_cd(model.key)
    nq, nx = cd.nq, 2 * cd.nq
    M = xk.shape[0]
    M_pad = -(-M // _TILE) * _TILE
    G = M_pad // _TILE

    channels = ([xk[:, i] for i in range(nx)]  # q then qd
                + [uk[:, i] for i in range(nq)]
                + [xn[:, i] for i in range(nx)]
                + [r3[:, i] for i in range(3)]
                + [fe[:, i] for i in range(6)])
    packed = _pack(channels, M_pad)
    C = packed.shape[0]

    w = jnp.stack([cp.q_cost, cp.qd_cost, cp.u_cost, cp.N_cost,
                   cp.q_lim_cost, cp.vel_lim_cost, cp.ctrl_lim_cost,
                   jnp.asarray(dt, packed.dtype)]).astype(packed.dtype)
    w = w.reshape(8, 1, 1)

    kernel = functools.partial(_merit_knot_kernel, cd, model.key, 8, nq, nx,
                               integrator_type)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((C, 1, 8, 128), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1, 1), lambda g: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, 8, 128), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, G, 8, 128), packed.dtype),
        interpret=_interpret(),
    )(packed, w)
    out = out.reshape(2, M_pad)[:, :M]
    return out[0], out[1]


def merit_alphas_batched_pallas(model: RobotModel, cp: CostParams, X, U, dZX,
                                dZU, x_s, ref, f_ext, mu, dt, alphas,
                                integrator_type: int = 2):
    """Drop-in for merit_fast.merit_alphas_batched with the knot sweep in a
    Pallas kernel; terminal + initial-state terms stay in XLA (tiny)."""
    cd = _get_cd(model.key)
    nq = cd.nq
    nx = 2 * nq
    B, N = X.shape[0], X.shape[1]
    A = alphas.shape[0]

    al = alphas[None, :, None, None]
    Xc = X[:, None] + al * dZX[:, None]
    Uc = U[:, None] + al * dZU[:, None]

    M = B * A * (N - 1)
    xk = Xc[:, :, :-1].reshape(M, nx)
    xn = Xc[:, :, 1:].reshape(M, nx)
    uk = Uc.reshape(M, nq)
    r3 = jnp.broadcast_to(ref[:, None, :-1, :3], (B, A, N - 1, 3)).reshape(M, 3)
    fe = jnp.broadcast_to(f_ext[:, None, None, :], (B, A, N - 1, 6)).reshape(M, 6)

    cost, defect = merit_knot_sweep(model, cp, xk, xn, uk, r3, fe, dt,
                                    integrator_type)
    cost = cost.reshape(B, A, N - 1).sum(axis=-1)
    defect = defect.reshape(B, A, N - 1).sum(axis=-1)

    xT = Xc[:, :, -1].reshape(B * A, nx)
    rT = jnp.broadcast_to(ref[:, None, -1, :3], (B, A, 3)).reshape(B * A, 3)
    costT = _terminal_cost(
        cd, model.key, cp, [xT[:, i] for i in range(nq)],
        [xT[:, nq + i] for i in range(nq)],
        [rT[:, i] for i in range(3)],
    ).reshape(B, A)

    x0c = Xc[:, :, 0]
    init_viol = jnp.sum(jnp.abs(x0c - x_s[:, None, :]), axis=-1)
    return cost + costT + mu[:, None] * (defect + init_viol)
