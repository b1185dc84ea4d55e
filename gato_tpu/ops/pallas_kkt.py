"""Pallas TPU kernel for the fused KKT setup.

Runs the full per-(lane, knot) linearization — forward dynamics with sparse
dual-number derivatives, integrator Jacobians A/B, defects, and the cost
gradient/Hessian — in VMEM per 1024 work items (the GRiD-generated
setupKKTSystemBatched analogue, setup_kkt.cuh:14-157). The kernel body is the
channelized trace from ops/kkt_fast.py; under plain XLA that trace fragments
into hundreds of fusions, in Pallas it is one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..robots.model import RobotModel
from .cost import CostParams
from .kkt import KKTSystem
from .kkt_fast import (assemble_kkt, kkt_channel_count, kkt_knot_channels)
from .merit_fast import _get_cd

_TILE = 1024


def _interpret():
    return jax.default_backend() != "tpu"


def _kkt_kernel(cd, key, nq, integrator_type, chans_ref, w_ref, out_ref):
    nx = 2 * nq
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

    flat = kkt_knot_channels(cd, key, cp, q, qd, u, xn, r3, fe, dt,
                             integrator_type, q[0])
    for i, ch in enumerate(flat):
        out_ref[i, 0] = ch


def setup_kkt_pallas(model: RobotModel, cp: CostParams, X, U, x_s, ref,
                     f_ext, dt, integrator_type: int = 2) -> KKTSystem:
    """Drop-in for kkt_fast.setup_kkt_batched with the knot sweep in Pallas."""
    cd = _get_cd(model.key)
    nq = cd.nq
    nx = 2 * nq
    B, N = X.shape[0], X.shape[1]
    M = B * (N - 1)
    M_pad = -(-M // _TILE) * _TILE
    G = M_pad // _TILE

    xk = X[:, :-1].reshape(M, nx)
    xnm = X[:, 1:].reshape(M, nx)
    uk = U.reshape(M, nq)
    r3m = ref[:, :-1, :3].reshape(M, 3)
    fe_arr = jnp.broadcast_to(f_ext[:, None, :], (B, N - 1, 6)).reshape(M, 6)

    chans = jnp.concatenate([xk, uk, xnm, r3m, fe_arr], axis=1).T  # (C_in, M)
    pad = M_pad - M
    if pad:
        chans = jnp.pad(chans, ((0, 0), (0, pad)))
    C_in = chans.shape[0]
    chans = chans.reshape(C_in, G, 8, 128)

    w = jnp.stack([cp.q_cost, cp.qd_cost, cp.u_cost, cp.N_cost,
                   cp.q_lim_cost, cp.vel_lim_cost, cp.ctrl_lim_cost,
                   jnp.asarray(dt, chans.dtype)]).astype(chans.dtype)
    w = w.reshape(8, 1, 1)

    C_out = kkt_channel_count(nq)
    kernel = functools.partial(_kkt_kernel, cd, model.key, nq, integrator_type)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((C_in, 1, 8, 128), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1, 1), lambda g: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((C_out, 1, 8, 128), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_out, G, 8, 128), chans.dtype),
        interpret=_interpret(),
    )(chans, w)
    stacked = out.reshape(C_out, M_pad)[:, :M]
    return assemble_kkt(model, cp, stacked, X, x_s, ref, B, N, nq)
