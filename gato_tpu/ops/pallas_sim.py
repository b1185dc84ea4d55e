"""Pallas TPU kernel for batched RK4 forward simulation.

The simulator step (the Pinocchio-role RK4 plant, reference
python/bsqp/common.py:49-91) is a long chain of tiny ops: at small batch XLA
lowers it to scalar code on the TPU's scalar core — measured ~3.5 ms for one
B=1 step on this image, which dominates an on-device closed-loop MPC cycle.
This kernel runs the whole step (substeps x 4 forward-dynamics evaluations,
via the channelized dynamics core with robot constants folded) on full
(8, 128) VMEM tiles: one kernel, vector ops regardless of batch size.

Used by the benchmark's chained closed-loop timing and available to
api/rollout.py for base (non-augmented) plants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..robots.model import RobotModel
from .merit_fast import _get_cd

_TILE = 1024


def _interpret():
    return jax.default_backend() != "tpu"


def rk4_channels(cd, q, qd, u, fe, dt, substeps):
    """RK4 integration on dynamics channels: q/qd/u are nq-length channel
    lists, fe a 6-length channel list or None. Works on any channel shape —
    (M,) arrays under XLA or (8, 128) VMEM blocks inside the kernel."""
    nq = cd.nq
    h = dt / substeps

    def deriv(q, qd):
        cs = [jnp.cos(x) for x in q]
        ss = [jnp.sin(x) for x in q]
        qdd = cd.fd(cs, ss, qd, u, f_ext=fe)
        return qd, qdd

    def axpy(x, a, y):
        return [x[i] + a * y[i] for i in range(len(x))]

    for _ in range(substeps):
        k1q, k1qd = deriv(q, qd)
        k2q, k2qd = deriv(axpy(q, 0.5 * h, k1q), axpy(qd, 0.5 * h, k1qd))
        k3q, k3qd = deriv(axpy(q, 0.5 * h, k2q), axpy(qd, 0.5 * h, k2qd))
        k4q, k4qd = deriv(axpy(q, h, k3q), axpy(qd, h, k3qd))
        q = [q[i] + (h / 6.0) * (k1q[i] + 2 * k2q[i] + 2 * k3q[i] + k4q[i])
             for i in range(nq)]
        qd = [qd[i] + (h / 6.0) * (k1qd[i] + 2 * k2qd[i] + 2 * k3qd[i]
                                   + k4qd[i])
              for i in range(nq)]
    return q, qd


def _rk4_kernel(cd, nq, substeps, has_fe, chans_ref, dt_ref, out_ref):
    idx = 0

    def take(n):
        nonlocal idx
        out = [chans_ref[idx + i, 0] for i in range(n)]
        idx += n
        return out

    q = take(nq)
    qd = take(nq)
    u = take(nq)
    fe = take(6) if has_fe else None
    q, qd = rk4_channels(cd, q, qd, u, fe, dt_ref[0, 0, 0], substeps)
    for i in range(nq):
        out_ref[i, 0] = q[i]
    for i in range(nq):
        out_ref[nq + i, 0] = qd[i]


def rk4_step_batched_pallas(model: RobotModel, x, u, dt, f_ext=None,
                            substeps: int = 1):
    """Batched RK4 step: x (B, nx), u (B, nu), optional EE-frame wrench
    f_ext (B, 6) -> (B, nx). Matches api/common.rk4_step semantics for a
    constant EE-frame wrench (the world-frame re-expression stays with the
    XLA path)."""
    cd = _get_cd(model.key)
    nq = cd.nq
    nx = 2 * nq
    B = x.shape[0]
    M_pad = -(-B // _TILE) * _TILE
    G = M_pad // _TILE

    parts = [x, u]
    if f_ext is not None:
        parts.append(f_ext)
    chans = jnp.concatenate(parts, axis=1).T  # (C_in, B)
    if M_pad - B:
        chans = jnp.pad(chans, ((0, 0), (0, M_pad - B)))
    C_in = chans.shape[0]
    chans = chans.reshape(C_in, G, 8, 128)
    dt_arr = jnp.asarray(dt, chans.dtype).reshape(1, 1, 1)

    kernel = functools.partial(_rk4_kernel, cd, nq, substeps,
                               f_ext is not None)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((C_in, 1, 8, 128), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nx, 1, 8, 128), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, G, 8, 128), chans.dtype),
        interpret=_interpret(),
    )(chans, dt_arr)
    return out.reshape(nx, M_pad)[:, :B].T
