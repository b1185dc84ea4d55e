"""Pallas TPU kernel: the whole batched PCG Krylov loop in VMEM.

This is the closest TPU analogue of the reference's persistent-kernel PCG
(gato/bsqp/kernels/pcg.cuh: one 1024-thread block per lane runs the entire
iteration with all five vectors in shared memory). Under plain XLA the
`lax.while_loop` body lowers to a serial chain of tiny fusions — at B=1 each
Krylov iteration costs several microseconds of scalar-lowered ops and a
40-iteration solve dominates the SQP step. Here the loop runs inside ONE
kernel on (B_pad, 128) VMEM tiles: batch rows on sublanes, knots on lanes,
block-tridiagonal matvecs as lane shifts.

Semantics identical to ops/pcg.py::pcg_solve_batched (abs tol + per-lane
relative tol, counter-before-check, skip lanes, freeze-on-convergence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pcg import PCG_ABS_TOL

_LANES = 128


def _interpret():
    return jax.default_backend() != "tpu"


def _lane_iota(x):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)


def _shift_fwd(x, seg=None):
    """x[k-1] at lane k (zero into lane 0). With `seg` (a static segment
    length, lanes hold G=L/seg independent problems' knots back to back),
    zero into the first lane of EVERY segment."""
    z = jnp.zeros((x.shape[0], 1), x.dtype)
    y = jnp.concatenate([z, x[:, :-1]], axis=1)
    if seg is not None and seg != x.shape[1]:
        y = jnp.where(_lane_iota(x) % seg == 0, 0.0, y)
    return y


def _shift_back(x, seg=None):
    """x[k+1] at lane k (zero into the last lane; with `seg`, into the last
    lane of every segment)."""
    z = jnp.zeros((x.shape[0], 1), x.dtype)
    y = jnp.concatenate([x[:, 1:], z], axis=1)
    if seg is not None and seg != x.shape[1]:
        y = jnp.where(_lane_iota(x) % seg == seg - 1, 0.0, y)
    return y


def _matvec(nx, main, lower, x, valid, seg=None):
    """Symmetric block-tridiagonal matvec on channel lists (ops/schur.py::
    btd_matvec). main/lower: nx*nx channel lists (row-major), x: nx channels;
    each channel (B_pad, N_pad). Block (k+1, k) of `lower` is stored at lane
    k; `upper` is its transpose."""
    y = []
    for r in range(nx):
        acc = None
        t1 = None  # lower @ x, to be shifted forward
        for c in range(nx):
            m = main[r * nx + c] * x[c]
            acc = m if acc is None else acc + m
            l = lower[r * nx + c] * x[c]
            t1 = l if t1 is None else t1 + l
        t2 = None  # lower^T @ x_{k+1}
        for c in range(nx):
            u = lower[c * nx + r] * _shift_back(x[c], seg)
            t2 = u if t2 is None else t2 + u
        y.append((acc + _shift_fwd(t1, seg) + t2) * valid)
    return y


def _dot(a, b, valid, seg=None):
    """Sum over (rows, knots) per batch row, broadcast back over lanes ->
    (B_pad, N_pad). Full-shape arrays keep every while-carry leaf in the
    native (8,128) vreg layout — Mosaic cannot legalize padded-layout or
    boolean vectors in scf.while carries.

    With `seg`, lanes hold L/seg independent problems: reduce+broadcast per
    segment via one matmul with the block-diagonal ones matrix (forced f32 —
    the TPU bf16 dot_general default would corrupt Krylov scalars).

    The matmul path is used even for a single whole-row segment: the
    jnp.sum + broadcast_to alternative produces a LANE-REPLICATED Mosaic
    layout ({0,*}), and a replicated rho/iters entering the scf.while carry
    cannot be relayouted back from the concrete layout the loop body
    produces ("Invalid relayout: non-singleton logical dimension is
    replicated in destination but not in source" at seg == L, caught on
    hardware by tools/tpu_verify_kernels.py at N=128). The 0/1 matmul at
    Precision.HIGHEST is exact in f32 and keeps every carry concrete.

    NaN containment: the contraction computes NaN * 0 = NaN, so one diverged
    problem's non-finite lanes would smear NaN into EVERY problem sharing
    its sublane row. Non-finite per-lane products are clamped to a huge
    finite sentinel first: the diverged problem's rho stays enormous (never
    reads as converged), its row-mates stay exact."""
    acc = None
    for r in range(len(a)):
        m = a[r] * b[r]
        acc = m if acc is None else acc + m
    # scrub BEFORE the valid mask: NaN * 0 = NaN would turn invalid-lane
    # junk into the sentinel instead of 0
    acc = jnp.where(jnp.abs(acc) <= 1e30, acc, 1e30)
    acc = acc * valid
    return _segsum_lanes(acc, seg)


def _segsum_lanes(acc, seg=None):
    """Per-segment sum over lanes, broadcast back over each segment's lanes
    (one exact-f32 matmul with the block-diagonal ones matrix; see _dot's
    docstring for why a matmul and not jnp.sum + broadcast)."""
    L = acc.shape[1]
    s = seg if seg is not None else L
    i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    segmat = (i // s == j // s).astype(acc.dtype)
    return jax.lax.dot_general(
        acc, segmat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=acc.dtype)


def pcg_channels(nx, max_iters, S_main, S_lower, P_main, P_lower, gamma,
                 lam, epsilon, skip, valid, seg=None):
    """The whole Krylov loop on channel lists (each channel (S, L): batch on
    sublanes, knots on lanes). Shared between the standalone PCG kernel and
    the fused SQP-iteration kernel (ops/pallas_iter.py).

    epsilon/skip: (S, L) channels constant over lanes; valid: (S, L) 0/1 mask
    of real knots. Returns (lam channels, iteration-count channel)."""
    r = [gamma[i] - y for i, y in
         enumerate(_matvec(nx, S_main, S_lower, lam, valid, seg))]
    z = _matvec(nx, P_main, P_lower, r, valid, seg)
    p = list(z)
    rho = _dot(r, z, valid, seg)
    rho_init = jnp.abs(rho)
    # a problem whose warm-started duals / Schur system hold NaN/inf (a
    # diverged previous solve) must not iterate — the Krylov updates would
    # just churn NaN — but must report max_iters so the SQP driver reads the
    # lane as NOT converged (the reference's |rho|<tol exit is False for its
    # NaN rho and burns all max_iters the same way, pcg.cuh:85-92). Detect
    # it with an exact per-problem non-finite indicator over the initial
    # residual/preconditioned channels (0/1 counts, no overflow), NOT by
    # magnitude: a finite-but-enormous warm-start rho is legitimate and the
    # reference's loop would iterate on it (round-4 advisor note).
    bad = None
    for ch in r + z:
        nb = 1.0 - jnp.isfinite(ch).astype(rho.dtype)
        bad = nb if bad is None else bad + nb
    bad = _segsum_lanes(bad * valid, seg)
    dead0 = (skip < 0.5) & (bad > 0.5)
    # active/converged masks stay f32 0/1: boolean vectors cannot cross the
    # scf.while carry boundary in Mosaic
    active = ((skip < 0.5) & ~dead0
              & (jnp.abs(rho) >= PCG_ABS_TOL)).astype(rho.dtype)
    iters = jnp.zeros_like(rho)

    def cond(state):
        _, _, _, _, active, _, it = state
        # full-(8,128) reduce to a scalar: 1-D slices can't be reduced in
        # Mosaic (vector.multi_reduction on sublane vectors fails)
        return jnp.logical_and(it < max_iters, jnp.max(active) > 0.5)

    def body(state):
        lam, r, p, rho, active, iters, it = state
        iters = iters + active

        Ap = _matvec(nx, S_main, S_lower, p, valid, seg)
        pAp = _dot(p, Ap, valid, seg)
        alpha = rho / jnp.where(pAp == 0, 1.0, pAp)
        am = active * alpha
        lam = [lam[i] + am * p[i] for i in range(nx)]
        r = [r[i] - am * Ap[i] for i in range(nx)]

        z = _matvec(nx, P_main, P_lower, r, valid, seg)
        rho_new = _dot(r, z, valid, seg)
        converged = jnp.abs(rho_new) < (PCG_ABS_TOL + epsilon * rho_init)

        beta = rho_new / jnp.where(rho == 0, 1.0, rho)
        kf = active * jnp.where(converged, 0.0, 1.0)
        p = [kf * (z[i] + beta * p[i]) + (1.0 - kf) * p[i] for i in range(nx)]
        rho = jnp.where(kf > 0.5, rho_new, rho)
        return lam, r, p, rho, kf, iters, it + 1

    lam, _, _, _, _, iters, _ = jax.lax.while_loop(
        cond, body, (lam, r, p, rho, active, iters, jnp.int32(0)))
    iters = jnp.where(dead0, float(max_iters), iters)
    return lam, iters


def _pcg_kernel(nx, N, max_iters, chans_ref, out_ref):
    idx = 0

    def take(n):
        nonlocal idx
        out = [chans_ref[idx + i] for i in range(n)]
        idx += n
        return out

    S_main = take(nx * nx)
    S_lower = take(nx * nx)
    P_main = take(nx * nx)
    P_lower = take(nx * nx)
    gamma = take(nx)
    lam = take(nx)
    epsilon = take(1)[0]  # (B_pad, N_pad), constant over lanes
    skip = take(1)[0]  # (B_pad, N_pad), 1.0 = skip

    shape = gamma[0].shape
    valid = (jax.lax.broadcasted_iota(jnp.int32, shape, 1)
             < N).astype(gamma[0].dtype)

    lam, iters = pcg_channels(nx, max_iters, S_main, S_lower, P_main,
                              P_lower, gamma, lam, epsilon, skip, valid)
    for i in range(nx):
        out_ref[i] = lam[i]
    out_ref[nx] = iters


def _pack(ms, B_pad, N_pad):
    """(B, N', nx, nx) or (B, N', nx) -> channel-major (C, B_pad, N_pad)."""
    B = ms.shape[0]
    Np = ms.shape[1]
    C = int(np_prod(ms.shape[2:]))
    ch = ms.reshape(B, Np, C).transpose(2, 0, 1)
    return jnp.pad(ch, ((0, 0), (0, B_pad - B), (0, N_pad - Np)))


def np_prod(t):
    out = 1
    for v in t:
        out *= v
    return out


def pcg_solve_batched_pallas(S_main, S_lower, P_main, P_lower, gamma, lam0,
                             epsilon, max_iters: int, skip):
    """Drop-in for ops/pcg.py::pcg_solve_batched, whole loop in one kernel.
    Shapes: S_main (B, N, nx, nx), S_lower (B, N-1, nx, nx), gamma/lam0
    (B, N, nx), epsilon/skip (B,). Intended for B <= 32 (VMEM bound)."""
    B, N, nx = gamma.shape
    B_pad = max(8, -(-B // 8) * 8)
    N_pad = -(-N // _LANES) * _LANES
    dt = gamma.dtype

    chans = jnp.concatenate([
        _pack(S_main, B_pad, N_pad),
        _pack(S_lower, B_pad, N_pad),
        _pack(P_main, B_pad, N_pad),
        _pack(P_lower, B_pad, N_pad),
        _pack(gamma, B_pad, N_pad),
        _pack(lam0, B_pad, N_pad),
        jnp.pad(jnp.broadcast_to(epsilon.astype(dt)[None, :, None],
                                 (1, B, N_pad)),
                ((0, 0), (0, B_pad - B), (0, 0))),
        jnp.pad(jnp.broadcast_to(skip.astype(dt)[None, :, None],
                                 (1, B, N_pad)),
                ((0, 0), (0, B_pad - B), (0, 0))),
    ], axis=0)
    C_in = chans.shape[0]

    kernel = functools.partial(_pcg_kernel, nx, N, max_iters)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx + 1, B_pad, N_pad), dt),
        interpret=_interpret(),
    )(chans)
    lam = out[:nx, :B, :N].transpose(1, 2, 0)
    iters = out[nx, :B, 0].astype(jnp.int32)
    return lam, iters
