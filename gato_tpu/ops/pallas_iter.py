"""Pallas TPU kernel: one full SQP iteration's linear-algebra core in VMEM.

The TPU answer to the reference's persistent-kernel design
(gato/bsqp/bsqp.cuh:103-197 launches 7 kernels per iteration but each one
keeps a whole solve resident in shared memory; gato/bsqp/kernels/pcg.cuh runs
the entire Krylov loop in one block). At small batch the XLA pipeline
KKT setup -> Schur condensation -> PCG -> dz recovery lowers to a long serial
chain of scalar ops and tiny fusions; here ALL of it runs in ONE kernel on
(B_pad, 128) VMEM channels — batch rows on sublanes, knots on lanes,
block-tridiagonal coupling as lane shifts:

  KKT linearization   dynamics/channelized.py trace (kkt_knot_channels_
                      structured), terminal lane folded in via a per-lane
                      tracking weight,
  Schur condensation  structure-aware channel algebra (rank-2 + diagonal Q
                      blocks, ops/schur.py math incl. the addScaledIdentity
                      half-diagonal quirk),
  dual solve          ops/pallas_pcg.py::pcg_channels (whole Krylov loop),
  dz recovery         ops/schur.py::compute_dz formulas on channels.

Semantics match the XLA path (setup_kkt -> build_schur -> pcg_solve_batched
-> compute_dz) to float32 roundoff; the channel body is pure jnp and is
parity-tested on plain arrays (tests/test_pallas_iter.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dynamics.channelized import (ch_chol_inv_n, chadd, chmul, chneg,
                                    chsub, chsum)
from ..robots.model import RobotModel
from .cost import CostParams
from .kkt_fast import _get_cd, kkt_knot_channels_structured
from .pallas_pcg import _shift_back, _shift_fwd, pcg_channels

_LANES = 128


def _interpret():
    return jax.default_backend() != "tpu"


def _mat(c, like):
    """Materialize a structural channel to a full array."""
    if c is None:
        return jnp.zeros_like(like)
    if isinstance(c, (int, float)):
        return jnp.full_like(like, c)
    return jnp.broadcast_to(c, like.shape).astype(like.dtype)


def iter_channels(cd, key, cp: CostParams, N: int, max_pcg_iters: int,
                  integrator_type: int, dt, X, U, xs, r3, fe, lam,
                  rho, eps, skip, like, seg=None, pvalid=None,
                  debug: bool = False):
    """One SQP iteration's KKT+Schur+PCG+dz on (S, L) channels (knots on
    lanes). X: nx channels, U: nu, xs: nx (constant over lanes), r3: 3,
    fe: 6, lam: nx, rho/eps/skip: (S, L) constant over lanes.

    `seg` (static): segment length when each lane row holds L/seg independent
    problems' knots back to back (short horizons waste 128-N lanes otherwise;
    the reference packs multiple solves per SM the same way at small N). All
    knot-coupled ops become segment-masked shifts / per-segment reductions.
    Returns (dzx nx, dzu nu, lam nx, iters 1) materialized channels."""
    nq = cd.nq
    nx = 2 * nq
    nu = nq
    L = like.shape[1]
    seg = seg or L
    lane = jax.lax.broadcasted_iota(jnp.int32, like.shape, 1) % seg
    valid = (lane < N).astype(like.dtype)
    if pvalid is not None:
        # zero lanes of PADDING problems (unfilled segments of a partially
        # packed lane row): their zero inputs make the channel Cholesky
        # produce non-finite values, and the per-segment matmul reduction
        # in _dot would smear a NaN across every segment in the row
        # (NaN * 0 = NaN under the lane contraction)
        valid = valid * pvalid
    vb = valid > 0.5
    lane0 = lane == 0
    notlast = (lane < N - 1).astype(like.dtype)

    def mat(c):
        return _mat(c, like)

    def sf(c):
        return _shift_fwd(mat(c), seg)

    def sb(c):
        return None if c is None else _shift_back(mat(c), seg)

    # ---- KKT channels; terminal-knot cost via the per-lane tracking weight
    w_track = jnp.where(lane == N - 1, cp.N_cost, cp.q_cost)
    xn = [sb(X[i]) for i in range(nx)]
    A_ch, B_ch, c_ch, Q_ch, qv, R_diag, rv = kkt_knot_channels_structured(
        cd, key, cp, X[:nq], X[nq:], U, xn, r3, fe, dt, integrator_type,
        like, w_track=w_track)

    # ---- Schur condensation (ops/schur.py::build_schur on channels) ----
    # Q~^-1 exploiting block structure: dense rank-2 qq block (+ rho I, the
    # half-diagonal quirk: the qd diagonal gets NO rho), diagonal qd block.
    Qqq = [[chadd(Q_ch[i][j], rho if i == j else None) for j in range(nq)]
           for i in range(nq)]
    inv_qq = ch_chol_inv_n(Qqq, nq)
    inv_dq = [1.0 / Q_ch[nq + i][nq + i] for i in range(nq)]
    Rinv = [1.0 / R_diag[i] for i in range(nu)]

    def qinv_entry(r, c):
        if r < nq and c < nq:
            return inv_qq[r][c]
        if r == c:
            return inv_dq[r - nq]
        return None

    # phi = A @ Qinv (structure-aware: right factor block-diag)
    phi = [[None] * nx for _ in range(nx)]
    for r in range(nx):
        for c in range(nq):
            phi[r][c] = chsum([chmul(A_ch[r][j], inv_qq[j][c])
                               for j in range(nq)])
        for c in range(nq, nx):
            phi[r][c] = chmul(A_ch[r][c], inv_dq[c - nq])

    BRinv = [[chmul(B_ch[r][c], Rinv[c]) for c in range(nu)]
             for r in range(nx)]

    # theta_k = phi A^T + B Rinv B^T + Qinv_{k+1}   (symmetric)
    inv_qq_n = [[sb(inv_qq[i][j]) for j in range(nq)] for i in range(nq)]
    inv_dq_n = [sb(inv_dq[i]) for i in range(nq)]
    theta = [[None] * nx for _ in range(nx)]
    for r in range(nx):
        for s in range(r, nx):
            t = chsum([chmul(phi[r][c], A_ch[s][c]) for c in range(nx)])
            t = chadd(t, chsum([chmul(BRinv[r][c], B_ch[s][c])
                                for c in range(nu)]))
            if r < nq and s < nq:
                t = chadd(t, inv_qq_n[r][s])
            elif r == s:
                t = chadd(t, inv_dq_n[r - nq])
            theta[r][s] = theta[s][r] = t

    # S: main_0 = -Qinv_0, main_{k+1} = -theta_k, lower_{k+1,k} = phi_k
    S_main = []
    for r in range(nx):
        for c in range(nx):
            S_main.append(-jnp.where(lane0, mat(qinv_entry(r, c)),
                                     sf(theta[r][c])))
    S_lower = [mat(phi[r][c]) for r in range(nx) for c in range(nx)]

    # gamma_0 = c_0 - Qinv_0 q_0; gamma_{k+1} = c_{k+1} + phi_k q_k
    #           + B R^-1 r_k - Qinv_{k+1} q_{k+1}
    gamma = []
    for r in range(nx):
        c_sch = jnp.where(lane0, mat(X[r]) - mat(xs[r]), sf(c_ch[r]))
        if r < nq:
            qq = chsum([chmul(inv_qq[r][c], qv[c]) for c in range(nq)])
        else:
            qq = chmul(inv_dq[r - nq], qv[r])
        t = chadd(chsum([chmul(phi[r][c], qv[c]) for c in range(nx)]),
                  chsum([chmul(BRinv[r][c], rv[c]) for c in range(nu)]))
        # zero outside real knots: pcg_channels relies on r/p staying zero
        # on padding lanes (lane shifts pull lane N into lane N-1)
        gamma.append(jnp.where(vb, c_sch - mat(qq) + sf(t), 0.0))

    # SS preconditioner: P_main_0 = -Qr_0 (NOT its inverse — preserved
    # reference quirk, schur_linsys.cuh:150-164), P_main_{k+1} =
    # -(theta_k + rho I~)^-1, P_lower = -(P_main_{k+1} phi_k P_main_k)
    theta_r = [[chadd(theta[r][s], rho if (r == s and r < nq) else None)
                for s in range(nx)] for r in range(nx)]
    thetainv = ch_chol_inv_n(theta_r, nx)

    def qr0_entry(r, c):
        if r < nq and c < nq:
            return chadd(Q_ch[r][c], rho if r == c else None)
        if r == c:
            return Q_ch[r][r]
        return None

    P_main = []
    for r in range(nx):
        for c in range(nx):
            P_main.append(-jnp.where(lane0, mat(qr0_entry(r, c)),
                                     sf(thetainv[r][c])))
    Pm = [[P_main[r * nx + c] for c in range(nx)] for r in range(nx)]
    Pn = [[sb(Pm[r][c]) for c in range(nx)] for r in range(nx)]
    P_lower = []
    for r in range(nx):
        T_r = [chsum([chmul(Pn[r][a], mat(phi[a][b])) for a in range(nx)])
               for b in range(nx)]
        for c in range(nx):
            P_lower.append(-mat(chsum([chmul(T_r[b], Pm[b][c])
                                       for b in range(nx)])))

    # ---- dual solve: the whole Krylov loop (ops/pallas_pcg.py) ----
    if pvalid is not None:
        # scrub padding-problem lanes (see the valid*pvalid note above);
        # jnp.where, not multiply — the false branch may hold NaN/inf
        S_main = [jnp.where(vb, c, 0.0) for c in S_main]
        S_lower = [jnp.where(vb, c, 0.0) for c in S_lower]
        P_main = [jnp.where(vb, c, 0.0) for c in P_main]
        P_lower = [jnp.where(vb, c, 0.0) for c in P_lower]
    lam_in = [mat(lam[i]) for i in range(nx)]
    lam_out, iters = pcg_channels(nx, max_pcg_iters, S_main, S_lower,
                                  P_main, P_lower, gamma, lam_in,
                                  eps, skip, valid, seg)

    # ---- dz recovery (ops/schur.py::compute_dz) ----
    lam_next = [_shift_back(lam_out[i], seg) for i in range(nx)]
    res_q = []
    for r in range(nx):
        atl = chsum([chmul(A_ch[i][r], lam_next[i]) for i in range(nx)])
        res_q.append(chadd(chsub(qv[r], lam_out[r]),
                           chmul(notlast, atl)))
    dzx = []
    for r in range(nx):
        if r < nq:
            v = chsum([chmul(inv_qq[r][c], res_q[c]) for c in range(nq)])
        else:
            v = chmul(inv_dq[r - nq], res_q[r])
        dzx.append(mat(chneg(v)))
    dzu = []
    for c in range(nu):
        btl = chsum([chmul(B_ch[r][c], lam_next[r]) for r in range(nx)])
        dzu.append(mat(chneg(chmul(Rinv[c], chadd(rv[c], btl)))))
    if pvalid is not None:
        # padding problems' all-zero inputs drive the channel Cholesky
        # non-finite ON THE REAL CHIP (TPU rsqrt(0); CPU interpret runs
        # happened to stay finite, which is how this escaped CI — caught by
        # tools/tpu_verify_kernels.py). Scrub with where, NOT multiply:
        # NaN * 0 = NaN, and any later per-segment matmul reduction
        # (pallas_solve._segsum) would smear one padding NaN across every
        # real problem in the lane row.
        dzx = [jnp.where(vb, d, 0.0) for d in dzx]
        dzu = [jnp.where(vb, d, 0.0) for d in dzu]
        lam_out = [jnp.where(vb, c, 0.0) for c in lam_out]
    if debug:
        dbg = dict(S_main=S_main, S_lower=S_lower, P_main=P_main,
                   P_lower=P_lower, gamma=gamma)
        return dzx, dzu, lam_out, [iters], dbg
    return dzx, dzu, lam_out, [iters]


def _iter_kernel(cd, key, nq, N, seg, B, max_pcg_iters, integrator_type,
                 body_fn, chans_ref, w_ref, out_ref):
    nx = 2 * nq
    nu = nq
    idx = 0

    def take(n):
        nonlocal idx
        out = [chans_ref[idx + i] for i in range(n)]
        idx += n
        return out

    X = take(nx)
    U = take(nu)
    xs = take(nx)
    r3 = take(3)
    fe = take(6)
    lam = take(nx)
    rho = take(1)[0]
    eps = take(1)[0]
    skip = take(1)[0]

    w = [w_ref[i, 0, 0] for i in range(8)]
    cp = CostParams(q_cost=w[0], qd_cost=w[1], u_cost=w[2], N_cost=w[3],
                    q_lim_cost=w[4], vel_lim_cost=w[5], ctrl_lim_cost=w[6])
    dt = w[7]

    # lanes of problems beyond B (padding of the last chunk / lane row)
    G = X[0].shape[1] // seg
    p_idx = (pl.program_id(0) * (X[0].shape[0] * G)
             + jax.lax.broadcasted_iota(jnp.int32, X[0].shape, 0) * G
             + jax.lax.broadcasted_iota(jnp.int32, X[0].shape, 1) // seg)
    pvalid = (p_idx < B).astype(X[0].dtype)

    dzx, dzu, lam_out, iters = body_fn(
        cd, key, cp, N, max_pcg_iters, integrator_type, dt,
        X, U, xs, r3, fe, lam, rho, eps, skip, X[0], seg=seg, pvalid=pvalid)
    o = 0
    for ch in dzx + dzu + lam_out + iters:
        out_ref[o] = ch
        o += 1


def iter_capacity(N: int) -> int:
    """Problems per kernel grid step: 8 sublanes x (128 // segment)."""
    seg = next(s for s in (8, 16, 32, 64, 128) if s >= N)
    return 8 * (_LANES // seg)


def sqp_iter_pallas(model: RobotModel, cp: CostParams, X, U, x_s, ref, f_ext,
                    lam, rho, pcg_tol, skip, dt, max_pcg_iters: int,
                    integrator_type: int = 2, body_fn=None):
    """One fused SQP iteration core: KKT + Schur + PCG + dz in one kernel.
    X (B,N,nx), U (B,N-1,nu), x_s (B,nx), ref (B,N,>=3), f_ext (B,6),
    lam (B,N,nx), rho/pcg_tol (B,), skip (B,) bool.
    Returns (dZX, dZU, lam, pcg_iters).

    Layout: knots on lanes in segments of `seg` (the next power of two >= N,
    so short horizons pack 128//seg problems per lane row instead of wasting
    the padding lanes), 8 problems on sublanes, and a kernel grid over chunks
    of 8*(128//seg) problems for larger batches — each chunk's Krylov loop
    exits at its own convergence."""
    cd = _get_cd(model.key)
    nq = cd.nq
    nx, nu = 2 * nq, nq
    B, N = X.shape[0], X.shape[1]
    dtp = X.dtype
    seg = next(s for s in (8, 16, 32, 64, 128) if s >= N)
    G = _LANES // seg  # problems per lane row
    cap = 8 * G  # problems per grid step
    nchunk = -(-B // cap)
    Bp = nchunk * cap
    SR = nchunk * 8  # total sublane rows

    def chan(a):  # (B, N', k) -> (k, SR, 128): problem p -> row p//G,
        # lanes [(p%G)*seg, (p%G)*seg + N')
        k = a.shape[2]
        a = jnp.pad(a, ((0, Bp - B), (0, seg - a.shape[1]), (0, 0)))
        a = a.reshape(nchunk, 8, G, seg, k).transpose(4, 0, 1, 2, 3)
        return a.reshape(k, SR, _LANES)

    def bcast(a):  # (B, k) -> (k, SR, 128) constant over each segment
        return chan(jnp.broadcast_to(a[:, None, :], (B, 1, a.shape[1])
                                     ).repeat(seg, axis=1))

    chans = jnp.concatenate([
        chan(X), chan(U), bcast(x_s), chan(ref[:, :, :3]), bcast(f_ext),
        chan(lam),
        bcast(rho.astype(dtp)[:, None]),
        bcast(pcg_tol.astype(dtp)[:, None]),
        bcast(skip.astype(dtp)[:, None]),
    ], axis=0)
    C_in = chans.shape[0]

    w = jnp.stack([cp.q_cost, cp.qd_cost, cp.u_cost, cp.N_cost,
                   cp.q_lim_cost, cp.vel_lim_cost, cp.ctrl_lim_cost,
                   jnp.asarray(dt, dtp)]).astype(dtp).reshape(8, 1, 1)

    C_out = nx + nu + nx + 1
    kernel = functools.partial(_iter_kernel, cd, model.key, nq, N, seg, B,
                               max_pcg_iters, integrator_type,
                               body_fn or iter_channels)
    out = pl.pallas_call(
        kernel,
        grid=(nchunk,),
        in_specs=[pl.BlockSpec((C_in, 8, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 1, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((C_out, 8, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_out, SR, _LANES), dtp),
        interpret=_interpret(),
    )(chans, w)
    # (C, SR, 128) -> (C, Bp, seg) in problem order
    o = out.reshape(C_out, nchunk, 8, G, seg).reshape(C_out, Bp, seg)
    dZX = o[:nx, :B, :N].transpose(1, 2, 0)
    dZU = o[nx:nx + nu, :B, :N - 1].transpose(1, 2, 0)
    lam_o = o[nx + nu:nx + nu + nx, :B, :N].transpose(1, 2, 0)
    iters = o[C_out - 1, :B, 0].astype(jnp.int32)
    return dZX, dZU, lam_o, iters
