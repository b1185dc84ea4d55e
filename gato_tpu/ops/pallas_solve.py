"""Pallas TPU kernel: the ENTIRE batched SQP solve in one kernel program.

The final step of the persistent-kernel progression (pallas_pcg: the Krylov
loop; pallas_iter: one iteration's KKT+Schur+PCG+dz): here the SQP while
loop itself, the 8-alpha merit sweep, the line search and the rho adaptation
all run inside ONE Pallas program, so a whole multi-iteration solve costs a
single kernel launch with every intermediate in VMEM. This is the TPU answer
to the reference driver's per-iteration kernel sequence
(gato/bsqp/bsqp.cuh:103-197: setup_kkt -> schur -> pcg -> dz -> merit ->
line_search per iteration, plus computeMeritBatched up front at
bsqp.cuh:116) collapsed into the one-launch design its persistent PCG kernel
(gato/bsqp/kernels/pcg.cuh:13-148) hints at.

Layout matches ops/pallas_iter.py: knots on lanes in segments of `seg` (the
next power of two >= N, so short horizons pack 128//seg problems per lane
row), 8 problems on sublanes, grid over chunks of 8*(128//seg) problems.
Solver semantics (merit formula merit.cuh:16-92, line search + rho schedule
line_search.cuh:12-98, solve_ratio early exit bsqp.cuh:133-165) follow the
XLA path in solver/bsqp.py; parity is tested on plain arrays in
tests/test_pallas_solve.py.

Exit semantics: within one grid chunk (B <= solve_capacity(N), no mesh) the
one-launch kernel's solve_ratio exit is exactly the reference's whole-batch
exit. Beyond one chunk — or under shard_map, where the count must be psum'd
across chips — the solver routes to sqp_solve_pallas_chained: one launch per
SQP iteration with the convergence count reduced globally between launches
(the TPU-native analogue of the reference's per-iteration D2H + host check,
bsqp.cuh:133-165), so the exit decision is whole-batch at every scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dynamics.channelized import chadd, chsum
from ..robots.model import RobotModel
from .cost import CostParams
from .kkt_fast import _get_cd
from .merit_fast import _barrier_sum, _limits
from .pallas_iter import _LANES, _mat, iter_channels
from .pallas_pcg import _shift_back
from .schur import RHO_FACTOR, RHO_INIT, RHO_MAX, RHO_MIN


def _interpret():
    return jax.default_backend() != "tpu"


def _segsum(x, seg):
    """Per-segment sum over lanes, broadcast back: (S, L) -> (S, L).

    One f32 matmul with the block-diagonal ones matrix (Precision.HIGHEST —
    the TPU bf16 dot_general default would corrupt merit comparisons).

    NaN containment: NaN * 0 = NaN in the contraction would smear one
    problem's non-finite values (a diverged step's merit) across every
    problem sharing the sublane row; clamp per-lane values to a huge finite
    sentinel first, so the diverged problem's sum stays enormous (never wins
    a line search) and its row-mates stay exact."""
    x = jnp.where(jnp.abs(x) <= 1e30, x, 1e30)
    L = x.shape[1]
    if seg == L:
        s = jnp.sum(x, axis=1, keepdims=True)
        return jnp.broadcast_to(s, x.shape)
    i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    segmat = (i // seg == j // seg).astype(x.dtype)
    return jax.lax.dot_general(x, segmat, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=x.dtype)


def merit_channels(cd, key, cp: CostParams, N: int, dt, integrator_type: int,
                   X, U, xs, r3, fe, mu, lane, pvalid, seg, like):
    """Merit of one candidate trajectory on (S, L) channels: per-problem
    scalar broadcast over each segment's lanes.

    Same formula as ops/merit_fast.py (_knot_terms + _terminal_cost + the
    initial-state violation), i.e. the reference's computeMeritBatched
    (merit.cuh:16-92), but with the terminal knot folded in via a per-lane
    tracking weight and the knot sum as one per-segment reduction."""
    nq = cd.nq
    nx = 2 * nq
    (jlo, jhi), (vlo, vhi), (clo, chi) = _limits(key)
    last = lane == N - 1

    q = [X[i] for i in range(nq)]
    qd = [X[nq + i] for i in range(nq)]
    cs = [jnp.cos(x) for x in q]
    ss = [jnp.sin(x) for x in q]

    p_ee, _, _ = cd.fk_ee(cs, ss)
    err2 = chsum([(_mat(p_ee[k], like) - r3[k]) ** 2 for k in range(3)])
    w_track = jnp.where(last, cp.N_cost, cp.q_cost)
    cost = 0.5 * w_track * _mat(err2, like)
    cost = cost + 0.5 * cp.qd_cost * _mat(chsum([v * v for v in qd]), like)
    cost = cost + cp.q_lim_cost * _mat(_barrier_sum(q, jlo, jhi), like)
    cost = cost + cp.vel_lim_cost * _mat(_barrier_sum(qd, vlo, vhi), like)
    # control terms exist on non-terminal knots only (merit.cuh:52-60)
    ucost = (0.5 * cp.u_cost * _mat(chsum([u * u for u in U]), like)
             + cp.ctrl_lim_cost * _mat(_barrier_sum(U, clo, chi), like))

    qdd = cd.fd(cs, ss, qd, U, f_ext=fe)
    defect = None
    for i in range(nq):
        qdd_i = _mat(qdd[i], like)
        if integrator_type == 0:
            q_n = q[i] + dt * qd[i]
            qd_n = qd[i] + dt * qdd_i
        elif integrator_type == 1:
            qd_n = qd[i] + dt * qdd_i
            q_n = q[i] + dt * qd_n
        else:
            qd_n = qd[i] + dt * qdd_i
            q_n = q[i] + dt * qd[i] + (0.5 * dt * dt) * qdd_i
        defect = chadd(defect, jnp.abs(_shift_back(X[i], seg) - q_n))
        defect = chadd(defect, jnp.abs(_shift_back(X[nq + i], seg) - qd_n))

    init_viol = chsum([jnp.abs(X[i] - xs[i]) for i in range(nx)])

    knot = jnp.where(last, cost, cost + ucost)
    knot = jnp.where(lane < N, knot, 0.0)
    pen = (jnp.where(lane < N - 1, _mat(defect, like), 0.0)
           + jnp.where(lane == 0, _mat(init_viol, like), 0.0))
    # where, not *: a non-finite knot/pen on a padding lane would survive a
    # multiply-by-zero and _segsum's lane matmul smears it across the row
    return _segsum(jnp.where(pvalid > 0.5, knot + mu * pen, 0.0), seg)


def solve_channels(cd, key, cp: CostParams, N: int, B: int,
                   max_sqp_iters: int, max_pcg_iters: int, num_alphas: int,
                   integrator_type: int, adapt_rho: bool, solve_ratio: float,
                   dt, X, U, xs, r3, fe, lam, rho, drho, mu, eps,
                   seg, pvalid, like, unroll: bool = False,
                   mbase0=None, merit00=None, conv0=None, sqp0=None,
                   seeded: bool = False):
    """The full SQP solve on (S, L) channels (the body of the one-kernel
    solve; pure jnp, parity-tested on plain arrays).

    X: nx channels, U: nu, xs: nx (constant over segment lanes), r3: 3,
    fe: 6, lam: nx, rho/drho/mu/eps: per-problem channels constant over
    segment lanes; pvalid: 0/1 mask of real (non-padding) problems.
    Returns (X nx, U nu, lam nx, rho, drho, converged, merit0, merit_final,
    sqp_iters (per-problem: the iteration at which the problem converged,
    or iterations run), pcg_it[max_sqp_iters], ls_merit[...], ls_step[...])
    channels.

    Chained mode (the multi-chunk / multi-chip global-exit driver,
    sqp_solve_pallas_chained): mbase0/merit00/conv0/sqp0 carry the SQP state
    from the previous per-iteration launch, and `seeded` (static) marks that
    mbase0/merit00 already hold the baseline merit — without it the first
    internal iteration seeds them from the alpha=0 merit block.
    """
    nq = cd.nq
    nx, nu = 2 * nq, nq
    lane = jax.lax.broadcasted_iota(jnp.int32, like.shape, 1) % seg
    lane0f = (lane == 0).astype(like.dtype) * pvalid
    # alpha_j = 2^-j (merit.cuh:40) plus a leading alpha=0 block: one merit
    # evaluation per (alpha, problem), alphas stacked on the SUBLANE axis so
    # the whole sweep is ONE pipeline trace over (A+1)*S sublanes — tracing
    # it per alpha instead multiplies the loop-body program size ~9x, which
    # blows up both the XLA-CPU and Mosaic compiles. The alpha=0 block is
    # merit(X, U) itself: it seeds the baseline at iteration 0 (the XLA
    # path's fold_merit0 trick, solver/bsqp.py) for free.
    alphas = [0.0] + [0.5 ** j for j in range(num_alphas)]
    A1 = len(alphas)
    S = like.shape[0]

    X = [_mat(c, like) for c in X]
    U = [_mat(c, like) for c in U]
    lam = [_mat(c, like) for c in lam]

    def tile_a(c):
        return jnp.concatenate([c] * A1, axis=0)

    like_a = tile_a(like)
    lane_a = jax.lax.broadcasted_iota(jnp.int32, like_a.shape, 1) % seg
    xs_a = [tile_a(c) for c in xs]
    r3_a = [tile_a(c) for c in r3]
    fe_a = [tile_a(c) for c in fe]
    mu_a = tile_a(_mat(mu, like))
    pv_a = tile_a(pvalid)

    def merit_sweep(X, U, dzx, dzu):
        """(A+1)*S-sublane merit: block a holds merit(X + alphas[a] dz).

        Block 0 (alpha = 0) is built from X directly, NOT X + 0*dz: it seeds
        the baseline merit, and 0 * NaN = NaN from a diverged step would
        turn the baseline (and so initial/final merit) non-finite."""
        Xc = [jnp.concatenate([X[i]] + [X[i] + a * dzx[i]
                                        for a in alphas[1:]], axis=0)
              for i in range(nx)]
        Uc = [jnp.concatenate([U[i]] + [U[i] + a * dzu[i]
                                        for a in alphas[1:]], axis=0)
              for i in range(nu)]
        m = merit_channels(cd, key, cp, N, dt, integrator_type, Xc, Uc,
                           xs_a, r3_a, fe_a, mu_a, lane_a, pv_a, seg,
                           like_a)
        return [jax.lax.slice_in_dim(m, a * S, (a + 1) * S, axis=0)
                for a in range(A1)]

    zero = jnp.zeros_like(like)
    st0 = dict(
        X=tuple(X), U=tuple(U), lam=tuple(lam), rho=rho, drho=drho,
        mbase=zero if mbase0 is None else mbase0,
        merit0=zero if merit00 is None else merit00,
        converged=zero if conv0 is None else conv0,
        sqp=zero if sqp0 is None else sqp0,
        pcg=(zero,) * max_sqp_iters, lsm=(zero,) * max_sqp_iters,
        lss=(zero,) * max_sqp_iters,
        it=jnp.int32(0), exit=jnp.int32(0),
    )

    def cond(s):
        return jnp.logical_and(s["it"] < max_sqp_iters, s["exit"] == 0)

    def body(s):
        X, U, lam = list(s["X"]), list(s["U"]), list(s["lam"])
        rho, drho = s["rho"], s["drho"]
        it = s["it"]

        dzx, dzu, lam, pcg_it = iter_channels(
            cd, key, cp, N, max_pcg_iters, integrator_type, dt,
            X, U, xs, r3, fe, lam, rho, eps, s["converged"], like,
            seg=seg, pvalid=pvalid)
        pcg_it = pcg_it[0]
        # padding problems produce garbage steps (non-finite on the real
        # chip); zero them so their trajectories stay at the (finite) zero
        # point across iterations. iter_channels already where-scrubs its
        # outputs; keep this as a where (NaN * 0 = NaN) for defense in depth.
        pv = pvalid > 0.5
        dzx = [jnp.where(pv, d, 0.0) for d in dzx]
        dzu = [jnp.where(pv, d, 0.0) for d in dzu]
        # REAL problems whose PCG diverged also hold NaN/inf steps: zero the
        # whole problem's step (per-problem decision — the 0/1 badness lanes
        # are finite, so the segment reduction cannot smear). All its alpha
        # candidates then equal X, the strict-less test fails, and the
        # trajectory stays untouched, matching the XLA path's step_ok scrub
        # (solver/bsqp.py::after_solve).
        badlane = None
        for d in dzx + dzu:
            badlane = d if badlane is None else badlane + d
        badlane = 1.0 - (jnp.abs(badlane) < jnp.inf).astype(like.dtype)
        step_ok = _segsum(jnp.where(pv, badlane, 0.0), seg) < 0.5
        dzx = [jnp.where(step_ok, d, 0.0) for d in dzx]
        dzu = [jnp.where(step_ok, d, 0.0) for d in dzu]

        # per-problem iteration count: +1 while not yet converged, including
        # the converging iteration (solver/bsqp.py per-lane sqp_iters note)
        sqp = jnp.where(s["converged"] > 0.5, s["sqp"], s["sqp"] + 1.0)
        converged = jnp.maximum(s["converged"],
                                (pcg_it == 0).astype(like.dtype))
        solved = jnp.sum(converged * lane0f)
        exit_now = solved >= B * solve_ratio  # scalar (one grid chunk)
        pcg = tuple(jnp.where(it == i, pcg_it, s["pcg"][i])
                    for i in range(max_sqp_iters))

        # ---- merit sweep + line search (computed on the exiting iteration
        # too, then discarded — matching the XLA path's lax.cond skip
        # without a Mosaic scf.if over the full state) ----
        ms = merit_sweep(X, U, dzx, dzu)
        # block 0 is merit(X, U): the warm-start baseline at iteration 0
        # (computeMeritBatched<1>, bsqp.cuh:116); in chained mode the carried
        # baseline is already seeded by the first launch
        if seeded:
            mbase, merit0 = s["mbase"], s["merit0"]
        else:
            mbase = jnp.where(it == 0, ms[0], s["mbase"])
            merit0 = jnp.where(it == 0, ms[0], s["merit0"])
        best = ms[1]
        besta = jnp.full_like(like, alphas[1])
        for j in range(2, A1):
            lt = ms[j] < best  # strict: first minimum wins on ties
            best = jnp.where(lt, ms[j], best)
            besta = jnp.where(lt, alphas[j], besta)
        success = best < mbase

        # rho schedule (line_search.cuh:61-80, settings.h:18-21)
        if adapt_rho:
            mult = jnp.where(
                success,
                jnp.minimum(drho / RHO_FACTOR, 1.0 / RHO_FACTOR),
                jnp.maximum(drho * RHO_FACTOR, RHO_FACTOR))
            drho_n = mult
            rho_n = jnp.clip(rho * mult, RHO_MIN, RHO_MAX)
        else:
            rho_n, drho_n = rho, drho
        rho_n = jnp.where(jnp.logical_and(~success, rho_n > RHO_MAX),
                          RHO_INIT, rho_n)

        m_n = jnp.where(success, best, mbase)
        step = jnp.where(success, besta, -1.0)

        ex = exit_now  # scalar: discard the line search on early exit
        # where-select, NOT X + 0*dz, on BOTH the early-exit scalar and the
        # per-problem success mask: a rejected step must leave the
        # trajectory untouched (line_search.cuh:90-97) even when dz is
        # non-finite (0 * NaN = NaN would contaminate it)
        take = jnp.logical_and(success, jnp.logical_not(ex))
        Xo = tuple(jnp.where(take, X[i] + besta * dzx[i], X[i])
                   for i in range(nx))
        Uo = tuple(jnp.where(take, U[i] + besta * dzu[i], U[i])
                   for i in range(nu))
        return dict(
            X=Xo, U=Uo, lam=tuple(lam),
            rho=jnp.where(ex, rho, rho_n),
            drho=jnp.where(ex, drho, drho_n),
            mbase=jnp.where(ex, mbase, m_n), merit0=merit0,
            converged=converged, sqp=sqp, pcg=pcg,
            lsm=tuple(jnp.where(jnp.logical_and(it == i, ~ex), m_n,
                                s["lsm"][i]) for i in range(max_sqp_iters)),
            lss=tuple(jnp.where(jnp.logical_and(it == i, ~ex), step,
                                s["lss"][i]) for i in range(max_sqp_iters)),
            it=it + 1, exit=ex.astype(jnp.int32),
        )

    if max_sqp_iters == 1:
        s = body(st0)  # unrolled: no loop machinery (benchmark default)
    elif unroll:
        # python-unrolled loop, exit latched by tree-select: identical
        # semantics to the while_loop (once exit is set, body effects are
        # discarded), but straight-line code — the while-wrapped body is a
        # single enormous compile unit that XLA-CPU (tests) chokes on, and
        # unrolling also spares Mosaic the 70+-channel loop carry
        s = st0
        for _ in range(max_sqp_iters):
            s_new = body(s)
            done = s["exit"] == 1
            s = jax.tree.map(lambda o, n: jnp.where(done, o, n), s, s_new)
    else:
        s = jax.lax.while_loop(cond, body, st0)

    # mbase IS merit(X, U) of the returned trajectory by induction (it is
    # updated to the accepted candidate's merit, or kept when X, U are kept)
    return (list(s["X"]) + list(s["U"]) + list(s["lam"])
            + [s["rho"], s["drho"], s["converged"], s["merit0"], s["mbase"],
               s["sqp"]]
            + list(s["pcg"]) + list(s["lsm"]) + list(s["lss"]))


def _solve_kernel(cd, key, nq, N, B, seg, max_sqp_iters, max_pcg_iters,
                  num_alphas, integrator_type, adapt_rho, solve_ratio,
                  unroll, seeded, body_fn, chans_ref, w_ref, out_ref):
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
    drho = take(1)[0]
    mu = take(1)[0]
    eps = take(1)[0]
    # carried SQP state for chained per-iteration launches (zeros, and
    # ignored via seeded=False, in one-launch mode)
    mbase0 = take(1)[0]
    merit00 = take(1)[0]
    conv0 = take(1)[0]
    sqp0 = take(1)[0]

    w = [w_ref[i, 0, 0] for i in range(8)]
    cp = CostParams(q_cost=w[0], qd_cost=w[1], u_cost=w[2], N_cost=w[3],
                    q_lim_cost=w[4], vel_lim_cost=w[5], ctrl_lim_cost=w[6])
    dt = w[7]

    # 0/1 mask of real problems (padding of the last chunk / lane row)
    G = X[0].shape[1] // seg
    p_idx = (pl.program_id(0) * (X[0].shape[0] * G)
             + jax.lax.broadcasted_iota(jnp.int32, X[0].shape, 0) * G
             + jax.lax.broadcasted_iota(jnp.int32, X[0].shape, 1) // seg)
    pvalid = (p_idx < B).astype(X[0].dtype)

    outs = body_fn(cd, key, cp, N, B, max_sqp_iters, max_pcg_iters,
                   num_alphas, integrator_type, adapt_rho, solve_ratio, dt,
                   X, U, xs, r3, fe, lam, rho, drho, mu, eps,
                   seg, pvalid, X[0], unroll=unroll,
                   mbase0=mbase0, merit00=merit00, conv0=conv0, sqp0=sqp0,
                   seeded=seeded)
    for o, ch in enumerate(outs):
        out_ref[o] = ch


def solve_capacity(N: int) -> int:
    """Problems per kernel grid step (== ops/pallas_iter.py::iter_capacity):
    8 sublanes x (128 // segment). At B <= this (and off-mesh), one launch
    carries the reference's whole-batch exit semantics exactly."""
    seg = next(s for s in (8, 16, 32, 64, 128) if s >= N)
    return 8 * (_LANES // seg)


def _layout(N: int, B: int):
    seg = next(s for s in (8, 16, 32, 64, 128) if s >= N)
    G = _LANES // seg
    cap = 8 * G
    nchunk = -(-B // cap)
    return seg, G, cap, nchunk, nchunk * cap, nchunk * 8


def _packers(B, seg, G, nchunk, Bp, SR):
    def chan(a):  # (B, N', k) -> (k, SR, 128), ops/pallas_iter.py layout
        k = a.shape[2]
        a = jnp.pad(a, ((0, Bp - B), (0, seg - a.shape[1]), (0, 0)))
        a = a.reshape(nchunk, 8, G, seg, k).transpose(4, 0, 1, 2, 3)
        return a.reshape(k, SR, _LANES)

    def bcast(a):  # (B, k) -> (k, SR, 128) constant over each segment
        return chan(jnp.broadcast_to(a[:, None, :], (B, 1, a.shape[1])
                                     ).repeat(seg, axis=1))

    return chan, bcast


def _launch(cd, key, nq, N, B, seg, nchunk, SR, max_sqp_iters, max_pcg_iters,
            num_alphas, integrator_type, adapt_rho, solve_ratio, unroll,
            seeded, body_fn, chans, w):
    """One pallas_call of the solve kernel over the chunked grid."""
    nx, nu = 2 * nq, nq
    C_in = chans.shape[0]
    C_out = nx + nu + nx + 6 + 3 * max_sqp_iters
    kernel = functools.partial(
        _solve_kernel, cd, key, nq, N, B, seg, max_sqp_iters,
        max_pcg_iters, num_alphas, integrator_type, adapt_rho, solve_ratio,
        unroll, seeded, body_fn or solve_channels)
    return pl.pallas_call(
        kernel,
        grid=(nchunk,),
        in_specs=[pl.BlockSpec((C_in, 8, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 1, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((C_out, 8, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_out, SR, _LANES), chans.dtype),
        interpret=_interpret(),
    )(chans, w)


def _cost_w(cp: CostParams, dt, dtp):
    return jnp.stack([cp.q_cost, cp.qd_cost, cp.u_cost, cp.N_cost,
                      cp.q_lim_cost, cp.vel_lim_cost, cp.ctrl_lim_cost,
                      jnp.asarray(dt, dtp)]).astype(dtp).reshape(8, 1, 1)


def sqp_solve_pallas(model: RobotModel, cp: CostParams, X, U, lam, x_s, ref,
                     f_ext, rho, drho, mu, pcg_tol, dt, N: int,
                     max_sqp_iters: int, max_pcg_iters: int,
                     num_alphas: int = 8, integrator_type: int = 2,
                     adapt_rho: bool = True, solve_ratio: float = 1.0,
                     unroll: bool | None = None, body_fn=None):
    """The whole batched SQP solve as ONE Pallas kernel launch.

    X (B,N,nx), U (B,N-1,nu), lam (B,N,nx), x_s (B,nx), ref (B,N,>=3),
    f_ext (B,6), rho/drho/mu/pcg_tol (B,). Returns
    (X, U, lam, rho, drho, converged, merit0, merit_final, sqp_iters (B,)
    per-lane, pcg_iters (max_sqp_iters, B), ls_merit (..., B),
    ls_step (..., B)).

    NOTE: with more than one grid chunk the solve_ratio early exit is
    evaluated per chunk, not over the whole batch — the solver only routes
    here when B fits one chunk (or forces "fused"); beyond that it uses
    sqp_solve_pallas_chained, which reproduces the reference's whole-batch
    exit (bsqp.cuh:141-165) with one launch per SQP iteration.
    """
    cd = _get_cd(model.key)
    nq = cd.nq
    nx, nu = 2 * nq, nq
    B = X.shape[0]
    dtp = X.dtype
    seg, G, cap, nchunk, Bp, SR = _layout(N, B)
    chan, bcast = _packers(B, seg, G, nchunk, Bp, SR)

    zero4 = jnp.zeros((4, SR, _LANES), dtp)  # mbase/merit0/conv/sqp carries
    chans = jnp.concatenate([
        chan(X), chan(U), bcast(x_s), chan(ref[:, :, :3]), bcast(f_ext),
        chan(lam),
        bcast(rho.astype(dtp)[:, None]), bcast(drho.astype(dtp)[:, None]),
        bcast(mu.astype(dtp)[:, None]), bcast(pcg_tol.astype(dtp)[:, None]),
        zero4,
    ], axis=0)

    w = _cost_w(cp, dt, dtp)
    if unroll is None:
        # straight-line code for short SQP schedules (no 70+-channel Mosaic
        # while carry); the while_loop for long ones (bounded program size)
        unroll = max_sqp_iters <= 4
    out = _launch(cd, model.key, nq, N, B, seg, nchunk, SR, max_sqp_iters,
                  max_pcg_iters, num_alphas, integrator_type, adapt_rho,
                  solve_ratio, unroll, False, body_fn, chans, w)

    # (C, SR, 128) -> (C, Bp, seg) in problem order
    C_out = out.shape[0]
    o = out.reshape(C_out, nchunk, 8, G, seg).reshape(C_out, Bp, seg)
    Xo = o[:nx, :B, :N].transpose(1, 2, 0)
    Uo = o[nx:nx + nu, :B, :N - 1].transpose(1, 2, 0)
    lam_o = o[nx + nu:2 * nx + nu, :B, :N].transpose(1, 2, 0)
    k = 2 * nx + nu
    rho_o, drho_o, conv, merit0, merit_f, iters_run = (
        o[k + i, :B, 0] for i in range(6))
    k += 6
    pcg_it = o[k:k + max_sqp_iters, :B, 0].astype(jnp.int32)
    k += max_sqp_iters
    ls_merit = o[k:k + max_sqp_iters, :B, 0]
    k += max_sqp_iters
    ls_step = o[k:k + max_sqp_iters, :B, 0]
    return (Xo, Uo, lam_o, rho_o, drho_o, conv, merit0, merit_f,
            iters_run, pcg_it, ls_merit, ls_step)


def sqp_solve_pallas_chained(model: RobotModel, cp: CostParams, X, U, lam,
                             x_s, ref, f_ext, rho, drho, mu, pcg_tol, dt,
                             N: int, max_sqp_iters: int, max_pcg_iters: int,
                             num_alphas: int = 8, integrator_type: int = 2,
                             adapt_rho: bool = True, solve_ratio: float = 1.0,
                             axis_name=None, body_fn=None):
    """The megakernel with the reference's WHOLE-BATCH exit semantics at any
    batch size and across chips: one kernel launch per SQP iteration inside
    a jitted lax.while_loop, with the solve_ratio convergence count reduced
    over all chunks (and psum'd over `axis_name` under shard_map) between
    launches — the TPU-native analogue of the reference's per-iteration
    D2H + host convergence check (bsqp.cuh:133-165).

    Each launch runs one full SQP iteration (KKT..dz, then merit + line
    search with the internal exit disabled); if the GLOBAL count crosses
    B_total * solve_ratio, the exiting iteration's line-search effects
    (X, U, rho, drho, baseline merit) are reverted — exactly the reference's
    break placement before the merit kernel. State stays in the packed
    channel layout across launches, so per-iteration overhead is one kernel
    dispatch + a few where-selects. Same return contract as
    sqp_solve_pallas.
    """
    cd = _get_cd(model.key)
    nq = cd.nq
    nx, nu = 2 * nq, nq
    B = X.shape[0]
    dtp = X.dtype
    seg, G, cap, nchunk, Bp, SR = _layout(N, B)
    chan, bcast = _packers(B, seg, G, nchunk, Bp, SR)

    # static mask of each real problem's lane-0 position (for the global
    # converged count straight off the conv channel, no unpack)
    import numpy as _np
    np_mask = _np.zeros((SR, _LANES), _np.float32)
    for p in range(B):
        r, g = divmod(p, G)
        np_mask[r, g * seg] = 1.0
    m0 = jnp.asarray(np_mask, dtp)

    const = jnp.concatenate([
        bcast(x_s), chan(ref[:, :, :3]), bcast(f_ext),
    ], axis=0)
    hp_ch = jnp.concatenate([
        bcast(mu.astype(dtp)[:, None]), bcast(pcg_tol.astype(dtp)[:, None]),
    ], axis=0)
    w = _cost_w(cp, dt, dtp)

    carry0 = dict(
        X=chan(X), U=chan(U), lam=chan(lam),
        rho=bcast(rho.astype(dtp)[:, None]),
        drho=bcast(drho.astype(dtp)[:, None]),
        state=jnp.zeros((4, SR, _LANES), dtp),  # mbase, merit0, conv, sqp
    )
    total_B = B if axis_name is None else B * jax.lax.psum(1, axis_name)
    thresh = total_B * solve_ratio

    def scalars(ch):  # per-problem (B,) off a (SR, 128) channel
        return ch.reshape(nchunk, 8, G, seg).reshape(Bp, seg)[:B, 0]

    def one_iter(carry, seeded):
        chans = jnp.concatenate([
            carry["X"], carry["U"], const, carry["lam"],
            carry["rho"], carry["drho"], hp_ch, carry["state"],
        ], axis=0)
        out = _launch(cd, model.key, nq, N, B, seg, nchunk, SR, 1,
                      max_pcg_iters, num_alphas, integrator_type, adapt_rho,
                      2.0,  # internal exit disabled: the host decides
                      True, seeded, body_fn, chans, w)
        k = 2 * nx + nu
        new = dict(
            X=out[:nx], U=out[nx:nx + nu], lam=out[nx + nu:k],
            rho=out[k:k + 1], drho=out[k + 1:k + 2],
            # conv, merit0, mbase, sqp channels -> carried state order
            state=jnp.stack([out[k + 4], out[k + 3], out[k + 2], out[k + 5]]),
        )
        num_solved = jnp.sum(out[k + 2] * m0)
        if axis_name is not None:
            # the one cross-chip collective per iteration: a scalar
            # AllReduce over ICI so every chip takes the SAME exit decision
            num_solved = jax.lax.psum(num_solved, axis_name)
        exit_now = num_solved >= thresh
        stats = dict(pcg=scalars(out[k + 6]).astype(jnp.int32),
                     lsm=scalars(out[k + 7]), lss=scalars(out[k + 8]))
        return new, exit_now, stats

    def select(carry, new, exit_now, it0: bool):
        """Exit fired on this iteration: revert the line-search effects
        (trajectory, rho schedule, baseline merit) but KEEP the dual update
        and the convergence flags — the reference breaks after PCG/dz,
        before the merit kernel (bsqp.cuh:165)."""
        keep_ls = jnp.logical_not(exit_now)

        def sel(a, b):
            return jnp.where(keep_ls, b, a)

        merged_state = new["state"]
        if it0:
            # exiting at iteration 0: the baseline/initial merit still
            # becomes merit(warm start) (the reference computed it up front,
            # bsqp.cuh:116); it is ms[0] == the launch's merit0 output
            mbase = jnp.where(keep_ls, new["state"][0], new["state"][1])
        else:
            mbase = jnp.where(keep_ls, new["state"][0], carry["state"][0])
        merged_state = merged_state.at[0].set(mbase)
        return dict(
            X=sel(carry["X"], new["X"]), U=sel(carry["U"], new["U"]),
            lam=new["lam"], rho=sel(carry["rho"], new["rho"]),
            drho=sel(carry["drho"], new["drho"]), state=merged_state,
        )

    zb = jnp.zeros((max_sqp_iters, B), dtp)
    pcg_all = jnp.zeros((max_sqp_iters, B), jnp.int32)
    lsm_all, lss_all = zb, zb

    # iteration 0: seeds the baseline merit from the alpha=0 block
    new, exit_now, st0 = one_iter(carry0, seeded=False)
    carry = select(carry0, new, exit_now, it0=True)
    pcg_all = pcg_all.at[0].set(st0["pcg"])
    keep = jnp.logical_not(exit_now)
    lsm_all = lsm_all.at[0].set(jnp.where(keep, st0["lsm"], 0.0))
    lss_all = lss_all.at[0].set(jnp.where(keep, st0["lss"], 0.0))
    it = jnp.int32(1)

    if max_sqp_iters > 1:
        def cond(s):
            return jnp.logical_and(s[0] < max_sqp_iters,
                                   jnp.logical_not(s[1]))

        def body(s):
            it, _, carry, pcg_all, lsm_all, lss_all = s
            new, exit_now, sti = one_iter(carry, seeded=True)
            carry = select(carry, new, exit_now, it0=False)
            pcg_all = pcg_all.at[it].set(sti["pcg"])
            keep = jnp.logical_not(exit_now)
            lsm_all = lsm_all.at[it].set(jnp.where(keep, sti["lsm"], 0.0))
            lss_all = lss_all.at[it].set(jnp.where(keep, sti["lss"], 0.0))
            return (it + 1, exit_now, carry, pcg_all, lsm_all, lss_all)

        it, exit_now, carry, pcg_all, lsm_all, lss_all = jax.lax.while_loop(
            cond, body, (it, exit_now, carry, pcg_all, lsm_all, lss_all))

    def unpk(ch_block, n_lanes):
        C = ch_block.shape[0]
        o = ch_block.reshape(C, nchunk, 8, G, seg).reshape(C, Bp, seg)
        return o[:, :B, :n_lanes].transpose(1, 2, 0)

    Xo = unpk(carry["X"], N)
    Uo = unpk(carry["U"], N - 1)
    lam_o = unpk(carry["lam"], N)
    rho_o = scalars(carry["rho"][0])
    drho_o = scalars(carry["drho"][0])
    mbase = scalars(carry["state"][0])
    merit0 = scalars(carry["state"][1])
    conv = scalars(carry["state"][2])
    sqp = scalars(carry["state"][3])
    return (Xo, Uo, lam_o, rho_o, drho_o, conv, merit0, mbase,
            sqp, pcg_all, lsm_all, lss_all)
