"""Parity tests for the fused SQP-iteration kernel body (ops/pallas_iter.py).

The channel body is pure jnp, so it runs on plain (S, L) arrays on CPU —
the same pattern as tests/test_pallas_sim.py (interpret mode of the full
kernel is impractically slow; the wrapper's pack/unpack plumbing is covered
by test_wrapper_interpret_tiny below at a tiny shape).

Compared against the XLA pipeline setup_kkt -> build_schur ->
pcg_solve_batched -> compute_dz in float64 for tight tolerances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.ops.cost import CostParams
from gato_tpu.ops.kkt_fast import _get_cd, setup_kkt_batched
from gato_tpu.ops.schur import build_schur, compute_dz
from gato_tpu.ops.pcg import pcg_solve_batched
from gato_tpu.ops.pallas_iter import iter_channels, sqp_iter_pallas


B, N = 3, 12
S, L = 4, N + 5  # plain-array "tile": padding exercises the lane masks


@pytest.fixture(scope="module")
def setup64():
    model = load_robot("indy7", dtype=jnp.float64)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(-0.3, 0.3, (B, N, 12)))
    U = jnp.asarray(rng.uniform(-5, 5, (B, N - 1, 6)))
    x_s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)))
    ref = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 6)))
    fe = jnp.asarray(rng.uniform(-3, 3, (B, 6)).astype(np.float64))
    fe = fe.at[0].set(0.0)
    lam = jnp.asarray(rng.uniform(-0.1, 0.1, (B, N, 12)))
    rho = jnp.asarray([1e-3, 3e-2, 1e-1])
    tol = jnp.full((B,), 1e-12)
    return model, cp, X, U, x_s, ref, fe, lam, rho, tol


def _xla_pipeline(model, cp, X, U, x_s, ref, fe, lam, rho, tol, dt,
                  max_iters=500):
    # the channelized KKT setup (same linearization code as the kernel body)
    # isolates the new Schur/PCG/dz channel math; kkt_fast-vs-kkt parity is
    # covered by the solver tests
    kkt = setup_kkt_batched(model, cp, X, U, x_s, ref, fe, dt)
    schur = jax.vmap(lambda k, r: build_schur(k, r, model.nq))(kkt, rho)
    skip = jnp.zeros(B, dtype=bool)
    lam_o, iters = pcg_solve_batched(
        schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
        schur.gamma, lam, tol, max_iters, skip)
    return kkt, schur, lam_o, iters


def _to_chan(a):
    """(B, N', k) -> k channels of (S, L)."""
    k = a.shape[2]
    out = np.zeros((k, S, L), dtype=np.asarray(a).dtype)
    out[:, :B, :a.shape[1]] = np.asarray(a).transpose(2, 0, 1)
    return [jnp.asarray(out[i]) for i in range(k)]


def _bcast_chan(a):
    """(B, k) -> k channels of (S, L), constant over lanes."""
    k = a.shape[1]
    out = np.zeros((k, S, L), dtype=np.asarray(a).dtype)
    out[:, :B, :] = np.asarray(a).T[:, :, None]
    return [jnp.asarray(out[i]) for i in range(k)]


def _run_channels(model, cp, X, U, x_s, ref, fe, lam, rho, tol, dt,
                  max_iters=500):
    cd = _get_cd(model.key)
    like = _to_chan(X)[0]
    return iter_channels(
        cd, model.key, cp, N, max_iters, 2, jnp.asarray(dt, X.dtype),
        _to_chan(X), _to_chan(U), _bcast_chan(x_s), _to_chan(ref[:, :, :3]),
        _bcast_chan(fe), _to_chan(lam),
        _bcast_chan(rho[:, None])[0], _bcast_chan(tol[:, None])[0],
        jnp.zeros_like(like), like, debug=True)


def _unchan(chs, n_lanes):
    """list of (S, L) -> (B, n_lanes, C)."""
    a = np.stack([np.asarray(c) for c in chs], axis=-1)
    return a[:B, :n_lanes]


def test_iter_channels_match_xla_pipeline(setup64):
    model, cp, X, U, x_s, ref, fe, lam, rho, tol = setup64
    dt = 0.01
    kkt, schur, lam_x, iters_x = _xla_pipeline(
        model, cp, X, U, x_s, ref, fe, lam, rho, tol, dt)
    dzx_c, dzu_c, lam_c, iters_c, dbg = _run_channels(
        model, cp, X, U, x_s, ref, fe, lam, rho, tol, dt)

    nx = 12
    # Schur system parity (channel (r, c) at lane k == block entry [k, r, c])
    S_main_c = _unchan(dbg["S_main"], N).reshape(B, N, nx, nx)
    np.testing.assert_allclose(S_main_c, np.asarray(schur.S_main),
                               rtol=1e-9, atol=1e-9)
    S_low_c = _unchan(dbg["S_lower"], N - 1).reshape(B, N - 1, nx, nx)
    np.testing.assert_allclose(S_low_c, np.asarray(schur.S_lower),
                               rtol=1e-9, atol=1e-9)
    g_c = _unchan(dbg["gamma"], N)
    np.testing.assert_allclose(g_c, np.asarray(schur.gamma),
                               rtol=1e-9, atol=1e-9)
    P_main_c = _unchan(dbg["P_main"], N).reshape(B, N, nx, nx)
    np.testing.assert_allclose(P_main_c, np.asarray(schur.P_main),
                               rtol=1e-7, atol=1e-9)
    P_low_c = _unchan(dbg["P_lower"], N - 1).reshape(B, N - 1, nx, nx)
    np.testing.assert_allclose(P_low_c, np.asarray(schur.P_lower),
                               rtol=1e-7, atol=1e-9)

    # solution parity: both PCGs stop at the same tolerance but with
    # different fp summation orders, so iterates agree only to the
    # tolerance-implied level (~1e-5 here), not machine precision
    lam_cc = _unchan(lam_c, N)
    scale = max(1.0, np.abs(np.asarray(lam_x)).max())
    assert np.abs(lam_cc - np.asarray(lam_x)).max() / scale < 1e-4
    # dz isolation: recover dz from the CHANNEL lam with the XLA formulas,
    # so the comparison tests the dz channel math, not PCG path dependence
    dzx_x, dzu_x, _, _ = jax.vmap(compute_dz)(kkt, schur,
                                              jnp.asarray(lam_cc))
    dzx_cc = _unchan(dzx_c, N)
    dzu_cc = _unchan(dzu_c, N - 1)
    sx = max(1.0, np.abs(np.asarray(dzx_x)).max())
    assert np.abs(dzx_cc - np.asarray(dzx_x)).max() / sx < 1e-9
    su = max(1.0, np.abs(np.asarray(dzu_x)).max())
    assert np.abs(dzu_cc - np.asarray(dzu_x)).max() / su < 1e-9
    # same preconditioner -> near-identical iteration counts
    it_c = np.asarray(iters_c[0])[:B, 0].astype(int)
    assert np.abs(it_c - np.asarray(iters_x)).max() <= 2


def test_iter_channels_skip_lanes(setup64):
    """skip=1 lanes keep their warm-start duals and report 0 iterations."""
    model, cp, X, U, x_s, ref, fe, lam, rho, tol = setup64
    cd = _get_cd(model.key)
    like = _to_chan(X)[0]
    skip = np.zeros((S, L))
    skip[1, :] = 1.0
    dzx, dzu, lam_c, iters, _ = iter_channels(
        cd, model.key, cp, N, 500, 2, jnp.asarray(0.01, X.dtype),
        _to_chan(X), _to_chan(U), _bcast_chan(x_s), _to_chan(ref[:, :, :3]),
        _bcast_chan(fe), _to_chan(lam),
        _bcast_chan(rho[:, None])[0], _bcast_chan(tol[:, None])[0],
        jnp.asarray(skip), like, debug=True)
    lam_cc = _unchan(lam_c, N)
    np.testing.assert_allclose(lam_cc[1], np.asarray(lam[1]), atol=0)
    assert int(np.asarray(iters[0])[1, 0]) == 0
    assert int(np.asarray(iters[0])[0, 0]) > 0


def test_iter_channels_segmented_parity(setup64):
    """Segmented layout (several problems' knots packed back to back on one
    lane row, seg=16) must reproduce the XLA pipeline exactly like the
    full-row layout does: segment-masked shifts + per-segment dot reductions
    are the only different code paths."""
    model, cp, X, U, x_s, ref, fe, lam, rho, tol = setup64
    dt = 0.01
    seg, G = 16, 2  # problems 0,1 on row 0; problem 2 on row 1, L=32
    Ssub, Lseg = 2, seg * G

    def pack(a, const=False):
        k = a.shape[-1]
        out = np.zeros((k, Ssub, Lseg), dtype=np.asarray(a).dtype)
        for p in range(B):
            r, g = divmod(p, G)
            v = (np.asarray(a)[p][None, :].repeat(seg, 0) if const
                 else np.asarray(a)[p])
            out[:, r, g * seg:g * seg + v.shape[0]] = v.T
        return [jnp.asarray(out[i]) for i in range(k)]

    cd = _get_cd(model.key)
    like = pack(X)[0]
    dzx_c, dzu_c, lam_c, iters_c, dbg = iter_channels(
        cd, model.key, cp, N, 500, 2, jnp.asarray(dt, X.dtype),
        pack(X), pack(U), pack(x_s, const=True), pack(ref[:, :, :3]),
        pack(fe, const=True), pack(lam),
        pack(rho[:, None], const=True)[0], pack(tol[:, None], const=True)[0],
        jnp.zeros_like(like), like, seg=seg,
        pvalid=pack(np.ones((B, 1)), const=True)[0], debug=True)

    kkt, schur, lam_x, iters_x = _xla_pipeline(
        model, cp, X, U, x_s, ref, fe, lam, rho, tol, dt)

    def unpack(chs, n_lanes):
        a = np.stack([np.asarray(c) for c in chs], axis=-1)
        return np.stack([a[p // G, (p % G) * seg:(p % G) * seg + n_lanes]
                         for p in range(B)])

    nx = 12
    np.testing.assert_allclose(
        unpack(dbg["S_main"], N).reshape(B, N, nx, nx),
        np.asarray(schur.S_main), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        unpack(dbg["S_lower"], N - 1).reshape(B, N - 1, nx, nx),
        np.asarray(schur.S_lower), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(unpack(dbg["gamma"], N),
                               np.asarray(schur.gamma), rtol=1e-9, atol=1e-9)
    lam_cc = unpack(lam_c, N)
    scale = max(1.0, np.abs(np.asarray(lam_x)).max())
    assert np.abs(lam_cc - np.asarray(lam_x)).max() / scale < 1e-4
    dzx_x, dzu_x, _, _ = jax.vmap(compute_dz)(kkt, schur, jnp.asarray(lam_cc))
    sx = max(1.0, np.abs(np.asarray(dzx_x)).max())
    assert np.abs(unpack(dzx_c, N) - np.asarray(dzx_x)).max() / sx < 1e-9
    su = max(1.0, np.abs(np.asarray(dzu_x)).max())
    assert np.abs(unpack(dzu_c, N - 1) - np.asarray(dzu_x)).max() / su < 1e-9
    it_c = np.asarray(iters_c[0])
    it_cc = np.array([it_c[p // G, (p % G) * seg] for p in range(B)])
    assert np.abs(it_cc.astype(int) - np.asarray(iters_x)).max() <= 2


def test_wrapper_multichunk_plumbing(setup64):
    """B > one grid step's capacity: the chunked grid + segment packing must
    route every problem to the right (chunk, sublane, segment) and back."""
    model, *_ = setup64
    rng = np.random.default_rng(11)
    Bm, Nm = 70, 12  # seg=16, G=8, cap=64 -> 2 chunks
    f32 = jnp.float32
    X = jnp.asarray(rng.normal(size=(Bm, Nm, 12)), f32)
    U = jnp.asarray(rng.normal(size=(Bm, Nm - 1, 6)), f32)
    x_s = jnp.asarray(rng.normal(size=(Bm, 12)), f32)
    ref = jnp.asarray(rng.normal(size=(Bm, Nm, 6)), f32)
    fe = jnp.asarray(rng.normal(size=(Bm, 6)), f32)
    lam = jnp.asarray(rng.normal(size=(Bm, Nm, 12)), f32)
    rho = jnp.asarray(rng.uniform(1, 2, (Bm,)), f32)
    tol = jnp.asarray(rng.uniform(0, 1, (Bm,)), f32)
    cp32 = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                             N_cost=50.0, q_lim_cost=0.01)

    def echo_body(cd, key, cp_, N_, mpi, it, dt, Xc, Uc, xsc, r3c, fec,
                  lamc, rhoc, epsc, skipc, like, seg=None, pvalid=None):
        dzx = [Xc[i] + xsc[i] for i in range(12)]
        dzu = [Uc[i] + fec[i] for i in range(6)]
        lam_o = [lamc[i] + (r3c[i] if i < 3 else 0.0) for i in range(12)]
        return dzx, dzu, lam_o, [rhoc * 1000.0 + epsc]

    dZX, dZU, lam_o, iters = sqp_iter_pallas(
        model, cp32, X, U, x_s, ref, fe, lam, rho, tol,
        jnp.zeros(Bm, dtype=bool), jnp.float32(0.01),
        max_pcg_iters=3, body_fn=echo_body)
    np.testing.assert_array_equal(np.asarray(dZX),
                                  np.asarray(X + x_s[:, None, :]))
    np.testing.assert_array_equal(np.asarray(dZU),
                                  np.asarray(U + fe[:, None, :]))
    exp_lam = np.asarray(lam).copy()
    exp_lam[:, :, :3] += np.asarray(ref)[:, :, :3]
    np.testing.assert_array_equal(np.asarray(lam_o), exp_lam)
    np.testing.assert_array_equal(
        np.asarray(iters), np.asarray(rho * 1000.0 + tol, jnp.int32))


def test_wrapper_pack_unpack_plumbing(setup64):
    """The pack/BlockSpec/unpack plumbing of sqp_iter_pallas (VERDICT
    round-1 item 4: a broken BlockSpec must fail CI). Interpret mode of the
    full body is impractically slow on CPU, so inject an echo body that
    reflects the unpacked input channels back to the outputs — any channel
    misordering, padding slip, or transpose bug shows up as a mismatch."""
    model, cp, X, U, x_s, ref, fe, lam, rho, tol = setup64
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    cp32 = jax.tree.map(f32, cp)

    def echo_body(cd, key, cp_, N_, mpi, it, dt, Xc, Uc, xsc, r3c, fec,
                  lamc, rhoc, epsc, skipc, like, seg=None, pvalid=None):
        # dzx <- X + xs; dzu <- U + fe[:6]; lam <- lam + r3 (first 3 rows)
        dzx = [Xc[i] + xsc[i] for i in range(12)]
        dzu = [Uc[i] + fec[i] for i in range(6)]
        lam_o = [lamc[i] + (r3c[i] if i < 3 else 0.0) for i in range(12)]
        # distinct per-batch-row values -> catches sublane misalignment
        iters = rhoc * 1000.0 + epsc + skipc + dt
        return dzx, dzu, lam_o, [iters]

    dZX, dZU, lam_o, iters = sqp_iter_pallas(
        model, cp32, f32(X), f32(U), f32(x_s), f32(ref), f32(fe), f32(lam),
        f32(rho), f32(tol), jnp.zeros(B, dtype=bool), jnp.float32(0.01),
        max_pcg_iters=3, body_fn=echo_body)
    Xf, xsf = np.float32(np.asarray(X)), np.float32(np.asarray(x_s))
    Uf, fef = np.float32(np.asarray(U)), np.float32(np.asarray(fe))
    lamf, reff = np.float32(np.asarray(lam)), np.float32(np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(dZX), Xf + xsf[:, None, :])
    np.testing.assert_array_equal(np.asarray(dZU), Uf + fef[:, None, :])
    exp_lam = lamf.copy()
    exp_lam[:, :, :3] += reff[:, :, :3]
    np.testing.assert_array_equal(np.asarray(lam_o), exp_lam)
    exp_it = np.asarray(
        (f32(rho) * 1000.0 + f32(tol) + 0.0 + 0.01).astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(iters), exp_it)
