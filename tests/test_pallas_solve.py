"""Parity tests for the whole-solve kernel body (ops/pallas_solve.py).

Like tests/test_pallas_iter.py: the channel body is pure jnp, so it runs on
plain (S, L) arrays on CPU in float64 against the XLA solver path
(solver/bsqp.py::solve_batched); interpret mode of the full kernel is
impractically slow, so the wrapper's pack/BlockSpec/unpack plumbing is
covered by an echo-body test at the real shapes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.ops.cost import CostParams
from gato_tpu.ops.kkt_fast import _get_cd
from gato_tpu.ops.merit_fast import merit_alphas_batched
from gato_tpu.ops.pallas_solve import merit_channels, solve_channels, \
    sqp_solve_pallas
from gato_tpu.solver.bsqp import solve_batched_jit
from gato_tpu.solver.types import BSQPSettings, HyperParams


B, N = 3, 12
S, L = 4, N + 4  # plain-array "tile": row 3 and lanes >= N are padding


@pytest.fixture(scope="module")
def setup64():
    model = load_robot("indy7", dtype=jnp.float64)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(-0.3, 0.3, (B, N, 12)))
    U = jnp.asarray(rng.uniform(-5, 5, (B, N - 1, 6)))
    x_s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)))
    ref = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 6)))
    fe = jnp.asarray(rng.uniform(-3, 3, (B, 6)))
    lam = jnp.asarray(rng.uniform(-0.1, 0.1, (B, N, 12)))
    return model, cp, X, U, x_s, ref, fe, lam


def _to_chan(a):
    k = a.shape[2]
    out = np.zeros((k, S, L), dtype=np.asarray(a).dtype)
    out[:, :B, :a.shape[1]] = np.asarray(a).transpose(2, 0, 1)
    return [jnp.asarray(out[i]) for i in range(k)]


def _bcast_chan(a):
    k = a.shape[1]
    out = np.zeros((k, S, L), dtype=np.asarray(a).dtype)
    out[:, :B, :] = np.asarray(a).T[:, :, None]
    return [jnp.asarray(out[i]) for i in range(k)]


def _pvalid():
    pv = np.zeros((S, L))
    pv[:B, :] = 1.0
    return jnp.asarray(pv)


def test_merit_channels_matches_merit_fast(setup64):
    model, cp, X, U, x_s, ref, fe, lam = setup64
    cd = _get_cd(model.key)
    dt = 0.01
    mu = jnp.asarray([8.0, 10.0, 13.0])
    like = _to_chan(X)[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, like.shape, 1)
    m_c = merit_channels(
        cd, model.key, cp, N, jnp.asarray(dt, X.dtype), 2,
        _to_chan(X), _to_chan(U), _bcast_chan(x_s), _to_chan(ref[:, :, :3]),
        _bcast_chan(fe), _bcast_chan(mu[:, None])[0], lane, _pvalid(), L,
        like)
    one = jnp.ones((1,), X.dtype)
    m_x = merit_alphas_batched(model, cp, X, U, jnp.zeros_like(X),
                               jnp.zeros_like(U), x_s, ref, fe, mu, dt,
                               one, 2)[:, 0]
    np.testing.assert_allclose(np.asarray(m_c)[:B, 0], np.asarray(m_x),
                               rtol=1e-10)


def _run_solve_channels(model, cp, X, U, x_s, ref, fe, lam, hp,
                        max_sqp_iters, max_pcg_iters, solve_ratio=1.0):
    cd = _get_cd(model.key)
    like = _to_chan(X)[0]
    return solve_channels(
        cd, model.key, cp, N, B, max_sqp_iters, max_pcg_iters, 8, 2, True,
        solve_ratio, jnp.asarray(0.01, X.dtype),
        _to_chan(X), _to_chan(U), _bcast_chan(x_s), _to_chan(ref[:, :, :3]),
        _bcast_chan(fe), _to_chan(lam),
        _bcast_chan(hp.rho[:, None])[0], _bcast_chan(hp.drho[:, None])[0],
        _bcast_chan(hp.mu[:, None])[0], _bcast_chan(hp.pcg_tol[:, None])[0],
        L, _pvalid(), like, unroll=True)


@pytest.mark.parametrize("max_sqp_iters", [1, 3])
def test_solve_channels_matches_xla_solver(setup64, max_sqp_iters):
    """Full-solve channel body vs solver/bsqp.py in float64. PCG runs to a
    tight tolerance so the dual solves agree to roundoff and the line
    searches pick identical alphas."""
    model, cp, X, U, x_s, ref, fe, lam = setup64
    nx, nu = 12, 6
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-12,
                            dtype=jnp.float64)
    st = BSQPSettings(N=N, max_sqp_iters=max_sqp_iters, max_pcg_iters=500)
    Xo, Uo, lam_o, hpo, stats = solve_batched_jit(
        model, st, cp, hp, X, U, lam, x_s, ref, fe, jnp.float64(0.01))

    outs = _run_solve_channels(model, cp, X, U, x_s, ref, fe, lam, hp,
                               max_sqp_iters, 500)
    Xc = np.stack([np.asarray(c) for c in outs[:nx]], -1)[:B, :N]
    Uc = np.stack([np.asarray(c) for c in outs[nx:nx + nu]], -1)[:B, :N - 1]
    lam_c = np.stack([np.asarray(c)
                      for c in outs[nx + nu:2 * nx + nu]], -1)[:B, :N]
    k = 2 * nx + nu
    rho_c, _drho_c, conv_c, merit0_c, merit_f_c, iters_run_c = (
        np.asarray(outs[k + i])[:B, 0] for i in range(6))
    k += 6
    pcg_c = np.stack([np.asarray(outs[k + i])[:B, 0]
                      for i in range(max_sqp_iters)])
    k += max_sqp_iters
    lsm_c = np.stack([np.asarray(outs[k + i])[:B, 0]
                      for i in range(max_sqp_iters)])
    k += max_sqp_iters
    lss_c = np.stack([np.asarray(outs[k + i])[:B, 0]
                      for i in range(max_sqp_iters)])

    np.testing.assert_allclose(Xc, np.asarray(Xo), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(Uc, np.asarray(Uo), rtol=1e-6, atol=1e-6)
    scale = max(1.0, np.abs(np.asarray(lam_o)).max())
    assert np.abs(lam_c - np.asarray(lam_o)).max() / scale < 1e-6
    np.testing.assert_allclose(rho_c, np.asarray(hpo.rho), rtol=1e-12)
    np.testing.assert_allclose(merit0_c, np.asarray(stats.initial_merit),
                               rtol=1e-8)
    np.testing.assert_allclose(merit_f_c, np.asarray(stats.final_merit),
                               rtol=1e-8)
    np.testing.assert_array_equal(conv_c.astype(int),
                                  np.asarray(stats.kkt_converged))
    # per-lane sqp_iters channel (iteration at which the lane converged)
    np.testing.assert_array_equal(iters_run_c.astype(int),
                                  np.asarray(stats.sqp_iters))
    assert np.abs(pcg_c - np.asarray(stats.pcg_iters)).max() <= 2
    np.testing.assert_allclose(lsm_c, np.asarray(stats.ls_min_merit),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_array_equal(lss_c, np.asarray(stats.ls_step_size))


def test_solve_channels_nan_warmstart(setup64):
    """A problem entering the megakernel with NaN duals (diverged earlier
    solve) must come out with a finite, UNTOUCHED trajectory, a finite
    merit, kkt_converged=0 — and must match the XLA solver path, which
    handles the same case via pcg's dead-lane guard + the step_ok scrub."""
    model, cp, X, U, x_s, ref, fe, lam = setup64
    nx, nu = 12, 6
    lam = lam.at[0].set(jnp.nan)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-12,
                            dtype=jnp.float64)
    st = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=500)
    Xo, Uo, lam_o, hpo, stats = solve_batched_jit(
        model, st, cp, hp, X, U, lam, x_s, ref, fe, jnp.float64(0.01))

    outs = _run_solve_channels(model, cp, X, U, x_s, ref, fe, lam, hp,
                               2, 500)
    Xc = np.stack([np.asarray(c) for c in outs[:nx]], -1)[:B, :N]
    k = 2 * nx + nu
    conv_c = np.asarray(outs[k + 2])[:B, 0]
    merit_f_c = np.asarray(outs[k + 4])[:B, 0]
    pcg0_c = np.asarray(outs[k + 6])[:B, 0]

    # dead problem: finite untouched trajectory, finite merit, unconverged,
    # PCG reported the burned max count (the reference's pcg.cuh:85-92
    # behavior for a NaN exit test), on BOTH paths
    assert np.isfinite(Xc).all() and np.isfinite(merit_f_c).all()
    assert np.isfinite(np.asarray(Xo)).all()
    assert np.isfinite(np.asarray(stats.final_merit)).all()
    np.testing.assert_array_equal(Xc[0], np.asarray(X)[0])
    np.testing.assert_array_equal(np.asarray(Xo)[0], np.asarray(X)[0])
    assert conv_c[0] == 0 and np.asarray(stats.kkt_converged)[0] == 0
    assert pcg0_c[0] == 500 and np.asarray(stats.pcg_iters)[0, 0] == 500

    # healthy problems are bit-compatible with the XLA solver as usual
    np.testing.assert_allclose(Xc[1:], np.asarray(Xo)[1:],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(merit_f_c[1:],
                               np.asarray(stats.final_merit)[1:], rtol=1e-8)


def test_solve_channels_early_exit(setup64):
    """solve_ratio=0: the first iteration flags exit before the line search,
    so trajectories keep their warm start but duals update (the reference's
    break placement, bsqp.cuh:133-165)."""
    model, cp, X, U, x_s, ref, fe, lam = setup64
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-12,
                            dtype=jnp.float64)
    outs = _run_solve_channels(model, cp, X, U, x_s, ref, fe, lam, hp,
                               3, 500, solve_ratio=0.0)
    nx, nu = 12, 6
    Xc = np.stack([np.asarray(c) for c in outs[:nx]], -1)[:B, :N]
    np.testing.assert_allclose(Xc, np.asarray(X), atol=0)
    iters_run = np.asarray(outs[2 * nx + nu + 5])[:B, 0]
    np.testing.assert_array_equal(iters_run, np.ones(B))
    lam_c = np.stack([np.asarray(c)
                      for c in outs[nx + nu:2 * nx + nu]], -1)[:B, :N]
    assert np.abs(lam_c - np.asarray(lam)).max() > 1e-3


def test_wrapper_pack_unpack_plumbing(setup64):
    """Echo body at real segmented shapes: B=11, N=12 -> seg=16, G=8,
    cap=64, one chunk; every input must route to the right (sublane,
    segment) and every output slot back to the right problem."""
    model, *_ = setup64
    rng = np.random.default_rng(5)
    Bm, Nm = 11, N
    f32 = jnp.float32
    max_it = 2
    X = jnp.asarray(rng.normal(size=(Bm, Nm, 12)), f32)
    U = jnp.asarray(rng.normal(size=(Bm, Nm - 1, 6)), f32)
    lam = jnp.asarray(rng.normal(size=(Bm, Nm, 12)), f32)
    x_s = jnp.asarray(rng.normal(size=(Bm, 12)), f32)
    ref = jnp.asarray(rng.normal(size=(Bm, Nm, 6)), f32)
    fe = jnp.asarray(rng.normal(size=(Bm, 6)), f32)
    rho = jnp.asarray(rng.uniform(1, 2, (Bm,)), f32)
    drho = jnp.asarray(rng.uniform(1, 2, (Bm,)), f32)
    mu = jnp.asarray(rng.uniform(1, 2, (Bm,)), f32)
    tol = jnp.asarray(rng.uniform(0, 1, (Bm,)), f32)
    cp32 = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                             N_cost=50.0, q_lim_cost=0.01)

    def echo_body(cd, key, cp_, N_, B_, msi, mpi, na, it_, ar, sr, dt,
                  Xc, Uc, xsc, r3c, fec, lamc, rhoc, drhoc, muc, epsc,
                  seg, pvalid, like, unroll=False, mbase0=None, merit00=None,
                  conv0=None, sqp0=None, seeded=False):
        outs = ([Xc[i] + xsc[i] for i in range(12)]
                + [Uc[i] + fec[i] for i in range(6)]
                + [lamc[i] + (r3c[i] if i < 3 else 0.0) for i in range(12)]
                + [rhoc, drhoc, muc * pvalid, epsc, rhoc * muc,
                   jnp.full_like(like, float(seg))])
        outs += [rhoc + i for i in range(msi)]
        outs += [drhoc + i for i in range(msi)]
        outs += [epsc + i for i in range(msi)]
        return outs

    (Xo, Uo, lam_o, rho_o, drho_o, conv, merit0, merit_f, iters_run,
     pcg_it, lsm, lss) = sqp_solve_pallas(
        model, cp32, X, U, lam, x_s, ref, fe, rho, drho, mu, tol,
        jnp.float32(0.01), Nm, max_it, 3, body_fn=echo_body)
    np.testing.assert_array_equal(np.asarray(Xo),
                                  np.asarray(X + x_s[:, None, :]))
    np.testing.assert_array_equal(np.asarray(Uo),
                                  np.asarray(U + fe[:, None, :]))
    exp_lam = np.asarray(lam).copy()
    exp_lam[:, :, :3] += np.asarray(ref)[:, :, :3]
    np.testing.assert_array_equal(np.asarray(lam_o), exp_lam)
    np.testing.assert_array_equal(np.asarray(rho_o), np.asarray(rho))
    np.testing.assert_array_equal(np.asarray(drho_o), np.asarray(drho))
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(mu))
    np.testing.assert_array_equal(np.asarray(merit0), np.asarray(tol))
    np.testing.assert_array_equal(np.asarray(merit_f),
                                  np.asarray(rho * mu))
    np.testing.assert_array_equal(np.asarray(iters_run),
                                  np.full(Bm, 16.0, np.float32))
    for i in range(max_it):
        np.testing.assert_array_equal(np.asarray(pcg_it[i]),
                                      np.asarray(rho + i, jnp.int32))
        np.testing.assert_array_equal(np.asarray(lsm[i]),
                                      np.asarray(drho + i))
        np.testing.assert_array_equal(np.asarray(lss[i]),
                                      np.asarray(tol + i))


def test_solver_gate_solve_kernel(setup64, monkeypatch):
    """solve_kernel='fused' routes solve_batched through the megakernel and
    assembles HyperParams/SQPStats from its outputs. The real body in
    interpret mode is impractically slow on CPU (like the fused iteration
    kernel), so the kernel is stubbed here; body parity is pinned by the
    float64 channel tests above."""
    import gato_tpu.solver.bsqp as bsqp_mod
    model32 = load_robot("indy7")
    Bs, Ns, max_it = 2, 8, 3
    f32 = jnp.float32
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(Bs, rho=0.01, mu=10.0, pcg_tol=1e-6)
    X = jnp.zeros((Bs, Ns, 12), f32)
    U = jnp.zeros((Bs, Ns - 1, 6), f32)
    lam = jnp.zeros((Bs, Ns, 12), f32)
    ref = jnp.zeros((Bs, Ns, 6), f32)
    fe = jnp.zeros((Bs, 6), f32)
    calls = {}

    def stub(model, cp_, X_, U_, lam_, x_s, ref_, f_ext, rho, drho, mu,
             pcg_tol, dt, N_, msi, mpi, num_alphas=8, integrator_type=2,
             adapt_rho=True, solve_ratio=1.0, body_fn=None):
        calls.update(N=N_, msi=msi, mpi=mpi, ratio=solve_ratio)
        z = jnp.zeros((Bs,), f32)
        zi = jnp.zeros((msi, Bs), f32)
        return (X_ + 1.0, U_ + 2.0, lam_ + 3.0, rho * 5.0, drho, z + 1.0,
                z + 7.0, z + 8.0, z + float(msi), zi + 4.0, zi, zi - 1.0)

    monkeypatch.setattr(bsqp_mod, "sqp_solve_pallas", stub)
    st = BSQPSettings(N=Ns, max_sqp_iters=max_it, max_pcg_iters=20,
                      solve_kernel="fused", solve_ratio=0.5)
    Xo, Uo, lam_o, hpo, stats = bsqp_mod.solve_batched(
        model32, st, cp, hp, X, U, lam, X[:, 0], ref, fe, f32(0.01))
    assert calls == dict(N=Ns, msi=max_it, mpi=20, ratio=0.5)
    np.testing.assert_array_equal(np.asarray(Xo), np.asarray(X) + 1.0)
    np.testing.assert_array_equal(np.asarray(Uo), np.asarray(U) + 2.0)
    np.testing.assert_array_equal(np.asarray(lam_o), np.asarray(lam) + 3.0)
    np.testing.assert_allclose(np.asarray(hpo.rho), np.asarray(hp.rho) * 5.0)
    np.testing.assert_array_equal(np.asarray(hpo.drho), np.asarray(hp.drho))
    np.testing.assert_array_equal(np.asarray(stats.kkt_converged),
                                  np.ones(Bs, np.int32))
    np.testing.assert_array_equal(np.asarray(stats.initial_merit),
                                  np.full(Bs, 7.0, np.float32))
    np.testing.assert_array_equal(np.asarray(stats.final_merit),
                                  np.full(Bs, 8.0, np.float32))
    np.testing.assert_array_equal(np.asarray(stats.sqp_iters),
                                  np.full(Bs, max_it, np.int32))
    assert int(np.asarray(stats.num_iters_run)) == max_it
    np.testing.assert_array_equal(np.asarray(stats.pcg_iters),
                                  np.full((max_it, Bs), 4.0, np.int32))
