"""NaN robustness: a diverged PCG must never contaminate results.

Round-3 judge repro (VERDICT.md): with the multichip dryrun's own inputs at
B=16, a lane whose PCG diverges to NaN (lane 11) used to (a) contaminate its
"untouched" rejected trajectory via X + 0*dZ (0 * NaN = NaN), (b) report
kkt_converged=1 because the NaN entry residual yielded 0 PCG iterations, and
(c) WIN the best-lane argmin under numpy NaN semantics. The reference leaves
the trajectory genuinely untouched on line-search failure
(gato/bsqp/kernels/line_search.cuh:90-97) and its PCG exit test is False for
NaN so a dead lane burns max_iters and reads as unconverged (pcg.cuh:85-92).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gato_tpu.ops.cost import CostParams
from gato_tpu.ops.btd_solve import btd_solve_batched
from gato_tpu.ops.linesearch import line_search_update
from gato_tpu.ops.pcg import pcg_solve_batched
from gato_tpu.ops.schur import build_schur
from gato_tpu.ops.kkt import setup_kkt
from gato_tpu.parallel.sharding import best_lane
from gato_tpu.robots.model import load_robot
from gato_tpu.solver.bsqp import solve_batched_jit
from gato_tpu.solver.types import BSQPSettings, HyperParams


def _repro_problem():
    """Exactly dryrun_multichip's inputs at n_devices=2 (B=16, N=32, seed 0,
    max_sqp_iters=2, max_pcg_iters=25) — the round-3 judge's repro."""
    import __graft_entry__ as ge

    model = load_robot("indy7")
    N, B = 32, 16
    settings = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=25)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    rng = np.random.default_rng(0)
    hp = HyperParams(
        rho=jnp.asarray(rng.uniform(1e-3, 1e-1, B), jnp.float32),
        drho=jnp.ones(B, jnp.float32),
        mu=jnp.full(B, 10.0, jnp.float32),
        pcg_tol=jnp.full(B, 1e-4, jnp.float32),
    )
    X, U, lam, x_s, ref, _ = ge._problem(B, N, model)
    X = X + jnp.asarray(rng.uniform(-0.05, 0.05, X.shape), jnp.float32)
    X = X.at[:, 0, :].set(x_s)
    f_ext = jnp.asarray(rng.uniform(-5.0, 5.0, (B, 6)), jnp.float32)
    return model, settings, cp, hp, (X, U, lam, x_s, ref, f_ext)


def test_diverged_lane_stays_finite_and_unconverged():
    model, settings, cp, hp, args = _repro_problem()
    Xo, Uo, lam_o, hp_o, st = solve_batched_jit(
        model, settings, cp, hp, *args, jnp.float32(0.01))

    Xn = np.asarray(Xo)
    merit = np.asarray(st.final_merit)
    conv = np.asarray(st.kkt_converged)

    # (a) no NaN ever reaches the trajectory or the merit
    assert np.isfinite(Xn).all(), "rejected steps contaminated X with NaN"
    assert np.isfinite(np.asarray(Uo)).all()
    assert np.isfinite(merit).all(), "final merit has NaN lanes"

    # (b) lanes whose duals diverged (NaN lam is the reference-matching
    # residue of a blown-up Krylov solve) must be reported UNCONVERGED
    lam_bad = ~np.isfinite(np.asarray(lam_o)).all(axis=(1, 2))
    assert lam_bad.any(), (
        "repro no longer diverges — update the regression inputs")
    assert lam_bad[11], "the judge's repro diverged on lane 11"
    assert not conv[lam_bad].any(), (
        "a dead lane (non-finite duals) was reported kkt_converged")

    # lanes whose iteration-1 line search was rejected keep their
    # iteration-0 trajectory BITWISE (the reference's untouched-on-failure
    # semantics; X + 0*NaN would differ here)
    import dataclasses
    st1cfg = dataclasses.replace(settings, max_sqp_iters=1)
    X1, _, _, _, _ = solve_batched_jit(
        model, st1cfg, cp, hp, *args, jnp.float32(0.01))
    rejected = np.asarray(st.ls_step_size)[1] == -1.0
    assert (rejected & lam_bad).any()
    np.testing.assert_array_equal(Xn[rejected], np.asarray(X1)[rejected])

    # (c) best-lane selection never picks a dead lane
    b = int(best_lane(st.final_merit))
    assert not lam_bad[b]
    assert np.isfinite(merit[b])


def test_pcg_nan_warmstart_reports_max_iters():
    """Entering PCG with non-finite duals must report max_iters (the
    reference's burned-loop count), never 0 ('already converged')."""
    model = load_robot("indy7")
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    rng = np.random.default_rng(1)
    B, N = 4, 8
    X = jnp.asarray(rng.uniform(-0.3, 0.3, (B, N, 12)), jnp.float32)
    U = jnp.asarray(rng.uniform(-3, 3, (B, N - 1, 6)), jnp.float32)
    x_s = X[:, 0, :]
    ref = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 6)), jnp.float32)
    fe = jnp.zeros((B, 6), jnp.float32)
    kkt = jax.vmap(lambda X_, U_, xs_, r_, f_: setup_kkt(
        model, cp, X_, U_, xs_, r_, f_, 0.01, 2))(X, U, x_s, ref, fe)
    rho = jnp.full(B, 1e-2, jnp.float32)
    schur = jax.vmap(lambda k, r: build_schur(k, r, model.nq))(kkt, rho)

    lam0 = jnp.zeros((B, N, 12), jnp.float32)
    lam0 = lam0.at[1].set(jnp.nan)  # lane 1: diverged previous solve
    lam0 = lam0.at[2, 3, 4].set(jnp.inf)  # lane 2: one inf entry
    skip = jnp.zeros(B, bool)
    max_iters = 60

    lam, iters = pcg_solve_batched(
        schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
        schur.gamma, lam0, jnp.full(B, 1e-4, jnp.float32), max_iters, skip)
    it = np.asarray(iters)
    assert it[1] == max_iters and it[2] == max_iters
    # healthy lanes are unaffected and converge normally
    assert 0 < it[0] < max_iters and 0 < it[3] < max_iters
    assert np.isfinite(np.asarray(lam)[[0, 3]]).all()

    # skipped lanes still report 0 regardless of their duals
    lam_s, iters_s = pcg_solve_batched(
        schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
        schur.gamma, lam0, jnp.full(B, 1e-4, jnp.float32), max_iters,
        jnp.ones(B, bool))
    assert (np.asarray(iters_s) == 0).all()

    # the direct BTD solve RESCUES the lane instead (the factorization never
    # reads the warm start): finite duals, 1 "iteration", not converged
    lam_b, it_b = btd_solve_batched(
        schur.S_main, schur.S_lower, schur.gamma, lam0, skip)
    assert np.isfinite(np.asarray(lam_b)).all()
    assert (np.asarray(it_b) == 1).all()


def test_linesearch_rejected_step_untouched_by_nan():
    """A rejected step (all-NaN merits from a diverged dz) must leave the
    trajectory bitwise untouched (line_search.cuh:90-97)."""
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(-1, 1, (8, 12)), jnp.float32)
    U = jnp.asarray(rng.uniform(-1, 1, (7, 6)), jnp.float32)
    dZX = jnp.full_like(X, jnp.nan)
    dZU = jnp.full_like(U, jnp.inf)
    alphas = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    merits = jnp.full((3,), jnp.nan, jnp.float32)

    Xn, Un, m, step, rho, drho = line_search_update(
        merits, jnp.float32(5.0), alphas, X, U, dZX, dZU,
        jnp.float32(1e-3), jnp.float32(1.0), adapt_rho=True)
    np.testing.assert_array_equal(np.asarray(Xn), np.asarray(X))
    np.testing.assert_array_equal(np.asarray(Un), np.asarray(U))
    assert float(step) == -1.0
    assert float(m) == 5.0

    # a finite alpha still wins over NaN/inf alphas (masking, not poisoning)
    merits2 = jnp.asarray([jnp.nan, 4.0, jnp.inf], jnp.float32)
    dZX2 = jnp.ones_like(X)
    dZU2 = jnp.ones_like(U)
    Xn2, _, m2, step2, _, _ = line_search_update(
        merits2, jnp.float32(5.0), alphas, X, U, dZX2, dZU2,
        jnp.float32(1e-3), jnp.float32(1.0), adapt_rho=True)
    assert float(step2) == 0.5
    assert float(m2) == 4.0
    np.testing.assert_allclose(np.asarray(Xn2), np.asarray(X) + 0.5)


def test_pcg_channels_row_containment():
    """In the Pallas channel layout several problems share one sublane row
    and the per-segment dot reduction is a lane matmul where NaN * 0 = NaN:
    one diverged problem must NOT smear NaN into its row-mates' Krylov
    scalars (the _dot sentinel containment), and its own entry with NaN
    duals must report max_iters, not 0."""
    from gato_tpu.ops.pallas_pcg import pcg_channels

    nx, N, seg, L, S, G = 2, 8, 8, 16, 2, 2
    B = 4  # problems 0,1 share row 0; 2,3 share row 1
    rng = np.random.default_rng(5)

    main = np.zeros((B, N, nx, nx), np.float32)
    low = np.asarray(rng.uniform(-0.1, 0.1, (B, N - 1, nx, nx)), np.float32)
    for p in range(B):
        for k in range(N):
            a = rng.uniform(-0.3, 0.3, (nx, nx))
            main[p, k] = np.eye(nx) * 2.0 + 0.5 * (a + a.T)
    pm = np.linalg.inv(main)  # block-Jacobi preconditioner
    pl_ = np.zeros_like(low)
    gam = np.asarray(rng.uniform(-1, 1, (B, N, nx)), np.float32)
    lam0 = np.zeros((B, N, nx), np.float32)
    lam0[0] = np.nan  # problem 0: diverged previous solve
    eps = np.full(B, 1e-6, np.float32)
    skip = np.zeros(B, bool)
    max_iters = 50

    # XLA oracle: independent lanes, guard already verified above
    lam_x, it_x = pcg_solve_batched(
        jnp.asarray(main), jnp.asarray(low), jnp.asarray(pm),
        jnp.asarray(pl_), jnp.asarray(gam), jnp.asarray(lam0),
        jnp.asarray(eps), max_iters, jnp.asarray(skip))

    def pack(a, const=False):
        k = a.shape[-1]
        out = np.zeros((k, S, L), np.float32)
        for p in range(B):
            r, g = divmod(p, G)
            v = (a[p][None, :].repeat(seg, 0) if const
                 else a[p].reshape(a.shape[1], k))
            out[:, r, g * seg:g * seg + v.shape[0]] = v.T
        return [jnp.asarray(out[i]) for i in range(k)]

    valid = np.zeros((S, L), np.float32)
    valid[:, :] = 1.0  # every lane is a real knot (N == seg)
    lam_c, it_c = pcg_channels(
        nx, max_iters,
        pack(main.reshape(B, N, nx * nx)),
        pack(np.pad(low, ((0, 0), (0, 1), (0, 0), (0, 0))
                    ).reshape(B, N, nx * nx)),
        pack(pm.reshape(B, N, nx * nx)),
        pack(np.pad(pl_, ((0, 0), (0, 1), (0, 0), (0, 0))
                    ).reshape(B, N, nx * nx)),
        pack(gam), pack(lam0),
        pack(eps[:, None], const=True)[0],
        pack(skip.astype(np.float32)[:, None], const=True)[0],
        jnp.asarray(valid), seg=seg)

    def unpk(chs):
        a = np.stack([np.asarray(c) for c in chs], axis=-1)
        return np.stack([a[p // G, (p % G) * seg:(p % G) * seg + N]
                         for p in range(B)])

    lam_cc = unpk(lam_c)
    it_cc = np.array([np.asarray(it_c)[p // G, (p % G) * seg]
                      for p in range(B)]).astype(int)

    # dead problem: reported unconverged-at-max, never 0
    assert it_cc[0] == max_iters
    assert int(np.asarray(it_x)[0]) == max_iters
    # row-mate (problem 1) and the other row are EXACT vs the XLA oracle
    assert np.isfinite(lam_cc[1:]).all()
    np.testing.assert_allclose(lam_cc[1:], np.asarray(lam_x)[1:],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(it_cc[1:], np.asarray(it_x)[1:])
