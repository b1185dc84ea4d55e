"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from gato_tpu.ops.cost import CostParams
from gato_tpu.parallel.sharding import (BATCH_AXIS, best_lane, make_mesh,
                                        shard_solve_args, solve_batched_sharded)
from gato_tpu.robots.model import load_robot
from gato_tpu.solver.bsqp import solve_batched_jit
from gato_tpu.solver.types import BSQPSettings, HyperParams


def _problem(B, N, model):
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    X = jnp.tile(x0, (B, N, 1))
    U = jnp.zeros((B, N - 1, model.nu), jnp.float32)
    lam = jnp.zeros((B, N, model.nx), jnp.float32)
    x_s = jnp.tile(x0, (B, 1))
    ref = jnp.tile(jnp.asarray([-0.3, 0.3, 0.95, 0, 0, 0], jnp.float32),
                   (B, N, 1))
    f_ext = jnp.zeros((B, 6), jnp.float32)
    return X, U, lam, x_s, ref, f_ext


def test_sharded_solve_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    model = load_robot("indy7")
    N, B = 8, 16
    st = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=25)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    args = _problem(B, N, model)
    dt = jnp.float32(0.01)

    X1, U1, lam1, hp1, st1 = solve_batched_jit(model, st, cp, hp, *args, dt)

    mesh = make_mesh(jax.devices()[:8])
    Xs, Us, lams, x_ss, refs, fes, hps = shard_solve_args(
        mesh, args[0], args[1], args[2], args[3], args[4], args[5], hp
    )
    X2, U2, lam2, hp2, st2 = solve_batched_sharded(
        model, st, cp, hps, Xs, Us, lams, x_ss, refs, fes, dt
    )
    assert np.isfinite(np.asarray(X2)).all()
    assert np.isfinite(np.asarray(st2.final_merit)).all()
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), rtol=2e-5,
                               atol=2e-5, equal_nan=False)
    np.testing.assert_allclose(np.asarray(st1.final_merit),
                               np.asarray(st2.final_merit), rtol=2e-5,
                               atol=2e-5, equal_nan=False)
    # output keeps the batch sharding
    shard_names = {d for s in X2.sharding.device_set for d in [s.id]}
    assert len(shard_names) == 8

    b = int(best_lane(st2.final_merit))
    assert 0 <= b < B


def test_sharded_equals_unsharded_realistic_shape():
    """Sharded-vs-unsharded equality at a realistic workload shape
    (N=32, B=128, 16 lanes per virtual device) with DISTINCT lanes:
    per-lane wrench hypotheses, perturbed warm starts, and per-lane rho.
    Multi-chip correctness as an equality property, not a finiteness
    check (SURVEY.md §2.3 multi-chip extension)."""
    assert len(jax.devices()) >= 8
    model = load_robot("indy7")
    N, B = 32, 128
    st = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=25)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    rng = np.random.default_rng(3)
    hp = HyperParams(
        rho=jnp.asarray(rng.uniform(1e-3, 1e-1, B), jnp.float32),
        drho=jnp.ones(B, jnp.float32),
        mu=jnp.full(B, 10.0, jnp.float32),
        pcg_tol=jnp.full(B, 1e-4, jnp.float32))
    X, U, lam, x_s, ref, _ = _problem(B, N, model)
    X = X + jnp.asarray(rng.uniform(-0.05, 0.05, X.shape), jnp.float32)
    X = X.at[:, 0, :].set(x_s)
    f_ext = jnp.asarray(rng.uniform(-5, 5, (B, 6)), jnp.float32)
    dt = jnp.float32(0.01)

    X1, U1, lam1, hp1, st1 = solve_batched_jit(
        model, st, cp, hp, X, U, lam, x_s, ref, f_ext, dt)

    mesh = make_mesh(jax.devices()[:8])
    Xs, Us, lams, x_ss, refs, fes, hps = shard_solve_args(
        mesh, X, U, lam, x_s, ref, f_ext, hp)
    X2, U2, lam2, hp2, st2 = solve_batched_sharded(
        model, st, cp, hps, Xs, Us, lams, x_ss, refs, fes, dt)

    assert np.isfinite(np.asarray(X2)).all()
    assert np.isfinite(np.asarray(st2.final_merit)).all()
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                               rtol=2e-5, atol=2e-5, equal_nan=False)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2),
                               rtol=2e-4, atol=2e-3, equal_nan=False)
    np.testing.assert_allclose(np.asarray(st1.final_merit),
                               np.asarray(st2.final_merit),
                               rtol=2e-5, atol=2e-5, equal_nan=False)
    np.testing.assert_array_equal(np.asarray(st1.sqp_iters),
                                  np.asarray(st2.sqp_iters))
    np.testing.assert_array_equal(np.asarray(st1.ls_step_size),
                                  np.asarray(st2.ls_step_size))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_global_exit_with_chip_disagreement():
    """Pin the GLOBAL solve_ratio exit (VERDICT r3 weak #7: check_vma=False
    removes the static psum guarantee, so assert it dynamically). Lanes are
    arranged so the first devices hold pre-converged lanes and the last
    devices hold hard fresh lanes: a per-chip exit would stop the converged
    chips at iteration 0 and let the fresh chips keep iterating — the
    reference semantics (bsqp.cuh:141-165) take ONE decision for everyone.
    Sharded must equal unsharded exactly on steps and iteration counts."""
    assert len(jax.devices()) >= 8
    model = load_robot("indy7")
    N, B = 8, 16
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6,
                           N_cost=50.0, q_lim_cost=0.01)
    hp = HyperParams.create(B, rho=0.01, mu=10.0, pcg_tol=1e-4)
    X, U, lam, x_s, ref, f_ext = _problem(B, N, model)
    dt = jnp.float32(0.01)

    # pre-solve the first half to the KKT point (24 iterations with the rho
    # schedule carried makes the re-solve's entry residual pass the
    # convergence test: pcg_iters == 0) so those lanes enter converged
    warm = BSQPSettings(N=N, max_sqp_iters=24, max_pcg_iters=100)
    Xw, Uw, lamw, hpw, stw = solve_batched_jit(
        model, warm, cp, hp, X, U, lam, x_s, ref, f_ext, dt)
    half = B // 2
    X = X.at[:half].set(Xw[:half]).at[:, 0, :].set(x_s)
    U = U.at[:half].set(Uw[:half])
    lam = lam.at[:half].set(lamw[:half])
    hp = HyperParams(
        rho=jnp.concatenate([hpw.rho[:half], hp.rho[half:]]),
        drho=hp.drho, mu=hp.mu, pcg_tol=hp.pcg_tol)
    # make the second half genuinely hard: strong per-lane wrenches
    rng = np.random.default_rng(5)
    f_ext = f_ext.at[half:].set(
        jnp.asarray(rng.uniform(-40, 40, (B - half, 6)), jnp.float32))

    st = BSQPSettings(N=N, max_sqp_iters=3, max_pcg_iters=100,
                      solve_ratio=0.5)
    X1, U1, lam1, hp1, st1 = solve_batched_jit(
        model, st, cp, hp, X, U, lam, x_s, ref, f_ext, dt)
    # the scenario is only discriminating if the exit fires mid-loop with
    # lanes still unconverged
    assert int(st1.num_iters_run) < st.max_sqp_iters
    assert int(np.asarray(st1.kkt_converged).sum()) < B

    mesh = make_mesh(jax.devices()[:8])
    Xs, Us, lams, x_ss, refs, fes, hps = shard_solve_args(
        mesh, X, U, lam, x_s, ref, f_ext, hp)
    X2, U2, lam2, hp2, st2 = solve_batched_sharded(
        model, st, cp, hps, Xs, Us, lams, x_ss, refs, fes, dt)

    assert int(st2.num_iters_run) == int(st1.num_iters_run)
    np.testing.assert_array_equal(np.asarray(st1.ls_step_size),
                                  np.asarray(st2.ls_step_size))
    np.testing.assert_array_equal(np.asarray(st1.sqp_iters),
                                  np.asarray(st2.sqp_iters))
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                               rtol=2e-5, atol=2e-5, equal_nan=False)
