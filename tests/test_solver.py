"""Solver-layer tests: Schur/PCG/dz vs a dense KKT oracle, batch-lane
properties, and SQP behavior (SURVEY.md §4's designed test pyramid)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.ops.cost import CostParams
from gato_tpu.ops.kkt import setup_kkt
from gato_tpu.ops.schur import build_schur, btd_matvec, compute_dz
from gato_tpu.ops.pcg import pcg_solve_batched
from gato_tpu.ops.merit import merit_value
from gato_tpu.solver.types import BSQPSettings, HyperParams
from gato_tpu.solver.bsqp import sim_forward_batched, solve_batched_jit


def _dense_kkt(kkt, rho, nq):
    """Independent dense assembly + solve of the regularized KKT system."""
    N, nx = kkt.Q.shape[0], kkt.Q.shape[1]
    nu = kkt.R.shape[1]
    nz = N * nx + (N - 1) * nu
    xi = lambda k: k * (nx + nu)
    ui = lambda k: k * (nx + nu) + nx
    Ihalf = np.diag((np.arange(nx) < nq).astype(float))
    G = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        G[xi(k):xi(k) + nx, xi(k):xi(k) + nx] = np.asarray(kkt.Q[k]) + rho * Ihalf
        g[xi(k):xi(k) + nx] = np.asarray(kkt.q[k])
        if k < N - 1:
            G[ui(k):ui(k) + nu, ui(k):ui(k) + nu] = np.asarray(kkt.R[k])
            g[ui(k):ui(k) + nu] = np.asarray(kkt.r[k])
    nc = N * nx
    C = np.zeros((nc, nz))
    C[0:nx, 0:nx] = -np.eye(nx)
    for k in range(N - 1):
        r0 = (k + 1) * nx
        C[r0:r0 + nx, xi(k):xi(k) + nx] = np.asarray(kkt.A[k])
        C[r0:r0 + nx, ui(k):ui(k) + nu] = np.asarray(kkt.B[k])
        C[r0:r0 + nx, xi(k + 1):xi(k + 1) + nx] = -np.eye(nx)
    KKTm = np.block([[G, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([-g, np.asarray(kkt.c).reshape(-1)])
    sol = np.linalg.solve(KKTm, rhs)
    return sol[:nz], sol[nz:].reshape(N, nx)


@pytest.fixture(scope="module")
def problem64():
    model = load_robot("indy7", dtype=jnp.float64)
    N, nx, nu = 6, 12, 6
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6, N_cost=50.0,
                           q_lim_cost=0.01, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-0.3, 0.3, (N, nx)))
    U = jnp.asarray(rng.uniform(-5, 5, (N - 1, nu)))
    x_s = jnp.asarray(rng.uniform(-0.3, 0.3, nx))
    ref = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 6)))
    kkt = setup_kkt(model, cp, X, U, x_s, ref, jnp.zeros(6), 0.01)
    return model, kkt


def test_schur_matches_dense_kkt(problem64):
    """S lambda* = gamma for the dense-KKT dual solution (the reference's
    condensation math, schur_linsys.cuh:84-128)."""
    model, kkt = problem64
    rho = 0.01
    schur = build_schur(kkt, rho, model.nq)
    _, lam_dense = _dense_kkt(kkt, rho, model.nq)
    res = btd_matvec(schur.S_main, schur.S_lower, jnp.asarray(lam_dense)) - schur.gamma
    assert float(jnp.abs(res).max()) < 1e-7


def test_pcg_and_dz_match_dense_kkt(problem64):
    model, kkt = problem64
    N, nx, nu = kkt.Q.shape[0], 12, 6
    rho = 0.01
    schur = build_schur(kkt, rho, model.nq)
    dz_dense, lam_dense = _dense_kkt(kkt, rho, model.nq)

    lam, iters = pcg_solve_batched(
        schur.S_main[None], schur.S_lower[None], schur.P_main[None],
        schur.P_lower[None], schur.gamma[None],
        jnp.zeros((1, N, nx)), jnp.asarray([1e-14]), 2000, jnp.asarray([False]),
    )
    assert int(iters[0]) > 0
    scale = max(1.0, np.abs(lam_dense).max())
    assert np.abs(np.asarray(lam[0]) - lam_dense).max() / scale < 1e-3

    dzx, dzu, _, _ = compute_dz(kkt, schur, lam[0])
    dz = np.zeros_like(dz_dense)
    for k in range(N):
        dz[k * (nx + nu):k * (nx + nu) + nx] = np.asarray(dzx[k])
        if k < N - 1:
            dz[k * (nx + nu) + nx:(k + 1) * (nx + nu)] = np.asarray(dzu[k])
    scale = max(1.0, np.abs(dz_dense).max())
    assert np.abs(dz - dz_dense).max() / scale < 1e-3


def test_pcg_skip_mask(problem64):
    """Lanes flagged converged skip the solve and report 0 iterations
    (pcg.cuh:29-32)."""
    model, kkt = problem64
    schur = build_schur(kkt, 0.01, model.nq)
    N, nx = kkt.Q.shape[0], 12
    tile = lambda a: jnp.tile(a[None], (2,) + (1,) * a.ndim)
    lam0 = jnp.zeros((2, N, nx))
    lam, iters = pcg_solve_batched(
        tile(schur.S_main), tile(schur.S_lower), tile(schur.P_main),
        tile(schur.P_lower), tile(schur.gamma), lam0,
        jnp.asarray([1e-8, 1e-8]), 500, jnp.asarray([False, True]),
    )
    assert int(iters[1]) == 0
    assert float(jnp.abs(lam[1]).max()) == 0.0
    assert int(iters[0]) > 0


def _mpc_setup(batch_size, N=8, model_name="indy7", max_sqp_iters=1):
    model = load_robot(model_name)
    st = BSQPSettings(N=N, max_sqp_iters=max_sqp_iters, max_pcg_iters=100)
    cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6, N_cost=50.0,
                           q_lim_cost=0.01)
    hp = HyperParams.create(batch_size, rho=0.01, mu=10.0, pcg_tol=1e-4)
    return model, st, cp, hp


def test_lanes_identical():
    """The reference's checkIfBatchTrajsMatch invariant (utils.h:53-71):
    identical inputs across lanes -> bitwise-identical outputs."""
    B = 4
    model, st, cp, hp = _mpc_setup(B)
    nx, nu, N = model.nx, model.nu, st.N
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015, 0, 0, 0, 0, 0, 0],
                     dtype=jnp.float32)
    X = jnp.tile(q0, (B, N, 1))
    U = jnp.zeros((B, N - 1, nu), jnp.float32)
    lam = jnp.zeros((B, N, nx), jnp.float32)
    ref = jnp.tile(jnp.asarray([-0.3, 0.3, 0.9, 0, 0, 0], dtype=jnp.float32), (B, N, 1))
    Xo, Uo, lamo, hpo, stats = solve_batched_jit(
        model, st, cp, hp, X, U, lam, jnp.tile(q0, (B, 1)), ref,
        jnp.zeros((B, 6), jnp.float32), jnp.float32(0.01),
    )
    for b in range(1, B):
        assert bool(jnp.all(Xo[0] == Xo[b]))
        assert bool(jnp.all(Uo[0] == Uo[b]))
        assert bool(jnp.all(lamo[0] == lamo[b]))


def test_per_lane_hyperparameters_diverge():
    """Per-lane rho produces different solutions (the hparam-batch use case,
    gato_hparam_batch.ipynb)."""
    B = 3
    model, st, cp, _ = _mpc_setup(B, max_sqp_iters=3)
    nx, nu, N = model.nx, model.nu, st.N
    hp = HyperParams(
        rho=jnp.asarray([1e-4, 1e-2, 1.0], dtype=jnp.float32),
        drho=jnp.ones(B, dtype=jnp.float32),
        mu=jnp.full(B, 10.0, dtype=jnp.float32),
        pcg_tol=jnp.full(B, 1e-4, dtype=jnp.float32),
    )
    from gato_tpu.dynamics.algorithms import ee_position

    q0 = jnp.asarray(
        [-1.096711, -0.09903229, 0.83125766, -0.10907673, 0.49704404, 0.01499449],
        jnp.float32,
    )
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    X = jnp.tile(x0, (B, N, 1))
    U = jnp.zeros((B, N - 1, nu), jnp.float32)
    ee0 = ee_position(model, q0)[:3]
    goal = ee0 + jnp.asarray([0.03, -0.03, 0.03], jnp.float32)
    ref = jnp.tile(jnp.concatenate([goal, jnp.zeros(3, jnp.float32)]),
                   (B, N, 1))
    Xo, Uo, *_ = solve_batched_jit(
        model, st, cp, hp, X, U, jnp.zeros((B, N, nx), jnp.float32), jnp.tile(x0, (B, 1)),
        ref, jnp.zeros((B, 6), jnp.float32), jnp.float32(0.01),
    )
    assert float(jnp.abs(Uo[0] - Uo[2]).max()) > 1e-6


def test_sqp_reduces_merit_closed_loop():
    """Mini closed-loop MPC on a nearby goal: steps accepted, merit falls,
    EE converges toward the goal."""
    from gato_tpu.ops.integrators import sim_step
    from gato_tpu.dynamics.algorithms import ee_position

    B = 1
    model, st, cp, hp0 = _mpc_setup(B, max_sqp_iters=2)
    nx, nu, N = model.nx, model.nu, st.N
    dt = 0.01
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     dtype=jnp.float32)
    x = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    ee0 = ee_position(model, q0)[:3]
    goal = ee0 + jnp.asarray([0.05, -0.05, 0.05], jnp.float32)
    ref = jnp.tile(jnp.concatenate([goal, jnp.zeros(3, jnp.float32)]), (B, N, 1))

    X = jnp.tile(x, (B, N, 1))
    U = jnp.zeros((B, N - 1, nu), jnp.float32)
    lam = jnp.zeros((B, N, nx), jnp.float32)
    hp = hp0
    step_fn = jax.jit(lambda x, u: sim_step(model, x, u, dt))
    accepted = 0
    for i in range(30):
        X = X.at[:, 0, :].set(x)
        X, U, lam, hp, stats = solve_batched_jit(
            model, st, cp, HyperParams(hp0.rho, hp0.drho, hp.mu, hp.pcg_tol),
            X, U, lam, x[None], ref, jnp.zeros((B, 6), jnp.float32), jnp.float32(dt),
        )
        accepted += int(np.sum(np.asarray(stats.ls_step_size) > 0))
        x = step_fn(x, U[0, 0])
    ee = ee_position(model, x[:model.nq])[:3]
    assert accepted > 10
    assert float(jnp.linalg.norm(ee - goal)) < 0.02


def test_per_lane_sqp_iters():
    """stats.sqp_iters varies per lane when lanes converge at different
    iterations (bsqp.cuh:141-163 mask flip): a lane warm-started at an
    already-converged solution takes 0 PCG iterations on its first SQP
    iteration and its count freezes at 1; a cold lane counts every
    iteration."""
    model, _, cp, _ = _mpc_setup(1)
    N, nx, nu = 8, model.nx, model.nu
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    ref1 = jnp.tile(jnp.asarray([-0.3, 0.3, 0.9, 0, 0, 0], jnp.float32),
                    (1, N, 1))
    fe1 = jnp.zeros((1, 6), jnp.float32)

    # converge lane 0's problem (repeat solves until pcg_iters==0 upfront)
    st_pre = BSQPSettings(N=N, max_sqp_iters=20, max_pcg_iters=100,
                          linear_solver="pcg")
    hp = HyperParams.create(1, rho=0.01, mu=10.0, pcg_tol=1e-6)
    X = jnp.tile(x0, (1, N, 1))
    U = jnp.zeros((1, N - 1, nu), jnp.float32)
    lam = jnp.zeros((1, N, nx), jnp.float32)
    for _ in range(3):
        X, U, lam, hp, stats = solve_batched_jit(
            model, st_pre, cp, hp, X, U, lam, x0[None], ref1, fe1,
            jnp.float32(0.01))
    assert int(np.asarray(stats.sqp_iters)[0]) == 1  # pre-converged

    B = 2
    st = BSQPSettings(N=N, max_sqp_iters=3, max_pcg_iters=100,
                      linear_solver="pcg")
    hp2 = HyperParams(
        rho=jnp.concatenate([hp.rho, jnp.asarray([0.01], jnp.float32)]),
        drho=jnp.ones(B, jnp.float32), mu=jnp.full(B, 10.0, jnp.float32),
        pcg_tol=jnp.full(B, 1e-6, jnp.float32))
    Xb = jnp.concatenate([X, jnp.tile(x0, (1, N, 1))])
    Ub = jnp.concatenate([U, jnp.zeros((1, N - 1, nu), jnp.float32)])
    lamb = jnp.concatenate([lam, jnp.zeros((1, N, nx), jnp.float32)])
    *_, stats = solve_batched_jit(
        model, st, cp, hp2, Xb, Ub, lamb, jnp.tile(x0, (B, 1)),
        jnp.tile(ref1, (B, 1, 1)), jnp.zeros((B, 6), jnp.float32),
        jnp.float32(0.01))
    it = np.asarray(stats.sqp_iters)
    assert it[0] == 1, it
    assert it[1] == st.max_sqp_iters, it
    conv = np.asarray(stats.kkt_converged)
    assert conv[0] == 1 and conv[1] == 0


def test_sim_forward_fext_lanes():
    model = load_robot("iiwa14")
    B = 2
    f = jnp.zeros((B, 6), jnp.float32).at[1, 3].set(-40.0)
    xn = sim_forward_batched(model, jnp.zeros(model.nx, jnp.float32), jnp.ones(model.nu, jnp.float32), f, 0.01)
    assert xn.shape == (B, model.nx)
    assert float(jnp.abs(xn[0] - xn[1]).max()) > 1e-6


def test_solve_ratio_early_exit():
    """solve_ratio < 1 allows exit once enough lanes converge
    (bsqp.cuh:165)."""
    B = 2
    model, _, cp, hp = _mpc_setup(B)
    st = BSQPSettings(N=6, max_sqp_iters=4, max_pcg_iters=50, solve_ratio=0.5)
    nx, nu, N = model.nx, model.nu, 6
    x0 = jnp.zeros(nx, jnp.float32)
    # references at the current EE -> zero-ish gradient, PCG converges fast
    from gato_tpu.dynamics.algorithms import ee_position
    ee0 = ee_position(model, x0[:model.nq])
    ref = jnp.tile(ee0, (B, N, 1))
    Xo, Uo, lam, hpo, stats = solve_batched_jit(
        model, st, cp, hp, jnp.tile(x0, (B, N, 1)),
        jnp.zeros((B, N - 1, nu), jnp.float32),
        jnp.zeros((B, N, nx), jnp.float32), jnp.tile(x0, (B, 1)), ref,
        jnp.zeros((B, 6), jnp.float32),
        jnp.float32(0.01),
    )
    assert int(stats.num_iters_run) <= st.max_sqp_iters
