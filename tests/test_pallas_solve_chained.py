"""Chained megakernel driver: whole-batch exit semantics at B > capacity.

sqp_solve_pallas_chained launches one SQP iteration per kernel call with the
solve_ratio convergence count reduced GLOBALLY between launches (psum'd over
the mesh axis under shard_map) — the reference's per-iteration D2H + host
check (bsqp.cuh:133-165). Real-body interpret runs are impractically slow on
CPU (CLAUDE.md), so these tests monkeypatch cheap fake iteration/merit
bodies into solve_channels: the SHIPPED control flow (baseline-merit
seeding, carried state, line search, exit revert) runs unchanged, only the
dynamics/Krylov compute is stubbed, and a numpy oracle of the reference
semantics provides exact expected values.

Fake semantics: the rho channel encodes per-problem difficulty K (adapt_rho
off so it stays constant); the fake PCG reports max(0, K - it) iterations
(lam counts launches), so problem p converges exactly at iteration K_p; the
fake merit is the segment-sum of X, and dz = -0.01, so every line search
succeeds with alpha = 1 and X drops by 0.01 per accepted iteration.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import gato_tpu.ops.pallas_solve as ps
from gato_tpu.ops.cost import CostParams
from gato_tpu.robots.model import load_robot


def _fake_iter_channels(cd, key, cp, N, max_pcg_iters, integrator_type, dt,
                        X, U, xs, r3, fe, lam, rho, eps, skip, like,
                        seg=None, pvalid=None):
    nx, nu = len(X), len(U)
    # lam[0] counts completed launches (global iteration index)
    it = lam[0]
    iters = jnp.maximum(0.0, rho - it)
    iters = jnp.where(skip > 0.5, 0.0, iters)
    dzx = [jnp.full_like(like, -0.01) for _ in range(nx)]
    dzu = [jnp.full_like(like, -0.01) for _ in range(nu)]
    lam_out = [lam[i] + 1.0 for i in range(nx)]
    return dzx, dzu, lam_out, [iters]


def _fake_merit_channels(cd, key, cp, N, dt, integrator_type, X, U, xs, r3,
                         fe, mu, lane, pvalid, seg, like):
    tot = None
    for c in X:
        tot = c if tot is None else tot + c
    tot = jnp.where((lane < N) & (pvalid > 0.5), tot, 0.0)
    return ps._segsum(tot, seg)


def _oracle(K, B, N, nx, max_sqp_iters, solve_ratio, x0_scalar):
    """Numpy simulation of the reference's solve loop semantics
    (bsqp.cuh:121-177): per-iteration [pcg -> global exit check -> LS]."""
    conv = np.zeros(B, bool)
    sqp = np.zeros(B)
    x = np.full(B, x0_scalar)
    pcg = np.zeros((max_sqp_iters, B))
    lss = np.zeros((max_sqp_iters, B))
    it = 0
    while it < max_sqp_iters:
        p = np.where(conv, 0.0, np.maximum(0.0, K - it))
        pcg[it] = p
        sqp = np.where(conv, sqp, sqp + 1)
        conv = conv | (p == 0)
        it += 1
        if conv.sum() >= B * solve_ratio:
            break
        x = x - 0.01  # alpha=1 accepted everywhere
        lss[it - 1] = 1.0
    return x, conv, sqp, pcg, lss, it


def _run(monkeypatch, B, N, max_sqp_iters, solve_ratio, fn, axis_name=None,
         mesh=None):
    monkeypatch.setattr(ps, "iter_channels", _fake_iter_channels)
    monkeypatch.setattr(ps, "merit_channels", _fake_merit_channels)
    model = load_robot("indy7")
    cp = CostParams.create()
    nx, nu = 12, 6
    x0 = 2.0
    X = jnp.full((B, N, nx), x0, jnp.float32)
    U = jnp.full((B, N - 1, nu), x0, jnp.float32)
    lam = jnp.zeros((B, N, nx), jnp.float32)
    x_s = jnp.zeros((B, nx), jnp.float32)
    ref = jnp.zeros((B, N, 6), jnp.float32)
    fe = jnp.zeros((B, 6), jnp.float32)
    K = jnp.asarray(np.arange(B) % 5, jnp.float32)  # difficulty = rho
    ones = jnp.ones(B, jnp.float32)
    args = (model, cp, X, U, lam, x_s, ref, fe, K, ones, ones, ones,
            jnp.float32(0.01), N, max_sqp_iters, 10)
    kw = dict(num_alphas=8, integrator_type=2, adapt_rho=False,
              solve_ratio=solve_ratio)
    if fn is ps.sqp_solve_pallas_chained and axis_name:
        kw["axis_name"] = axis_name
    return np.asarray(K), fn(*args, **kw)


@pytest.mark.parametrize("B,ratio", [(40, 0.75), (40, 1.0), (24, 0.5)])
def test_chained_matches_reference_exit_oracle(monkeypatch, B, ratio):
    """B > capacity (N=64 -> cap 16): the chained driver must reproduce the
    reference's whole-batch exit exactly — per-chunk or disabled exits give
    different trajectories/step counts."""
    N, max_sqp = 64, 4
    K, out = _run(monkeypatch, B, N, max_sqp, ratio,
                  ps.sqp_solve_pallas_chained)
    (Xo, Uo, lam_o, rho_o, drho_o, conv, merit0, merit_f, sqp,
     pcg, lsm, lss) = out
    xe, conve, sqpe, pcge, lsse, ite = _oracle(K, B, N, 12, max_sqp, ratio,
                                               2.0)
    np.testing.assert_allclose(np.asarray(Xo)[:, 0, 0], xe, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(conv).astype(bool), conve)
    np.testing.assert_array_equal(np.asarray(sqp), sqpe)
    np.testing.assert_array_equal(np.asarray(pcg), pcge)
    np.testing.assert_array_equal(np.asarray(lss), lsse)
    # the baseline merit seeded at launch 0 is merit(warm start)
    np.testing.assert_allclose(np.asarray(merit0), 2.0 * 12 * N, rtol=1e-6)


def test_chained_matches_one_launch_within_capacity(monkeypatch):
    """At B <= capacity the one-launch kernel's internal exit is already
    whole-batch: the chained driver (carried state, seeding, revert) must
    agree with it bitwise on every output."""
    B, N, max_sqp, ratio = 16, 64, 4, 0.75
    _, out1 = _run(monkeypatch, B, N, max_sqp, ratio, ps.sqp_solve_pallas)
    _, out2 = _run(monkeypatch, B, N, max_sqp, ratio,
                   ps.sqp_solve_pallas_chained)
    names = ["X", "U", "lam", "rho", "drho", "conv", "merit0", "merit_f",
             "sqp", "pcg", "lsm", "lss"]
    for n, a, b in zip(names, out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=n)


def test_chained_shard_map_psum_global_exit(monkeypatch):
    """Under shard_map the convergence count must be psum'd: each chip's
    local count alone would exit chips at different iterations. Sharded
    chained solve == unsharded chained solve, with difficulties arranged so
    chip 0's lanes all converge at iteration 0 (a local exit would fire
    immediately and diverge)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:4]
    B, N, max_sqp, ratio = 32, 64, 4, 0.9
    monkeypatch.setattr(ps, "iter_channels", _fake_iter_channels)
    monkeypatch.setattr(ps, "merit_channels", _fake_merit_channels)
    model = load_robot("indy7")
    cp = CostParams.create()
    nx, nu = 12, 6
    X = jnp.full((B, N, nx), 2.0, jnp.float32)
    U = jnp.full((B, N - 1, nu), 2.0, jnp.float32)
    lam = jnp.zeros((B, N, nx), jnp.float32)
    x_s = jnp.zeros((B, nx), jnp.float32)
    ref = jnp.zeros((B, N, 6), jnp.float32)
    fe = jnp.zeros((B, 6), jnp.float32)
    Knp = np.arange(B) % 4
    Knp[:8] = 0  # chip 0 fully converged at iteration 0
    K = jnp.asarray(Knp, jnp.float32)
    ones = jnp.ones(B, jnp.float32)

    def solve(X, U, lam, x_s, ref, fe, K, axis_name=None):
        return ps.sqp_solve_pallas_chained(
            model, cp, X, U, lam, x_s, ref, fe, K, ones[:K.shape[0]],
            ones[:K.shape[0]], ones[:K.shape[0]], jnp.float32(0.01), N,
            max_sqp, 10, num_alphas=8, integrator_type=2, adapt_rho=False,
            solve_ratio=ratio, axis_name=axis_name)

    out_ref = solve(X, U, lam, x_s, ref, fe, K)

    mesh = Mesh(np.asarray(devs), ("b",))
    Pb = P("b")
    out_sh = jax.jit(jax.shard_map(
        lambda *a: solve(*a, axis_name="b"),
        mesh=mesh, in_specs=(Pb,) * 7,
        out_specs=(Pb, Pb, Pb, Pb, Pb, Pb, Pb, Pb, Pb,
                   P(None, "b"), P(None, "b"), P(None, "b")),
        check_vma=False,
    ))(X, U, lam, x_s, ref, fe, K)

    for i, (a, b) in enumerate(zip(out_ref, out_sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"output {i}")
    # sanity: the global exit really fired before max_sqp_iters
    assert np.asarray(out_ref[11])[-1].max() == 0.0  # last iter: no LS step
