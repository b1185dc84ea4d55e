"""Batched preconditioned conjugate gradient on block-tridiagonal systems.

Re-design of gato/bsqp/kernels/pcg.cuh. The reference runs the whole Krylov
loop in one persistent CUDA block per lane with all vectors in shared memory;
the TPU-native equivalent is a single `lax.while_loop` over the whole batch
with per-lane active masks — converged lanes freeze, and the loop exits when
every lane is done (or at max_pcg_iters). This keeps the entire solve
on-device with no host round-trips (the reference's per-iteration D2H
convergence sync, bsqp.cuh:133-165, disappears).

Semantics matched to pcg.cuh:13-148:
  - absolute tolerance 1e-6 on |r^T z| plus per-lane relative tolerance
    epsilon * |r0^T z0| (pcg.cuh:85-92, 127),
  - lanes whose solve already converged in an earlier SQP iteration skip the
    solve entirely and report 0 iterations (pcg.cuh:29-32),
  - the iteration counter increments before the convergence check, and the
    x/r updates of the converging iteration are applied,
  - a NON-FINITE initial residual (a diverged previous solve left NaN/inf in
    the warm-started duals) reports max_iters: the reference's exit test
    |rho_new| < tol is False for NaN so its loop burns all max_iters and the
    lane reads as unconverged (pcg.cuh:85-92); we skip the useless iterations
    but report the same "did not converge" count. Without this guard the NaN
    rho would fail the >= tol activity test, report 0 iterations, and the
    SQP driver would read the dead lane as CONVERGED.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schur import btd_matvec

PCG_ABS_TOL = 1e-6  # pcg.cuh:26


def pcg_solve_batched(
    S_main,  # (B, N, nx, nx)
    S_lower,  # (B, N-1, nx, nx)
    P_main,  # (B, N, nx, nx)
    P_lower,  # (B, N-1, nx, nx)
    gamma,  # (B, N, nx)
    lam0,  # (B, N, nx) warm-started duals
    epsilon,  # (B,) per-lane relative tolerance
    max_iters: int,
    skip,  # (B,) bool: lanes to skip entirely (already converged)
):
    """Returns (lam, iterations) with iterations (B,) int32."""
    mv_S = jax.vmap(btd_matvec)
    mv_P = jax.vmap(btd_matvec)

    def dot(a, b):
        return jnp.sum(a * b, axis=(-2, -1))

    r = gamma - mv_S(S_main, S_lower, lam0)
    z = mv_P(P_main, P_lower, r)
    p = z
    rho = dot(r, z)  # (B,)
    rho_init = jnp.abs(rho)
    finite0 = jnp.isfinite(rho)
    active = jnp.logical_and(jnp.logical_and(~skip, finite0),
                             jnp.abs(rho) >= PCG_ABS_TOL)
    iters = jnp.zeros(gamma.shape[0], dtype=jnp.int32)

    def cond(state):
        _, _, _, _, active, _, it = state
        return jnp.logical_and(it < max_iters, jnp.any(active))

    def body(state):
        lam, r, p, rho, active, iters, it = state
        iters = iters + active.astype(jnp.int32)

        Ap = mv_S(S_main, S_lower, p)
        pAp = dot(p, Ap)
        alpha = rho / jnp.where(pAp == 0, 1.0, pAp)
        am = jnp.where(active, alpha, 0.0)[:, None, None]
        lam = lam + am * p
        r = r - am * Ap

        z = mv_P(P_main, P_lower, r)
        rho_new = dot(r, z)
        converged = jnp.abs(rho_new) < (PCG_ABS_TOL + epsilon * rho_init)

        beta = rho_new / jnp.where(rho == 0, 1.0, rho)
        p_new = z + beta[:, None, None] * p
        keep_going = jnp.logical_and(active, ~converged)
        p = jnp.where(keep_going[:, None, None], p_new, p)
        rho = jnp.where(keep_going, rho_new, rho)
        return lam, r, p, rho, keep_going, iters, it + 1

    lam, _, _, _, _, iters, _ = jax.lax.while_loop(
        cond, body, (lam0, r, p, rho, active, iters, jnp.int32(0))
    )
    # dead lanes (non-finite entry residual) did not converge: report the
    # count the reference's loop would produce (see module docstring)
    iters = jnp.where(jnp.logical_and(~skip, ~finite0), max_iters, iters)
    return lam, iters
