"""Direct block-tridiagonal solve of the Schur dual system (TPU-native).

The reference solves S lambda = gamma with batched PCG because on a GPU the
block-tridiagonal matvec parallelizes across knots within one thread block
(SURVEY.md §5 "long-context"). On TPU the batch lives on vector lanes, so a
*sequential-over-knots* block-Thomas factorization is strictly cheaper than
tens of Krylov iterations: N small (12x12 or 14x14) block ops, each batched
over all lanes, with no preconditioner to build. This is a capability the
reference does not have (exact duals instead of PCG-tolerance duals); the PCG
path is kept for parity and for very long horizons.

Factorization (block LU without pivoting, upper blocks = lower^T):
  Dhat_0 = main_0
  L_k    = lower_{k-1} Dhat_{k-1}^-1
  Dhat_k = main_k - L_k lower_{k-1}^T
  ghat_k = gamma_k - L_k ghat_{k-1}
  lambda_{N-1} = Dhat_{N-1}^-1 ghat_{N-1}
  lambda_k     = Dhat_k^-1 (ghat_k - lower_k^T lambda_{k+1})
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .batch_linalg import gj_inv, mm, mm_t
from .schur import btd_matvec


def btd_solve(main, lower, gamma):
    """Solve the symmetric block-tridiagonal system for one lane.
    main (N, n, n), lower (N-1, n, n) at (k+1, k), gamma (N, n)."""
    Dinv0 = gj_inv(main[0])

    def fwd(carry, inp):
        Dinv_prev, ghat_prev = carry
        main_k, lower_km1, gamma_k = inp
        Lk = mm(lower_km1, Dinv_prev)
        Dhat = main_k - mm_t(Lk, lower_km1)
        ghat = gamma_k - mm(Lk, ghat_prev)
        Dinv = gj_inv(Dhat)
        return (Dinv, ghat), (Dinv, ghat)

    (_, _), (Dinvs, ghats) = jax.lax.scan(
        fwd, (Dinv0, gamma[0][..., None]),
        (main[1:], lower, gamma[1:][..., None]),
    )
    Dinv_all = jnp.concatenate([Dinv0[None], Dinvs], axis=0)
    ghat_all = jnp.concatenate([gamma[0][None, :, None], ghats], axis=0)

    lam_last = mm(Dinv_all[-1], ghat_all[-1])

    def bwd(lam_next, inp):
        Dinv_k, ghat_k, lower_k = inp
        lam_k = mm(Dinv_k, ghat_k - mm(jnp.swapaxes(lower_k, -1, -2), lam_next))
        return lam_k, lam_k

    _, lam_rest = jax.lax.scan(
        bwd, lam_last, (Dinv_all[:-1], ghat_all[:-1], lower), reverse=True
    )
    lam = jnp.concatenate([lam_rest, lam_last[None]], axis=0)
    return lam[..., 0]


def btd_solve_batched(S_main, S_lower, gamma, lam_prev, skip):
    """Direct solve across the batch with PCG-compatible bookkeeping:
    lanes whose warm-started duals already satisfy the system (initial
    |r^T r| below the PCG absolute tolerance, pcg.cuh:85-89) report 0
    iterations — the signal the SQP driver uses for convergence masking —
    and skipped lanes keep their duals untouched.

    Shapes: S_main (B, N, n, n), S_lower (B, N-1, n, n), gamma (B, N, n).
    Returns (lam, iterations).
    """
    from .pcg import PCG_ABS_TOL

    r0 = gamma - jax.vmap(btd_matvec)(S_main, S_lower, lam_prev)
    rho0 = jnp.sum(r0 * r0, axis=(-2, -1))
    # a non-finite warm-start residual (NaN/inf duals from a diverged earlier
    # solve) must not read as "already satisfied" (NaN >= tol is False): the
    # direct factorization never touches lam_prev, so just solve — the lane's
    # duals are replaced with the exact solution and the lane recovers.
    active = jnp.logical_and(
        ~skip,
        jnp.logical_or(~jnp.isfinite(rho0), jnp.abs(rho0) >= PCG_ABS_TOL))

    lam_new = jax.vmap(btd_solve)(S_main, S_lower, gamma)
    lam = jnp.where(active[:, None, None], lam_new, lam_prev)
    iters = active.astype(jnp.int32)
    return lam, iters
