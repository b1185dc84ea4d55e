"""Schur-complement condensation of the block-tridiagonal KKT system, the
symmetric-stair (SS) preconditioner, and primal step recovery.

Re-design of gato/bsqp/kernels/schur_linsys.cuh. The reference launches one
CUDA block per (knot, solve); here everything is a batched einsum over the
knot axis, vmapped over lanes by the solver.

Math (schur_linsys.cuh:84-87 and :166-210), for lambda ordered as one nx-block
per knot (block 0 = initial-condition row, block k+1 = dynamics row k):

  Qr_k    = Q_k + rho * I~            (I~ adds rho ONLY to the first nq
                                       diagonal entries — the reference's
                                       addScaledIdentity quirk,
                                       linalg.cuh:84-96; R gets no rho)
  phi_k   = A_k Qr_k^-1
  theta_k = A_k Qr_k^-1 A_k^T + B_k R_k^-1 B_k^T + Qr_{k+1}^-1
  S       = blocktridiag(main_0 = -Qr_0^-1, main_{k+1} = -theta_k,
                         lower_{k+1,k} = phi_k, upper = lower^T)
  gamma_0     = c_0 - Qr_0^-1 q_0
  gamma_{k+1} = c_{k+1} + phi_k q_k + B_k R_k^-1 r_k - Qr_{k+1}^-1 q_{k+1}

  Preconditioner P^-1 (schur_linsys.cuh:150-164, 181-188, 213-260):
    main_0     = -Qr_0
    main_{k+1} = -(theta_k + rho * I~)^-1
    lower_{k+1,k} = -(main_{k+1} @ phi_k @ main_k),  upper = lower^T
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .batch_linalg import block_qinv, chol_inv, diag_inv, mm, mm_t, mv, mtv
from .kkt import KKTSystem

RHO_INIT = 1e-3  # settings.h:18
RHO_FACTOR = 1.2  # settings.h:19
RHO_MIN = 1e-8  # settings.h:20
RHO_MAX = 10.0  # settings.h:21


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SchurSystem:
    """Mirrors the reference SchurSystem (gato/types.cuh:76-81), plus the
    saved Qr^-1 / R^-1 that the reference writes back over Q/R for dz
    recovery (schur_linsys.cuh:100-104)."""

    S_main: jax.Array  # (N, nx, nx)
    S_lower: jax.Array  # (N-1, nx, nx)  block (k+1, k); upper is its transpose
    gamma: jax.Array  # (N, nx)
    P_main: jax.Array | None  # (N, nx, nx); None when using the direct solver
    P_lower: jax.Array | None  # (N-1, nx, nx)
    Q_inv: jax.Array  # (N, nx, nx)
    R_inv: jax.Array  # (N-1, nu, nu)


def _add_rho_halfdiag(M, rho, nq):
    """M + rho * diag(1..1, 0..0) with ones on the first nq entries only
    (the addScaledIdentity quirk, linalg.cuh:84-96)."""
    mask = (jnp.arange(M.shape[-1]) < nq).astype(M.dtype)
    return M + rho * jnp.diag(mask)


def build_schur(kkt: KKTSystem, rho, nq: int,
                compute_precond: bool = True) -> SchurSystem:
    """compute_precond=False skips the SS preconditioner (P_inv) — the
    direct btd solver doesn't need it."""
    N, nx = kkt.Q.shape[0], kkt.Q.shape[1]

    # Structured inverses (ops/batch_linalg.py): Q~ is block-diagonal
    # (dense rank-2 qq block + diagonal qd block), R is diagonal.
    rho_b = jnp.broadcast_to(rho, kkt.Q.shape[:-2])
    Q_inv = block_qinv(kkt.Q, rho_b, nq)
    R_inv = diag_inv(kkt.R)

    A, B = kkt.A, kkt.B
    phi = mm(A, Q_inv[:-1])  # (N-1, nx, nx)
    BRinv = mm(B, R_inv)  # (N-1, nx, nu)
    theta = mm_t(phi, A) + mm_t(BRinv, B) + Q_inv[1:]

    S_main = jnp.concatenate([-Q_inv[:1], -theta], axis=0)
    S_lower = phi

    g0 = kkt.c[0] - mv(Q_inv[0], kkt.q[0])
    g_rest = (
        kkt.c[1:]
        + mv(phi, kkt.q[:-1])
        + mv(BRinv, kkt.r)
        - mv(Q_inv[1:], kkt.q[1:])
    )
    gamma = jnp.concatenate([g0[None], g_rest], axis=0)

    if compute_precond:
        theta_r = jax.vmap(lambda M: _add_rho_halfdiag(M, rho, nq))(theta)
        Qr0 = _add_rho_halfdiag(kkt.Q[0], rho, nq)
        # theta~ is SPD: Cholesky-based inverse is ~4x faster than GJ here
        P_main = jnp.concatenate([-Qr0[None], -chol_inv(theta_r)], axis=0)
        P_lower = -mm(mm(P_main[1:], phi), P_main[:-1])
    else:
        P_main = None
        P_lower = None

    return SchurSystem(
        S_main=S_main, S_lower=S_lower, gamma=gamma,
        P_main=P_main, P_lower=P_lower, Q_inv=Q_inv, R_inv=R_inv,
    )


def btd_matvec(main, lower, x):
    """Symmetric block-tridiagonal mat-vec (linalg.cuh:174-273 analogue).
    main (N, nx, nx), lower (N-1, nx, nx) at blocks (k+1, k), x (N, nx)."""
    y = mv(main, x)
    y = y.at[1:].add(mv(lower, x[:-1]))
    y = y.at[:-1].add(mtv(lower, x[1:]))
    return y


def compute_dz(kkt: KKTSystem, schur: SchurSystem, lam):
    """Primal step from duals (schur_linsys.cuh:312-431):
      dz_x_k = -Qr_k^-1 (q_k - lambda_k + A_k^T lambda_{k+1})
      dz_u_k = -R_k^-1  (r_k + B_k^T lambda_{k+1})
    Also returns the stationarity residuals the reference overwrites q/r with
    (schur_linsys.cuh:386-387, 428-429)."""
    lam_next = lam[1:]  # lambda_{k+1} for k = 0..N-2
    At_lam = mtv(kkt.A, lam_next)  # A^T lambda'
    res_q = kkt.q - lam
    res_q = res_q.at[:-1].add(At_lam)
    dzx = -mv(schur.Q_inv, res_q)

    Bt_lam = mtv(kkt.B, lam_next)
    res_r = kkt.r + Bt_lam
    dzu = -mv(schur.R_inv, res_r)
    return dzx, dzu, res_q, res_r
