"""Batched small-matrix linear algebra, unrolled for the TPU VPU.

The generic jnp.linalg.{inv, cholesky} lower to sequential LAPACK-style loops
that are catastrophically slow for (huge_batch, 12, 12) problems on TPU. The
matrices here are tiny and their sizes are static, so we unroll the
factorizations at trace time into pure vector ops over the batch dims — the
TPU analogue of the reference's per-thread-block Gaussian elimination
(gato/utils/linalg.cuh:364-519 invertMatrix).

All routines operate on (..., n, n) / (..., n) arrays with arbitrary leading
batch dims and static n.
"""

from __future__ import annotations

import jax.numpy as jnp


def gj_inv(A):
    """Unrolled Gauss-Jordan inverse without pivoting (same method as the
    reference's block::invertMatrix). A: (..., n, n), n static."""
    n = A.shape[-1]
    M = jnp.concatenate([A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)],
                        axis=-1)  # (..., n, 2n)
    for k in range(n):
        pivot = M[..., k, :]  # (..., 2n)
        pivot = pivot / pivot[..., k:k + 1]
        rows = M - M[..., :, k:k + 1] * pivot[..., None, :]
        M = rows.at[..., k, :].set(pivot)
    return M[..., :, n:]


def chol_factor(A):
    """Unrolled Cholesky factor L (lower) of SPD A: (..., n, n), n static."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        if j == 0:
            d = A[..., j, j]
        else:
            d = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        dj = jnp.sqrt(d)
        L = L.at[..., j, j].set(dj)
        if j + 1 < n:
            if j == 0:
                s = A[..., j + 1:, j]
            else:
                s = A[..., j + 1:, j] - sum(
                    L[..., j + 1:, k] * L[..., j, k:k + 1] for k in range(j)
                )
            L = L.at[..., j + 1:, j].set(s / dj[..., None])
    return L


def chol_solve(L, b):
    """Solve A x = b given L = chol_factor(A). b: (..., n) or (..., n, m)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution L y = b
    y = jnp.zeros_like(b)
    for i in range(n):
        s = b[..., i, :]
        if i > 0:
            s = s - sum(L[..., i, k, None] * y[..., k, :] for k in range(i))
        y = y.at[..., i, :].set(s / L[..., i, i][..., None])
    # back substitution L^T x = y
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        s = y[..., i, :]
        if i + 1 < n:
            s = s - sum(
                L[..., k, i, None] * x[..., k, :] for k in range(i + 1, n)
            )
        x = x.at[..., i, :].set(s / L[..., i, i][..., None])
    return x[..., 0] if vec else x


def chol_inv(A):
    """SPD inverse via unrolled Cholesky."""
    n = A.shape[-1]
    L = chol_factor(A)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return chol_solve(L, eye)


def diag_inv(A):
    """Inverse of a diagonal matrix stored densely."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    n = A.shape[-1]
    return jnp.eye(n, dtype=A.dtype) * (1.0 / d)[..., None, :]


def block_qinv(Q, rho, nq: int):
    """Inverse of the regularized cost Hessian Q~ = Q + rho*diag(1_nq, 0),
    exploiting its block-diagonal structure (ops/cost.py): the qq block is
    dense (rank-2 + rho I), the qd block is diagonal, off-blocks are zero.

    Q: (..., nx, nx); rho broadcastable to Q[..., 0, 0]. Returns (..., nx, nx).
    """
    nx = Q.shape[-1]
    Qqq = Q[..., :nq, :nq] + rho[..., None, None] * jnp.eye(nq, dtype=Q.dtype)
    inv_qq = gj_inv(Qqq)
    d = jnp.diagonal(Q[..., nq:, nq:], axis1=-2, axis2=-1)
    out = jnp.zeros_like(Q)
    out = out.at[..., :nq, :nq].set(inv_qq)
    idx = jnp.arange(nq, nx)
    out = out.at[..., idx, idx].set(1.0 / d)
    return out


# ---- exact-f32 small matmul helpers ----
# On TPU, dot_general on f32 defaults to bf16 passes (~2% error) AND maps
# tiny matrices onto the MXU with terrible utilization. Unrolling the short
# contraction into mul-adds keeps full f32 precision on the VPU and is
# 3-6x faster for the (huge_batch, 12, 12) shapes used here.

def mm(a, b):
    """(..., m, n) @ (..., n, p), contraction unrolled (n static, small)."""
    n = a.shape[-1]
    return sum(a[..., :, j, None] * b[..., None, j, :] for j in range(n))


def mm_t(a, b):
    """(..., m, n) @ (..., p, n)^T."""
    n = a.shape[-1]
    return sum(a[..., :, j, None] * b[..., None, :, j] for j in range(n))


def mv(a, x):
    """(..., m, n) @ (..., n)."""
    n = a.shape[-1]
    return sum(a[..., :, j] * x[..., j, None] for j in range(n))


def mtv(a, x):
    """(..., m, n)^T @ (..., m) -> (..., n)."""
    m = a.shape[-2]
    return sum(a[..., i, :] * x[..., i, None] for i in range(m))
