"""Solver configuration and statistics contracts.

Mirrors the reference's three config tiers (SURVEY.md §5): compile-time
constants become the static, hashable `BSQPSettings` (drives jit
specialization the way KNOT_POINTS/BatchSize templates drive nvcc);
construction-time scalars live in `CostParams`; per-lane batched
hyperparameters live in `HyperParams` (bsqp.cuh:63-89).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BSQPSettings:
    """Static solver configuration (hashable; a jit static argument)."""

    N: int = 32
    max_sqp_iters: int = 5
    max_pcg_iters: int = 100
    solve_ratio: float = 1.0
    num_alphas: int = 8  # settings.h:15
    integrator_type: int = 2  # trapezoidal default, integrator.cuh:20
    adapt_rho: bool = True
    linear_solver: str = "pcg"  # "pcg": the reference's preconditioned CG
    # (pcg.cuh), and the only choice the whole-solve/fused-iteration Pallas
    # kernels support — fastest at small batch where those engage; "btd":
    # direct block-tridiagonal factorization (exact duals), fastest at
    # large batch on the staged XLA path (measured crossover: bench.py
    # pick_solver, v5e BENCH_GRID.json)
    kkt_kernel: str = "auto"  # "pallas": fused VMEM KKT kernel; "array":
    # vmapped XLA path; "auto": pallas for small batches (B < 32) on TPU
    kkt_tol: float = 1e-4  # accepted for parity; the reference's explicit
    # KKT-tolerance exit is disabled in its driver (bsqp.cuh:153 comment)
    fold_merit0: str = "auto"  # fold the warm-start baseline merit into the
    # first alpha sweep as an alpha=0 column: "auto" (small batch, only when
    # it doesn't grow the Pallas merit tile count), "on", "off"
    pcg_kernel: str = "auto"  # "pallas": whole Krylov loop in one VMEM
    # kernel (ops/pallas_pcg.py, the reference's persistent-kernel design);
    # "xla": lax.while_loop; "auto": pallas on TPU at small batch
    iter_kernel: str = "auto"  # "fused": the whole KKT+Schur+PCG+dz
    # iteration core in ONE VMEM kernel (ops/pallas_iter.py — the TPU
    # analogue of the reference's persistent-kernel solve); "off": staged
    # kernels; "auto": fused on TPU at small batch with the pcg solver
    solve_kernel: str = "auto"  # "fused": the ENTIRE solve — SQP loop, merit
    # sweep, line search, rho schedule — in ONE Pallas kernel launch
    # (ops/pallas_solve.py); "off": per-stage/per-iteration kernels; "auto":
    # fused on TPU at any batch for N <= 128. Default flipped to "auto" from
    # v5e measurements (tools/tune_gates.py, round 3): the megakernel wins
    # EVERY measured cell, e.g. N=8 B=1 37us vs 216us staged, N=32 B=1 50us
    # vs 149us, N=32 B=512 1.06ms vs 2.57ms btd — with on-chip real-body
    # parity recorded in TPU_KERNEL_PARITY.json. Exit semantics are the
    # reference's whole-batch solve_ratio exit at EVERY scale: one launch
    # within a single grid chunk (B <= solve_capacity(N), unsharded), and
    # the chained per-iteration driver with a globally-reduced (psum'd
    # under shard_map) convergence count beyond that
    # (ops/pallas_solve.py::sqp_solve_pallas_chained).


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HyperParams:
    """Per-lane batched hyperparameters (shape (B,) each)."""

    rho: jax.Array
    drho: jax.Array
    mu: jax.Array
    pcg_tol: jax.Array

    @staticmethod
    def create(batch_size: int, rho=1e-3, mu=10.0, pcg_tol=1e-5, dtype=jnp.float32):
        full = lambda v: jnp.full((batch_size,), v, dtype=dtype)
        return HyperParams(rho=full(rho), drho=full(1.0), mu=full(mu),
                           pcg_tol=full(pcg_tol))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SQPStats:
    """Per-solve statistics, the pytree analogue of SQPStats
    (gato/types.cuh:46-59 -> bindings.cu:96-147)."""

    sqp_iters: jax.Array  # (B,) int32: per-lane iteration at which the lane
    # converged (pcg_iters==0), or iterations run if it never did. (The
    # reference's h_sqp_iters_B_ counter, bsqp.cuh:141-163, degenerates to
    # the global count for every lane; see solver/bsqp.py.)
    kkt_converged: jax.Array  # (B,) int32
    pcg_iters: jax.Array  # (max_sqp_iters, B) int32
    ls_min_merit: jax.Array  # (max_sqp_iters, B)
    ls_step_size: jax.Array  # (max_sqp_iters, B)
    initial_merit: jax.Array  # (B,) merit of the warm start
    final_merit: jax.Array  # (B,) merit of the returned trajectory
    num_iters_run: jax.Array  # () int32: SQP iterations actually executed
