"""Batched SQP (BSQP) driver: the full solve as one jitted on-device program.

Re-design of the reference driver BSQP<T,B>::solve (gato/bsqp/bsqp.cuh:103-197).
Differences forced by TPU-native design:
  - the reference's per-iteration device->host sync for the convergence check
    (bsqp.cuh:133-165) becomes a `lax.while_loop` predicate — the entire
    multi-iteration solve is a single XLA program with no host round trips;
  - the solve_ratio partial-batch early exit becomes part of the while
    condition (the exiting iteration skips merit/line-search, matching the
    reference's `break` placement before the merit kernel).

Per-iteration pipeline (matching bsqp.cuh:121-177):
  KKT setup -> Schur condensation -> masked batched PCG -> dz recovery ->
  convergence bookkeeping -> 8-alpha merit sweep -> line search + rho update.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.kkt import setup_kkt
from ..ops.pallas_kkt import setup_kkt_pallas
from ..ops.linesearch import line_search_update
from ..ops.merit import default_alphas
from ..ops.merit_fast import merit_alphas_batched
from ..ops.pallas_merit import merit_alphas_batched_pallas
from ..ops.btd_solve import btd_solve_batched
from ..ops.pcg import pcg_solve_batched
from ..ops.pallas_pcg import pcg_solve_batched_pallas
from ..ops.pallas_iter import sqp_iter_pallas
from ..ops.pallas_solve import sqp_solve_pallas
from ..ops.schur import build_schur, compute_dz
from ..robots.model import RobotModel
from ..ops.cost import CostParams
from ..ops.integrators import sim_step
from .types import BSQPSettings, HyperParams, SQPStats


def solve_batched(
    model: RobotModel,
    settings: BSQPSettings,
    cp: CostParams,
    hp: HyperParams,
    X,  # (B, N, nx)
    U,  # (B, N-1, nu)
    lam,  # (B, N, nx) warm-started duals
    x_s,  # (B, nx) measured initial state
    ref,  # (B, N, 6) EE reference trajectory
    f_ext,  # (B, 6) per-lane external wrench hypotheses
    dt,  # scalar timestep
    axis_name=None,  # set inside shard_map: batch-mesh axis to psum the
    # solve_ratio convergence count over, preserving the reference's
    # whole-batch early-exit semantics (bsqp.cuh:141-163) across chips
):
    """Run the batched SQP solve. Returns (X, U, lam, hp_out, stats)."""
    B = X.shape[0]
    itype = settings.integrator_type

    # Whole-solve megakernel: SQP loop + merit + line search in ONE Pallas
    # launch (ops/pallas_solve.py). "fused" forces it on any backend
    # (interpret mode in CI); "auto" engages it on TPU for every horizon the
    # kernel supports (N <= 128) at ANY batch — v5e A/B (tools/tune_gates.py
    # big, round 3) shows it beating both the staged path and the direct BTD
    # solve at every measured chunk count (1-16 chunks, e.g. N=32 B=512:
    # 1.06 ms fused vs 2.57 ms btd). Exit semantics: within one grid chunk
    # (B <= solve_capacity(N), unsharded) the one-launch kernel's
    # solve_ratio exit already IS the reference's whole-batch exit
    # (bsqp.cuh:141-165); beyond one chunk, or under shard_map (the count
    # must be psum'd across chips), the chained driver launches one
    # iteration at a time with a global count between launches — same
    # semantics at every scale.
    use_solve_kernel = settings.linear_solver == "pcg" and (
        settings.solve_kernel == "fused"
        or (settings.solve_kernel == "auto"
            and settings.N <= 128 and jax.default_backend() == "tpu")
    )
    if use_solve_kernel:
        from ..ops.pallas_solve import solve_capacity
        one_launch = B <= solve_capacity(settings.N) and axis_name is None
        if one_launch:
            (Xo, Uo, lam_o, rho_o, _drho, conv, merit0, merit_f, iters_run,
             pcg_it, ls_merit, ls_step) = sqp_solve_pallas(
                model, cp, X, U, lam, x_s, ref, f_ext, hp.rho, hp.drho,
                hp.mu, hp.pcg_tol, dt, settings.N, settings.max_sqp_iters,
                settings.max_pcg_iters, settings.num_alphas, itype,
                settings.adapt_rho, settings.solve_ratio)
        else:
            from ..ops.pallas_solve import sqp_solve_pallas_chained
            (Xo, Uo, lam_o, rho_o, _drho, conv, merit0, merit_f, iters_run,
             pcg_it, ls_merit, ls_step) = sqp_solve_pallas_chained(
                model, cp, X, U, lam, x_s, ref, f_ext, hp.rho, hp.drho,
                hp.mu, hp.pcg_tol, dt, settings.N, settings.max_sqp_iters,
                settings.max_pcg_iters, settings.num_alphas, itype,
                settings.adapt_rho, settings.solve_ratio,
                axis_name=axis_name)
        # drho resets to its init after every solve (bsqp.cuh:189)
        hp_out = HyperParams(rho=rho_o, drho=hp.drho, mu=hp.mu,
                             pcg_tol=hp.pcg_tol)
        stats = SQPStats(
            sqp_iters=iters_run.astype(jnp.int32),
            kkt_converged=conv.astype(jnp.int32),
            pcg_iters=pcg_it,
            ls_min_merit=ls_merit,
            ls_step_size=ls_step,
            initial_merit=merit0,
            final_merit=merit_f,
            num_iters_run=(jax.lax.pmax(jnp.max(iters_run), axis_name)
                           if axis_name is not None
                           else jnp.max(iters_run)).astype(jnp.int32),
        )
        return Xo, Uo, lam_o, hp_out, stats

    alphas = default_alphas(settings.num_alphas, dtype=X.dtype)

    # The Pallas kernel keeps the whole per-knot pipeline in VMEM; on CPU it
    # would run interpreted, so fall back to the XLA channelized path there.
    merit_fn = (merit_alphas_batched_pallas
                if jax.default_backend() == "tpu" else merit_alphas_batched)

    def merit_b(X_, U_, xs_, ref_, fe_, mu_):
        one = jnp.ones((1,), X_.dtype)
        return merit_fn(model, cp, X_, U_, jnp.zeros_like(X_),
                        jnp.zeros_like(U_), xs_, ref_, fe_, mu_, dt, one,
                        itype)[:, 0]

    # Small batches: the warm-start baseline merit (the reference's pre-loop
    # computeMeritBatched<1>, bsqp.cuh:116) is folded into the first
    # iteration's alpha sweep as an alpha=0 column — merit(xu + 0*dz) is the
    # same value, and dropping a kernel launch matters in the dispatch-bound
    # regime. Only worthwhile when the extra column doesn't grow the Pallas
    # merit kernel's 1024-item tile count (e.g. N=128 B=1: 8 alphas = 1016
    # items = 1 tile, 9 alphas = 2 tiles — measured 30% slower folded); at
    # large batch the extra sweep work always costs more than the saved
    # launch, so the standalone baseline call is kept there.
    _A = settings.num_alphas
    _M = B * (settings.N - 1)
    if settings.fold_merit0 == "auto":
        fold_merit0 = (B < 64
                       and -(-_M * (_A + 1) // 1024) == -(-_M * _A // 1024))
    else:
        fold_merit0 = settings.fold_merit0 == "on"
    alphas_ext = (jnp.concatenate([jnp.zeros((1,), X.dtype), alphas])
                  if fold_merit0 else alphas)
    merit0_up_front = (jnp.zeros(B, dtype=X.dtype) if fold_merit0
                       else merit_b(X, U, x_s, ref, f_ext, hp.mu))

    stats0 = dict(
        pcg_iters=jnp.zeros((settings.max_sqp_iters, B), dtype=jnp.int32),
        ls_min_merit=jnp.zeros((settings.max_sqp_iters, B), dtype=X.dtype),
        ls_step_size=jnp.zeros((settings.max_sqp_iters, B), dtype=X.dtype),
    )

    def cond(state):
        it = state["it"]
        return jnp.logical_and(it < settings.max_sqp_iters, ~state["exit"])

    use_pcg_g = settings.linear_solver == "pcg"
    # "fused" forces the kernel on any backend (interpret mode in CI);
    # "auto" only engages it on TPU at small batch
    # capacity of one fused-kernel grid step: 8 sublanes x (128 // segment)
    # problems; "auto" engages the kernel whenever the batch fits one step
    # (short horizons pack many problems per lane row, so the whole B=32
    # column and the small-batch half of the N=8/16 rows qualify)
    from ..ops.pallas_iter import iter_capacity
    use_fused_iter = use_pcg_g and (
        settings.iter_kernel == "fused"
        or (settings.iter_kernel == "auto"
            and B <= iter_capacity(settings.N)
            and settings.N <= 128 and jax.default_backend() == "tpu")
    )

    def fused_iter(X, U, lam, rho, converged):
        """The whole KKT+Schur+PCG+dz core in one VMEM kernel — the TPU
        persistent-kernel answer to bsqp.cuh:121-177's launch sequence."""
        return sqp_iter_pallas(
            model, cp, X, U, x_s, ref, f_ext, lam, rho, hp.pcg_tol,
            converged, dt, settings.max_pcg_iters, itype)

    def body(state):
        X, U, lam = state["X"], state["U"], state["lam"]
        rho, drho = state["rho"], state["drho"]
        converged = state["converged"]
        it = state["it"]

        # Honest chained-timing A/B on v5e (2026-08-17): the Pallas KKT
        # kernel wins only in a narrow band — moderate batch with enough
        # work items to fill its 1024-item tiles (N32/N64 B=32 measured
        # 10-30% faster); the array path wins at B=1 (the whole program is
        # scalar-lowered there and the kernel's tile padding buys nothing)
        # and at short horizons / large batch where XLA's cross-stage fusion
        # with Schur dominates.
        if use_fused_iter:
            dZX, dZU, lam, pcg_iters = fused_iter(X, U, lam, rho, converged)
            return after_solve(state, X, U, lam, rho, drho, converged, it,
                               dZX, dZU, pcg_iters)

        auto_pallas = B <= 32 and B * (settings.N - 1) >= 900
        # explicit "pallas" forces the kernel on any backend (interpret mode
        # in CI); "auto" only engages it on TPU
        use_pallas_kkt = (
            settings.kkt_kernel == "pallas"
            or (settings.kkt_kernel == "auto" and auto_pallas
                and jax.default_backend() == "tpu")
        )
        if use_pallas_kkt:
            kkt = setup_kkt_pallas(model, cp, X, U, x_s, ref, f_ext, dt, itype)
        else:
            kkt = jax.vmap(
                lambda X_, U_, xs_, ref_, fe_: setup_kkt(
                    model, cp, X_, U_, xs_, ref_, fe_, dt, itype
                )
            )(X, U, x_s, ref, f_ext)
        use_pcg = settings.linear_solver == "pcg"
        schur = jax.vmap(
            lambda k, r: build_schur(k, r, model.nq, compute_precond=use_pcg)
        )(kkt, rho)

        if use_pcg:
            # VMEM bound for the whole-loop kernel: 4 BTD matrices + vectors
            # as (B_pad, N_pad) channels
            B_pad = max(8, -(-B // 8) * 8)
            N_pad = -(-settings.N // 128) * 128
            nx = 2 * model.nq
            vmem = (4 * nx * nx + 2 * nx + 2) * B_pad * N_pad * 4
            use_pallas_pcg = (
                settings.pcg_kernel == "pallas"
                or (settings.pcg_kernel == "auto" and B <= 32
                    and vmem <= 10 * 2**20
                    and jax.default_backend() == "tpu")
            )
            if use_pallas_pcg:
                lam, pcg_iters = pcg_solve_batched_pallas(
                    schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
                    schur.gamma, lam, hp.pcg_tol, settings.max_pcg_iters,
                    skip=converged,
                )
            else:
                lam, pcg_iters = pcg_solve_batched(
                    schur.S_main, schur.S_lower, schur.P_main, schur.P_lower,
                    schur.gamma, lam, hp.pcg_tol, settings.max_pcg_iters,
                    skip=converged,
                )
        else:
            lam, pcg_iters = btd_solve_batched(
                schur.S_main, schur.S_lower, schur.gamma, lam, skip=converged,
            )
        dZX, dZU, _, _ = jax.vmap(compute_dz)(kkt, schur, lam)
        return after_solve(state, X, U, lam, rho, drho, converged, it,
                           dZX, dZU, pcg_iters)

    def after_solve(state, X, U, lam, rho, drho, converged, it,
                    dZX, dZU, pcg_iters):
        """Convergence bookkeeping + merit sweep + line search — the shared
        tail of one SQP iteration (bsqp.cuh:160-177)."""
        # A diverged PCG leaves NaN/inf in the step; zero those lanes' steps
        # so every alpha candidate (including the fold_merit0 alpha=0 column,
        # which computes X + 0*dZ) stays finite. With dZ = 0 all candidates
        # equal X, the strict-less test fails, and the line search reports
        # failure with the trajectory untouched — the reference's behavior
        # for a lane whose Krylov solve blew up (its merits go NaN, NaN <
        # merit is false, line_search.cuh:59).
        # exact reduction, not isfinite(sum(...)): a large but fully finite
        # step can overflow the f32 sum to inf and a legitimate (if doomed)
        # line-search trial would be falsely forced into rejection
        step_ok = jnp.logical_and(jnp.isfinite(dZX).all(axis=(1, 2)),
                                  jnp.isfinite(dZU).all(axis=(1, 2)))
        dZX = jnp.where(step_ok[:, None, None], dZX, 0.0)
        dZU = jnp.where(step_ok[:, None, None], dZU, 0.0)
        # Per-lane iteration count: +1 while the lane is not yet converged,
        # including the converging iteration. The reference's per-lane
        # counter (bsqp.cuh:141-163, h_sqp_iters_B_) degenerates to the
        # global iteration count for every lane (converged lanes' stale
        # pcg_iterations==0 re-trigger the increment each iteration); we
        # report the more informative "converged after k iterations" flip
        # point instead, which the hparam-batch convergence curves consume.
        prev_converged = converged
        converged = jnp.logical_or(converged, pcg_iters == 0)
        num_solved = jnp.sum(converged.astype(jnp.int32))
        total_B = B
        if axis_name is not None:
            # the one cross-chip collective in the whole solve: a scalar
            # AllReduce over ICI so every chip takes the exit decision on
            # the GLOBAL converged count, exactly like the single-chip path
            num_solved = jax.lax.psum(num_solved, axis_name)
            total_B = B * jax.lax.psum(1, axis_name)
        exit_now = num_solved >= total_B * settings.solve_ratio
        sqp_iters = state["sqp_iters"] + (~prev_converged).astype(jnp.int32)

        stats = state["stats"]
        stats = dict(
            stats, pcg_iters=stats["pcg_iters"].at[it].set(pcg_iters)
        )

        def do_ls(args):
            X, U, rho, drho, mbase, merit0, stats = args
            merits_all = merit_fn(
                model, cp, X, U, dZX, dZU, x_s, ref, f_ext, hp.mu, dt,
                alphas_ext, itype,
            )
            if fold_merit0:
                # column 0 is the alpha=0 baseline merit(xu); use it as the
                # first iteration's baseline
                mbase = jnp.where(it == 0, merits_all[:, 0], mbase)
                merit0 = jnp.where(it == 0, merits_all[:, 0], merit0)
                merits = merits_all[:, 1:]
            else:
                merits = merits_all

            ls = jax.vmap(
                lambda m, mb, X_, U_, dx_, du_, r_, dr_: line_search_update(
                    m, mb, alphas, X_, U_, dx_, du_, r_, dr_,
                    adapt_rho=settings.adapt_rho,
                )
            )(merits, mbase, X, U, dZX, dZU, rho, drho)
            X, U, mbase, step, rho, drho = ls
            stats = dict(
                stats,
                ls_min_merit=stats["ls_min_merit"].at[it].set(mbase),
                ls_step_size=stats["ls_step_size"].at[it].set(step),
            )
            return X, U, rho, drho, mbase, merit0, stats

        def skip_ls(args):
            X, U, rho, drho, mbase, merit0, stats = args
            if fold_merit0:
                # early exit before the sweep ran: materialize the warm-start
                # merit for the stats (the reference computed it up front)
                m0 = merit_b(X, U, x_s, ref, f_ext, hp.mu)
                mbase = jnp.where(it == 0, m0, mbase)
                merit0 = jnp.where(it == 0, m0, merit0)
            return X, U, rho, drho, mbase, merit0, stats

        X, U, rho, drho, mbase, merit0, stats = jax.lax.cond(
            exit_now,
            skip_ls,
            do_ls,
            (X, U, rho, drho, state["merit_baseline"],
             state["initial_merit"], stats),
        )

        return dict(
            X=X, U=U, lam=lam, rho=rho, drho=drho,
            merit_baseline=mbase, initial_merit=merit0, converged=converged,
            sqp_iters=sqp_iters, stats=stats, it=it + 1, exit=exit_now,
        )

    state = dict(
        X=X, U=U, lam=lam, rho=hp.rho, drho=hp.drho,
        merit_baseline=merit0_up_front,
        initial_merit=merit0_up_front,
        converged=jnp.zeros(B, dtype=bool),
        sqp_iters=jnp.zeros(B, dtype=jnp.int32),
        stats=stats0, it=jnp.int32(0), exit=jnp.asarray(False),
    )
    if settings.max_sqp_iters == 1:
        # single-iteration configuration (the benchmark default): unroll —
        # the body runs exactly once, no loop machinery needed
        state = body(state)
    else:
        state = jax.lax.while_loop(cond, body, state)

    final_merit = merit_b(
        state["X"], state["U"], x_s, ref, f_ext, hp.mu
    )

    # The reference resets drho to its init after every solve (bsqp.cuh:189)
    # but keeps rho; reset_rho() is an explicit API call.
    hp_out = HyperParams(rho=state["rho"], drho=hp.drho, mu=hp.mu,
                         pcg_tol=hp.pcg_tol)
    stats = SQPStats(
        sqp_iters=state["sqp_iters"],
        kkt_converged=state["converged"].astype(jnp.int32),
        pcg_iters=state["stats"]["pcg_iters"],
        ls_min_merit=state["stats"]["ls_min_merit"],
        ls_step_size=state["stats"]["ls_step_size"],
        initial_merit=state["initial_merit"],
        final_merit=final_merit,
        num_iters_run=state["it"],
    )
    return state["X"], state["U"], state["lam"], hp_out, stats


@partial(jax.jit, static_argnames=("integrator_type",))
def sim_forward_batched(model: RobotModel, x, u, f_ext_B, dt,
                        integrator_type: int = 2):
    """One dynamics step of a shared (x, u) under each lane's wrench
    hypothesis — the force-estimator scoring path
    (gato/bsqp/kernels/sim.cuh:14-86). Returns (B, nx). Jitted: called
    un-jitted it dispatches hundreds of eager ops per call, which costs
    seconds per MPC cycle on this image's tunneled TPU runtime."""
    return jax.vmap(
        lambda fe: sim_step(model, x, u, dt, fe, integrator_type)
    )(f_ext_B)


@partial(jax.jit, static_argnames=("settings",))
def solve_batched_jit(model, settings, cp, hp, X, U, lam, x_s, ref, f_ext, dt):
    return solve_batched(model, settings, cp, hp, X, U, lam, x_s, ref, f_ext, dt)
