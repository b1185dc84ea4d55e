"""Multi-chip scale-out: shard the solve batch across a device mesh.

This is a NEW capability relative to the reference, which is single-GPU only
(SURVEY.md §2.3: no NCCL/MPI anywhere). The batch axis is the natural data-
parallel axis: each chip owns B/n_devices lanes; the only cross-chip
communication in the whole SQP solve is the scalar `num_solved` reduction for
the solve_ratio early exit (an AllReduce over ICI), plus optional best-lane
selection at the end — exactly the collectives story from the scaling
playbook (mesh + sharding annotations, XLA inserts the psum).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cost import CostParams
from ..robots.model import RobotModel
from ..solver.bsqp import solve_batched
from ..solver.types import BSQPSettings, HyperParams

BATCH_AXIS = "batch"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (local or provided) devices, batch axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialization (jax.distributed). Call once per process
    before creating the mesh; no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_solve_args(mesh: Mesh, X, U, lam, x_s, ref, f_ext, hp: HyperParams):
    """Place the batch-leading arrays with the batch axis sharded over the
    mesh; returns device arrays ready for the jitted solve."""
    sb = NamedSharding(mesh, P(BATCH_AXIS))
    put = lambda a: jax.device_put(a, sb)
    hp_s = HyperParams(put(hp.rho), put(hp.drho), put(hp.mu), put(hp.pcg_tol))
    return (put(X), put(U), put(lam), put(x_s), put(ref), put(f_ext), hp_s)


@partial(jax.jit, static_argnames=("mesh", "settings"))
def _solve_batched_shard_map(mesh: Mesh, model: RobotModel,
                             settings: BSQPSettings, cp: CostParams,
                             hp: HyperParams, X, U, lam, x_s, ref, f_ext, dt):
    """shard_map over the batch axis: each chip runs the FULL single-chip
    solve — including the whole-solve/fused-iteration Pallas kernels, which
    GSPMD cannot auto-partition — on its local lanes, and the only
    cross-chip collective is the scalar psum of the solve_ratio convergence
    count (solve_batched's axis_name), so the early-exit decision is global
    exactly like the single-chip program."""
    from gato_tpu.solver.types import SQPStats

    Pb = P(BATCH_AXIS)
    stats_specs = SQPStats(
        sqp_iters=Pb, kkt_converged=Pb, pcg_iters=P(None, BATCH_AXIS),
        ls_min_merit=P(None, BATCH_AXIS), ls_step_size=P(None, BATCH_AXIS),
        initial_merit=Pb, final_merit=Pb, num_iters_run=P())
    f = jax.shard_map(
        lambda model, cp, hp, X, U, lam, x_s, ref, f_ext, dt: solve_batched(
            model, settings, cp, hp, X, U, lam, x_s, ref, f_ext, dt,
            axis_name=BATCH_AXIS),
        mesh=mesh,
        in_specs=(P(), P(), Pb, Pb, Pb, Pb, Pb, Pb, Pb, P()),
        out_specs=(Pb, Pb, Pb, Pb, stats_specs),
        # the static varying-axes checker rejects the solver's inner
        # while_loops (constant-initialized per-lane carries become varying);
        # correctness is asserted dynamically by the sharded-vs-unsharded
        # equality tests (tests/test_sharding.py)
        check_vma=False,
    )
    return f(model, cp, hp, X, U, lam, x_s, ref, f_ext, dt)


def solve_batched_sharded(model: RobotModel, settings: BSQPSettings,
                          cp: CostParams, hp: HyperParams,
                          X, U, lam, x_s, ref, f_ext, dt):
    """The batched solve under SPMD. Inputs placed by shard_solve_args carry
    a NamedSharding whose mesh drives an explicit shard_map (required so the
    Pallas megakernel runs per-chip on local lanes); unsharded inputs fall
    back to the plain single-chip jit."""
    sh = getattr(X, "sharding", None)
    if isinstance(sh, NamedSharding) and BATCH_AXIS in sh.mesh.axis_names:
        return _solve_batched_shard_map(sh.mesh, model, settings, cp, hp,
                                        X, U, lam, x_s, ref, f_ext, dt)
    from ..solver.bsqp import solve_batched_jit
    return solve_batched_jit(model, settings, cp, hp, X, U, lam, x_s, ref,
                             f_ext, dt)


def best_lane(stats_final_merit):
    """Global argmin over the (possibly sharded) per-lane final merits; under
    SPMD this lowers to an all-gather + argmin. Non-finite merits (a dead
    lane whose solve diverged) are masked to +inf — numpy/XLA argmin would
    otherwise SELECT the NaN lane."""
    m = stats_final_merit
    return jnp.argmin(jnp.where(jnp.isfinite(m), m, jnp.inf))
