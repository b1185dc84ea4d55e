"""Mixed-plant fleets: several (plant, N, B) solver programs in one process
sharing the device mesh, with merged fleet statistics.

The reference compiles a separate CUDA module per (plant, N, batch) cell and
only ever runs one at a time (python/bindings.cu:220-266's registration
matrix). Here each fleet member is its own jitted XLA program (different nq
means different shapes — they cannot share one program), dispatched
back-to-back on the same chip or mesh: the single-chip case interleaves on
the one TPU stream, and with a mesh every member's batch axis is sharded
over the SAME devices (two SPMD programs sharing the mesh/batch budget,
SURVEY.md §7 stage 6).

Merit values are per-plant objectives, so the fleet "winner" is reported per
member AND fleet-wide; the fleet-wide argmin is only meaningful when members
share a cost scale (e.g. the same tracking task on both arms) — the report
carries both so callers choose.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from ..ops.cost import CostParams
from ..robots.model import RobotModel
from ..solver.types import BSQPSettings, HyperParams
from .sharding import shard_solve_args, solve_batched_sharded


@dataclass
class FleetMember:
    """One plant's batch of MPC subproblems plus its warm-started solver
    state. X (B,N,nx), U (B,N-1,nu), lam (B,N,nx), x_s (B,nx),
    ref (B,N,>=3), f_ext (B,6)."""
    name: str
    model: RobotModel
    settings: BSQPSettings
    cp: CostParams
    hp: HyperParams
    X: object
    U: object
    lam: object
    x_s: object
    ref: object
    f_ext: object
    dt: object


def place_member(member: FleetMember, mesh) -> FleetMember:
    """Shard the member's batch-leading arrays over the mesh's batch axis
    (each member's B must divide by the mesh size)."""
    X, U, lam, x_s, ref, f_ext, hp = shard_solve_args(
        mesh, member.X, member.U, member.lam, member.x_s, member.ref,
        member.f_ext, member.hp)
    return replace(member, X=X, U=U, lam=lam, x_s=x_s, ref=ref,
                   f_ext=f_ext, hp=hp)


def solve_fleet(members, mesh=None):
    """One batched solve per member — separate jitted programs sharing the
    process (and mesh, if given). Returns (new_members, stats_list):
    new_members carry the solved X/U/lam and updated hyperparameters as the
    next cycle's warm start."""
    if mesh is not None:
        members = [place_member(m, mesh) for m in members]
    new_members, stats_list = [], []
    for m in members:
        Xo, Uo, lam_o, hp_out, stats = solve_batched_sharded(
            m.model, m.settings, m.cp, m.hp, m.X, m.U, m.lam, m.x_s,
            m.ref, m.f_ext, m.dt)
        new_members.append(replace(m, X=Xo, U=Uo, lam=lam_o, hp=hp_out))
        stats_list.append(stats)
    return new_members, stats_list


def fleet_report(members, stats_list):
    """Merged fleet statistics: per-member convergence/best lane plus the
    fleet-wide totals and winner. Non-finite merits (dead lanes) are masked
    out of every argmin, same as parallel/sharding.py::best_lane."""
    per_member = {}
    all_merits, owners = [], []  # owners[i] = (member name, local lane)
    for m, st in zip(members, stats_list):
        merits = np.asarray(st.final_merit, np.float64)
        safe = np.where(np.isfinite(merits), merits, np.inf)
        best = int(np.argmin(safe))
        # strict-JSON safety: with every lane dead the best merit is +inf,
        # and json.dump would emit the non-standard token Infinity — report
        # null instead (the lane index stays, flagged dead)
        best_finite = np.isfinite(safe[best])
        per_member[m.name] = {
            "lanes": int(merits.shape[0]),
            "converged": int(np.asarray(st.kkt_converged).sum()),
            "best_lane": best,
            "best_merit": float(safe[best]) if best_finite else None,
            "all_lanes_dead": not bool(best_finite),
            "sqp_iters_mean": float(np.asarray(st.sqp_iters).mean()),
        }
        all_merits.append(safe)
        owners.extend((m.name, i) for i in range(merits.shape[0]))
    merged = np.concatenate(all_merits)
    win = int(np.argmin(merged))
    win_merit = float(merged[win]) if np.isfinite(merged[win]) else None
    return {
        "members": per_member,
        "total_lanes": int(merged.shape[0]),
        "total_converged": sum(v["converged"] for v in per_member.values()),
        "winner": {"member": owners[win][0], "lane": owners[win][1],
                   "merit": win_merit},
    }
