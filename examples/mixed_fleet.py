"""Mixed indy7 + iiwa14 fleet in one process (SURVEY.md §7 stage 6).

Two plants with different DOF counts cannot share one XLA program, so the
fleet runs as two jitted solver programs dispatched back-to-back each MPC
cycle — on one chip they interleave on the device stream; with --mesh every
member's batch axis is sharded over the same devices. Each member tracks a
figure-8 EE reference sized to its own workspace, carries per-lane external
wrench hypotheses (lane 0 = zero, the hypothesis driving the simulation),
and the merged fleet report (gato_tpu/parallel/fleet.py) combines
convergence counts and the per-member + fleet-wide best lanes.

The reference runs one compiled (plant, N, B) module at a time
(python/bindings.cu:220-266); a concurrent mixed fleet with merged stats is
new capability.

Usage: python examples/mixed_fleet.py [--cycles 60] [--B 8] [--N 8]
       [--mesh] [--save mixed_fleet_results.json]
"""

import argparse
import dataclasses
import json
import os
import sys

# runnable as `python examples/mixed_fleet.py` without an editable install.
# Do NOT use PYTHONPATH=. instead: pre-pending the repo root to every
# process's path shadows a module the axon TPU plugin imports and kills its
# registration (CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gato_tpu.api.common import figure8, rk4_step
from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
from gato_tpu.dynamics.algorithms import ee_position
from gato_tpu.ops.cost import CostParams
from gato_tpu.parallel.fleet import FleetMember, fleet_report, solve_fleet
from gato_tpu.parallel.sharding import make_mesh
from gato_tpu.robots.model import load_robot
from gato_tpu.solver.types import BSQPSettings, HyperParams


def make_member(name, plant, q0, fig8_offset, B, N, dt, seed, amp=0.4):
    p = DEFAULT_SOLVER_PARAMS
    model = load_robot(plant)
    settings = BSQPSettings(N=N, max_sqp_iters=p["max_sqp_iters"],
                            max_pcg_iters=p["max_pcg_iters"])
    cp = CostParams.create(q_cost=p["q_cost"], qd_cost=p["qd_cost"],
                           u_cost=p["u_cost"], N_cost=p["N_cost"],
                           q_lim_cost=p["q_lim_cost"])
    hp = HyperParams.create(B, rho=p["rho"], mu=p["mu"],
                            pcg_tol=p["pcg_tol"])
    x0 = np.concatenate([q0, np.zeros_like(q0)]).astype(np.float32)
    traj = figure8(dt, A_x=amp, A_z=amp, offset=fig8_offset).reshape(-1, 6)
    rng = np.random.default_rng(seed)
    f_ext = rng.uniform(-5.0, 5.0, (B, 6)).astype(np.float32)
    f_ext[0] = 0.0  # the zero hypothesis drives the simulation
    member = FleetMember(
        name=name, model=model, settings=settings, cp=cp, hp=hp,
        X=jnp.asarray(np.tile(x0, (B, N, 1))),
        U=jnp.zeros((B, N - 1, model.nu), jnp.float32),
        lam=jnp.zeros((B, N, model.nx), jnp.float32),
        x_s=jnp.asarray(np.tile(x0, (B, 1))),
        ref=jnp.asarray(np.tile(traj[:N], (B, 1, 1)).astype(np.float32)),
        f_ext=jnp.asarray(f_ext),
        dt=jnp.float32(dt),
    )
    return member, traj


def device_cycle_time(members, trajs, N):
    """Sustained per-cycle DEVICE time of the whole fleet cycle (both
    members' solves + lane-0 sim + rolled reference windows) by chaining k
    cycles in one jitted fori_loop (utils/timing.py:time_loop_fn — the only
    trustworthy protocol on this image's tunneled runtime)."""
    from gato_tpu.solver.bsqp import solve_batched
    from gato_tpu.utils.timing import time_loop_fn

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from gato_tpu.ops.pallas_sim import rk4_step_batched_pallas

    trajd = [jnp.asarray(trajs[m.name].astype(np.float32)) for m in members]

    def cycle(carry):
        i, states = carry
        new_states = []
        for m, td, st in zip(members, trajd, states):
            X, U, lam, x_s = st
            T = td.shape[0]
            ref = jax.lax.dynamic_slice(td, (i % (T - N), 0), (N, 6))
            B_m = X.shape[0]
            refc = jnp.broadcast_to(ref[None], (B_m, N, 6))
            Xo, Uo, lamo, _, _ = solve_batched(
                m.model, m.settings, m.cp, m.hp, X, U, lam, x_s, refc,
                m.f_ext, m.dt)
            if on_tpu:
                xs1 = rk4_step_batched_pallas(m.model, x_s[:1], Uo[:1, 0],
                                              m.dt, substeps=2)[0]
            else:
                xs1 = rk4_step(m.model, x_s[0], Uo[0, 0], m.dt, substeps=2)
            xsn = jnp.broadcast_to(xs1[None], (B_m, X.shape[2]))
            Xo = Xo.at[:, 0, :].set(xsn)
            new_states.append((Xo, Uo, lamo, xsn))
        return (i + 1, tuple(new_states))

    @jax.jit
    def run_k(states, k):
        return jax.lax.fori_loop(0, k, lambda _, c: cycle(c),
                                 (jnp.int32(1), states))[1]

    states0 = tuple((m.X, m.U, m.lam, m.x_s) for m in members)
    return time_loop_fn(lambda k: run_k(states0, jnp.int32(k)))


def main(cycles=60, B=8, N=8, dt=0.01, use_mesh=False, save=None,
         device_time=False):
    specs = [
        ("indy7", INDY7_START_CONFIGS["ready"].astype(np.float32),
         (0.0, 0.5, 0.6), 0.4),
        # fig-8 centered on the start EE and sized to stay WELL inside the
        # ~0.8 m workspace: rotated start point of figure8 (offset (a,b,c),
        # theta=pi/4) is ((a-b)/sqrt2, (a+b)/sqrt2, c + A/2), matched to
        # ee_position(q0) = (0.556, 0.0, 0.335). An over-reach curve makes
        # closed-loop tracking chaotic (unreachable arcs + joint-limit
        # barriers) and backend-sensitive.
        ("iiwa14", np.asarray([0.0, 0.7, 0.0, -1.6, 0.0, 1.0, 0.0],
                              np.float32),
         (0.393, -0.393, 0.21), 0.25),
    ]
    members, trajs, sims, errs = [], {}, {}, {}
    for name, q0, off, amp in specs:
        m, traj = make_member(name, name, q0, off, B, N, dt, seed=0, amp=amp)
        members.append(m)
        trajs[name] = traj
        sims[name] = jax.jit(lambda x, u, mdl=m.model: rk4_step(
            mdl, x, u, jnp.float32(dt), substeps=4))
        errs[name] = []

    mesh = make_mesh() if use_mesh else None
    if mesh is not None:
        assert B % len(mesh.devices.ravel()) == 0, (
            "each member's batch must divide the mesh")

    report = None
    for k in range(cycles):
        members, stats = solve_fleet(members, mesh=mesh)
        report = fleet_report(members, stats)
        nxt = []
        for m in members:
            traj = trajs[m.name]
            # lane 0 (zero-wrench hypothesis) controls the simulated arm
            x1 = sims[m.name](m.x_s[0], m.U[0, 0])
            ee = ee_position(m.model, x1[:m.model.nq])[:3]
            errs[m.name].append(float(jnp.linalg.norm(
                ee - jnp.asarray(traj[k + 1, :3]))))
            B_m = m.X.shape[0]
            x_s = jnp.tile(x1, (B_m, 1))
            ref = jnp.asarray(np.tile(traj[k + 1:k + 1 + N], (B_m, 1, 1))
                              .astype(np.float32))
            nxt.append(dataclasses.replace(
                m, x_s=x_s, ref=ref, X=m.X.at[:, 0, :].set(x_s)))
        members = nxt

    steady = cycles // 4
    out = {"cycles": cycles, "B_per_member": B, "N": N,
           "total_lanes": B * len(members),
           "mesh": None if mesh is None else len(mesh.devices.ravel()),
           "final_report": report,
           "tracking_err_m": {
               n: {"mean": round(float(np.mean(e[steady:])), 4),
                   "max": round(float(np.max(e[steady:])), 4)}
               for n, e in errs.items()}}
    if device_time:
        t = device_cycle_time(members, trajs, N)
        out["per_cycle_device_us"] = round(t * 1e6, 1)
        out["lane_solves_per_s"] = round(B * len(members) / t, 1)
        print(f"fleet per-cycle device time: {t*1e6:.1f} us "
              f"({out['lane_solves_per_s']:.0f} lane-solves/s)")
    print(json.dumps(out, indent=1))
    if save:
        with open(save, "w") as f:
            json.dump(out, f, indent=1)
        print(f"saved -> {save}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=60)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--mesh", action="store_true",
                    help="shard every member's batch over all devices")
    ap.add_argument("--device-time", action="store_true",
                    help="also measure the sustained per-cycle device time "
                         "of the whole fleet cycle (chained timing)")
    ap.add_argument("--save", default=None)
    a = ap.parse_args()
    main(cycles=a.cycles, B=a.B, N=a.N, use_mesh=a.mesh, save=a.save,
         device_time=a.device_time)
