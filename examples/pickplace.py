"""Pick-and-place with a swinging pendulum payload (gato_pickplace.ipynb
analogue): iiwa14 + 15 kg pendulum on the EE (sim model only; the solver sees
the robot alone), goal sequence with reached/timeout outcomes, batch
hypotheses handle the unmodeled payload.

Two loop modes:
  default      — the host-stepped MPC_GATO loop (the reference's own loop
                 shape, python/bsqp/mpc_controller.py:361-599);
  --device-loop — the identical cycle semantics as ONE jitted lax.scan
                 (api/rollout.py::closed_loop_rollout_goals), which removes
                 the ~25 ms/hop tunnel latency of this image's TPU runtime
                 and makes the reference-scale cells (B up to 128, N up to
                 128, 5-goal sequence) runnable in seconds of device time.
"""

import argparse
import json
import os
import sys

# runnable without an editable install; never PYTHONPATH=. (CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gato_tpu.api.config import (PICKPLACE_DEFAULT_GOALS, PICKPLACE_MPC_DEFAULTS,
                                 PICKPLACE_SOLVER_PARAMS, PENDULUM_DEFAULT_PARAMS)
from gato_tpu.api.mpc import MPC_GATO


def main(batch_sizes=(1, 8, 32), N=32, goals=None, goal_timeout=None,
         dt=0.03125, viz=None):
    goals = goals or PICKPLACE_DEFAULT_GOALS
    x0 = np.zeros(14, np.float32)

    outcomes = {}
    for B in batch_sizes:
        print(f"\n=== batch {B}, pendulum "
              f"{PENDULUM_DEFAULT_PARAMS['mass']} kg ===")
        mpc = MPC_GATO(
            plant_type="iiwa14", N=N, dt=dt, batch_size=B,
            pendulum_config=PENDULUM_DEFAULT_PARAMS,
            solver_params=PICKPLACE_SOLVER_PARAMS,
            control_dt=0.002,  # ~the reference's measured solve times
        )
        _, stats = mpc.run_mpc_goals(
            x0, goals, sim_dt=0.001,
            goal_timeout=goal_timeout or PICKPLACE_MPC_DEFAULTS["goal_timeout"],
            goal_threshold=PICKPLACE_MPC_DEFAULTS["goal_threshold"],
            velocity_threshold=PICKPLACE_MPC_DEFAULTS["velocity_threshold"],
        )
        outcomes[B] = {"goal_outcomes": stats["goal_outcomes"],
                       "goal_reached_times": [
                           None if t is None else round(float(t), 3)
                           for t in stats["goal_reached_times"]]}
        if viz:
            # skeleton-strip render of the rollout (the reference notebook's
            # meshcat animation role; gato_tpu/utils/viz.py)
            from gato_tpu.utils.viz import plot_rollout
            qs = np.asarray(stats["joint_positions"])
            goal_pts = np.asarray(goals, np.float32)
            out = viz.replace(".png", f"_B{B}.png")
            plot_rollout(mpc.solver_model, qs[:: max(1, len(qs) // 120)],
                         ref=goal_pts, path=out)
            print(f"  viz -> {out}")

    print("\nsummary:")
    for B, o in outcomes.items():
        oc = o["goal_outcomes"]
        reached = sum(1 for x in oc if x == "reached")
        print(f"  B={B:4d}: {reached}/{len(oc)} goals  {oc}")
    return outcomes


def main_device(batch_sizes=(1, 8, 32, 128), N=32, goals=None,
                goal_timeout=None, control_dt=0.002, dt=0.03125, seed=0,
                score_substeps=2, viz=None, save=None, seeds=None):
    """Reference-scale acceptance runs via the on-device goals rollout.

    seeds: optional list of PRNG seeds per batch size. The estimator's
    hypothesis rotations are seeded, so goal outcomes at B>3 are a
    distribution, not a point — the sweep records every seed's outcome row
    plus a per-B min/median/max summary (the jitted rollout is compiled
    once per (N, B); extra seeds re-use it, so the sweep costs only device
    time). B<=3 runs are deterministic (no estimator) and run once."""
    import jax
    import jax.numpy as jnp

    from gato_tpu.api.mpc import add_pendulum
    from gato_tpu.api.rollout import closed_loop_rollout_goals
    from gato_tpu.ops.cost import CostParams
    from gato_tpu.robots.model import load_robot
    from gato_tpu.solver.types import BSQPSettings, HyperParams

    goals = goals or PICKPLACE_DEFAULT_GOALS
    goal_timeout = goal_timeout or PICKPLACE_MPC_DEFAULTS["goal_timeout"]
    p = PICKPLACE_SOLVER_PARAMS
    pend = PENDULUM_DEFAULT_PARAMS
    # dt=0.03125 N=32 gives the 1 s horizon of this repo's default cell;
    # the reference notebook's own working point is N=16, dt=0.01
    # (gato_pickplace.ipynb cell 1)

    model = load_robot("iiwa14")
    sim_model = add_pendulum(model, mass=pend["mass"], length=pend["length"])
    nq, nq_s, nv_s = model.nq, sim_model.nq, sim_model.nv
    x_sim0 = np.zeros(nq_s + nv_s, np.float32)
    x_sim0[nq:nq + 3] = pend["initial_angle"]

    settings = BSQPSettings(N=N, max_sqp_iters=p["max_sqp_iters"],
                            max_pcg_iters=p["max_pcg_iters"],
                            kkt_tol=p["kkt_tol"])
    cp = CostParams.create(q_cost=p["q_cost"], qd_cost=p["qd_cost"],
                           u_cost=p["u_cost"], N_cost=p["N_cost"],
                           q_lim_cost=p["q_lim_cost"])
    goals_j = jnp.asarray(np.asarray(goals, np.float32))
    n_steps = int(np.ceil(goal_timeout * len(goals) / control_dt)) + 2

    results = {}
    sweep = {}
    for B in batch_sizes:
        run_seeds = list(seeds) if (seeds and B > 3) else [seed]
        per_seed = []
        for s in run_seeds:
            print(f"\n=== device-loop batch {B}, N={N}, seed {s}, pendulum "
                  f"{pend['mass']} kg, {n_steps} cycles ===", flush=True)
            hp = HyperParams.create(B, rho=p["rho"], mu=p["mu"],
                                    pcg_tol=p["pcg_tol"])
            xs, ees, dists, gidx, bests, oc, rt, fests, radii = \
                closed_loop_rollout_goals(
                model, sim_model, settings, cp, hp, jnp.asarray(x_sim0),
                goals_j, jnp.float32(dt), jnp.float32(control_dt),
                jax.random.PRNGKey(s), batch_size=B, n_steps=n_steps,
                goal_timeout=float(goal_timeout),
                goal_threshold=float(PICKPLACE_MPC_DEFAULTS["goal_threshold"]),
                velocity_threshold=float(
                    PICKPLACE_MPC_DEFAULTS["velocity_threshold"]),
                sim_substeps=2, pendulum_damping=float(pend["damping"]),
                # RK4-substepped hypothesis scoring (the plant's own
                # integrator cadence): the host-faithful one-step score is
                # noise-dominated at 2 ms cycles and large B (TPU A/B:
                # B=128 2/5 -> 4/5 goals)
                score_substeps=score_substeps)
            oc = np.asarray(oc)
            rt = np.asarray(rt)
            names = {0: "not_reached", 1: "reached", 2: "timeout"}
            outc = [names[int(c)] for c in oc]
            reached = int((oc == 1).sum())
            f_end = np.asarray(fests)[-1]
            row = {
                "goal_outcomes": outc,
                "goal_reached_times": [round(float(t), 3) if t >= 0 else None
                                       for t in rt],
                "goals_reached": reached,
                "final_dist_m": round(float(np.asarray(dists)[-1]), 4),
                "score_substeps": score_substeps,
                "seed": s,
                "force_estimate_end_N": [round(float(v), 1)
                                         for v in f_end[:3]],
            }
            per_seed.append(row)
            if s == run_seeds[0]:
                results[str(B)] = row
            print(f"  B={B:4d} seed {s}: {reached}/{len(goals)} goals  "
                  f"{outc}", flush=True)
        if len(per_seed) > 1:
            gs = sorted(r["goals_reached"] for r in per_seed)
            sweep[str(B)] = {
                "seeds": run_seeds,
                "goals_reached_per_seed": [r["goals_reached"]
                                           for r in per_seed],
                "min": gs[0], "median": gs[len(gs) // 2], "max": gs[-1],
                "rows": per_seed,
            }
            print(f"  B={B:4d} sweep: goals min/med/max = "
                  f"{gs[0]}/{gs[len(gs)//2]}/{gs[-1]}", flush=True)
        if viz:
            from gato_tpu.utils.viz import plot_rollout
            qs = np.asarray(xs)[:, :nq_s]
            out = viz.replace(".png", f"_N{N}_B{B}.png")
            plot_rollout(sim_model, qs[:: max(1, len(qs) // 120)],
                         ref=np.asarray(goals, np.float32), path=out)
            print(f"  viz -> {out}")

    if save:
        rec = {}
        if os.path.exists(save):
            with open(save) as f:
                rec = json.load(f)
        import jax
        rec.setdefault("meta", {})
        rec["meta"]["workload"] = (
            "iiwa14 + 15 kg pendulum payload (sim model only), 5-goal "
            "pick-and-place sequence, PICKPLACE params (5 SQP iters), "
            "control_dt=%g, sphere ForceEstimator hypotheses; outcomes per "
            "mpc_controller.py:509-525. Rows carry their solver dt and the "
            "hypothesis-scoring mode (score_substeps: 0 = the host loop's "
            "one-step solver-integrator score, >0 = RK4-substepped at the "
            "plant's cadence)." % control_dt)
        rec["meta"]["scoring_ab_tpu"] = (
            "N16 dt=0.01 5-goal TPU A/B: one-step score B=32 3/5, B=128 "
            "2/5; RK4-substep score B=32 3/5, B=128 4/5 — the one-step "
            "ranking is noise-dominated at 2 ms cycles and large B. Force "
            "estimate converges to the payload (z ~ -100..-141 N vs true "
            "-147 N) under both.")
        suffix = "" if dt == 0.03125 else f"_dt{dt:g}"
        for B, r in results.items():
            r["backend"] = jax.default_backend()
            r["dt"] = dt
            rec[f"N{N}_B{B}{suffix}"] = r
        for B, s in sweep.items():
            s["backend"] = jax.default_backend()
            s["dt"] = dt
            rec[f"N{N}_B{B}{suffix}_seed_sweep"] = s
        with open(save, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"saved -> {save}")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--viz", default=None,
                    help="write rollout skeleton PNGs here (e.g. pp.png)")
    ap.add_argument("--device-loop", action="store_true",
                    help="run the on-device goals rollout (reference-scale "
                         "cells; records PICKPLACE_RESULTS.json-style rows)")
    ap.add_argument("--control-dt", type=float, default=0.002)
    ap.add_argument("--dt", type=float, default=0.03125,
                    help="solver discretization (the reference notebook's "
                         "own working point is --N 16 --dt 0.01)")
    ap.add_argument("--goal-timeout", type=float, default=None)
    ap.add_argument("--score-substeps", type=int, default=2,
                    help="hypothesis-scoring integrator substeps (0 = the "
                         "host loop's one-step solver-integrator score)")
    ap.add_argument("--seeds", type=int, nargs="+", default=None,
                    help="device-loop estimator seeds to sweep per B>3 "
                         "cell (outcomes are a distribution; extra seeds "
                         "re-use the compiled rollout)")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()
    if args.device_loop:
        main_device(tuple(args.batch_sizes), args.N, viz=args.viz,
                    control_dt=args.control_dt, dt=args.dt,
                    goal_timeout=args.goal_timeout,
                    score_substeps=args.score_substeps, save=args.save,
                    seeds=args.seeds)
    else:
        main(tuple(args.batch_sizes), args.N,
             goal_timeout=args.goal_timeout, dt=args.dt, viz=args.viz)
