"""Bound the multichip program's overhead on a single chip (VERDICT r3 #7).

Real multi-chip hardware isn't reachable from this image, but the multichip
program itself is runnable today: shard_map over a 1-device mesh builds the
exact per-chip program the fleet runs — the chained per-iteration megakernel
driver with the global solve_ratio psum (parallel/sharding.py) — so timing it
against the plain single-chip jit bounds the dispatch/collective/chaining
overhead a real fleet would pay per chip.

Timing is the honest chained closed-loop method (bench.bench_solve's device
protocol, utils/timing.py:time_loop_fn); both arms run the identical
steady-state fig-8 MPC cycle, only the solve entry differs.

Usage (TPU): python tools/shardmap_overhead.py [--cells 32:32,32:512]
             [--out SCALING.json]
"""

import argparse
import json
import sys


def measure(N, B, sharded: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import steady_state_problem, pick_solver
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS
    from gato_tpu.solver.bsqp import solve_batched, solve_batched_jit
    from gato_tpu.solver.types import BSQPSettings
    from gato_tpu.utils.timing import time_loop_fn
    from gato_tpu.parallel.sharding import (BATCH_AXIS, make_mesh)
    from jax.sharding import PartitionSpec as P

    p = DEFAULT_SOLVER_PARAMS
    settings = BSQPSettings(N=N, max_sqp_iters=p["max_sqp_iters"],
                            max_pcg_iters=p["max_pcg_iters"],
                            linear_solver=pick_solver(N, B, "auto"))
    (model, cp, hp, X, U, lam, x_s, ref, f_ext, dtj, traj,
     step) = steady_state_problem(N, B, settings=settings)
    nx = model.nx
    traj_dev = jnp.asarray(traj.astype(np.float32))
    T = traj_dev.shape[0]

    from gato_tpu.ops.pallas_sim import rk4_step_batched_pallas

    mesh = make_mesh(jax.devices()[:1])
    Pb = P(BATCH_AXIS)

    def solve_plain(Xc, Uc, lamc, xsc, refc):
        return solve_batched(model, settings, cp, hp, Xc, Uc, lamc, xsc,
                             refc, f_ext, dtj)[:4]

    # the per-chip program of parallel/sharding.py:_solve_batched_shard_map,
    # without the stats plumbing (stats specs don't change the solve)
    def solve_shard(Xc, Uc, lamc, xsc, refc):
        return jax.shard_map(
            lambda Xc, Uc, lamc, xsc, refc, fe: solve_batched(
                model, settings, cp, hp, Xc, Uc, lamc, xsc, refc, fe, dtj,
                axis_name=BATCH_AXIS)[:4],
            mesh=mesh, in_specs=(Pb,) * 6, out_specs=(Pb, Pb, Pb, Pb),
            check_vma=False,
        )(Xc, Uc, lamc, xsc, refc, f_ext)

    solve = solve_shard if sharded else solve_plain

    def cycle(carry):
        Xc, Uc, lamc, xsc, i = carry
        refc = jax.lax.dynamic_slice(traj_dev, (i % (T - N), 0), (N, 6))
        refc = jnp.broadcast_to(refc[None], (B, N, 6))
        Xo, Uo, lamo, _ = solve(Xc, Uc, lamc, xsc, refc)
        xs1 = rk4_step_batched_pallas(model, xsc[:1], Uo[:1, 0], dtj,
                                      substeps=2)[0]
        xsn = jnp.broadcast_to(xs1[None], (B, nx))
        Xo = Xo.at[:, 0, :].set(xsn)
        return (Xo, Uo, lamo, xsn, i + 1)

    @jax.jit
    def run_k(X, U, lam, x_s, i0, k):
        return jax.lax.fori_loop(0, k, lambda _, c: cycle(c),
                                 (X, U, lam, x_s, i0))[0]

    args0 = (X, U, lam, x_s, jnp.int32(step + 1))
    return time_loop_fn(lambda k: run_k(*args0, jnp.int32(k)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="8:32,8:512,32:32,32:512,128:32,128:512")
    ap.add_argument("--repeats", type=int, default=3,
                    help="independent measurements per arm: the runtime's "
                         "sustained rate varies ~1.5x run to run, so a "
                         "single pair cannot bound a few-percent overhead; "
                         "min and median over repeats are both recorded")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import statistics

    import jax

    rows = {}
    for cell in args.cells.split(","):
        N, B = map(int, cell.split(":"))
        # interleave the arms so slow drift in the runtime's sustained rate
        # biases neither arm
        plain, shard = [], []
        for _ in range(args.repeats):
            plain.append(measure(N, B, sharded=False))
            shard.append(measure(N, B, sharded=True))
        p_min, s_min = min(plain), min(shard)
        p_med, s_med = statistics.median(plain), statistics.median(shard)
        rows[f"N{N}_B{B}"] = {
            "plain_us": [round(t * 1e6, 1) for t in plain],
            "shardmap1_us": [round(t * 1e6, 1) for t in shard],
            "plain_min_us": round(p_min * 1e6, 1),
            "shardmap1_min_us": round(s_min * 1e6, 1),
            "overhead_pct_min": round(100.0 * (s_min - p_min) / p_min, 1),
            "overhead_pct_median": round(100.0 * (s_med - p_med) / p_med, 1),
        }
        r = rows[f"N{N}_B{B}"]
        print(f"N={N} B={B}: plain min {p_min*1e6:.1f}us  "
              f"shard_map(1) min {s_min*1e6:.1f}us  "
              f"overhead min {r['overhead_pct_min']}% / "
              f"median {r['overhead_pct_median']}%", flush=True)

    record = {
        "meta": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "repeats": args.repeats,
            "note": "shard_map-over-mesh(1) vs plain jit, chained "
                    "closed-loop device timing, arms interleaved, "
                    ">=3 repeats each (min and median recorded; the "
                    "runtime's sustained rate varies ~1.5x run to run, so "
                    "negative cells are measurement noise, not a bound). "
                    "Bounds the multichip program's per-chip overhead "
                    "(chained per-iteration megakernel + one scalar psum "
                    "AllReduce per SQP iteration); NOT hardware scaling "
                    "(one real chip in this image).",
        },
        "cells": rows,
    }
    if args.out:
        out = record
        if args.out.endswith("SCALING.json"):
            # keep the historical CPU-mesh table alongside
            try:
                with open(args.out) as f:
                    old = json.load(f)
                out = {"shardmap_overhead_tpu": record,
                       "cpu_mesh_scaling_r2": old}
            except (OSError, ValueError):
                out = {"shardmap_overhead_tpu": record}
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"saved -> {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
