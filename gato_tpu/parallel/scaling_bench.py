"""Scaling-efficiency benchmark over a device mesh (the multi-host scaling
target from BASELINE.md: >=80% efficiency to 2+ hosts).

Weak scaling: per-device batch fixed, total batch grows with the mesh. Run on
any device set: real TPU slice, multi-host (after parallel.sharding.
init_distributed), or the virtual CPU mesh
(jax.config.update('jax_platforms','cpu') + xla_force_host_platform_device_count).

Usage: python -m gato_tpu.parallel.scaling_bench [--per-device-batch 64] --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# --cpu needs the virtual-device flag set BEFORE jax initializes; re-exec
# with the environment prepared if it isn't.
if __name__ == "__main__" and "--cpu" in sys.argv:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
        os.execv(sys.executable, [sys.executable, "-m",
                                  "gato_tpu.parallel.scaling_bench"] + sys.argv[1:])

import jax
import jax.numpy as jnp

from ..api.config import DEFAULT_SOLVER_PARAMS as P
from ..ops.cost import CostParams
from ..robots.model import load_robot
from ..solver.types import BSQPSettings, HyperParams
from ..utils.timing import time_fn
from .sharding import make_mesh, shard_solve_args, solve_batched_sharded


def _problem(B, N, model):
    q0 = jnp.asarray([-1.0966, -0.099, 0.8313, -0.109, 0.497, 0.015],
                     jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(6, jnp.float32)])
    return (jnp.tile(x0, (B, N, 1)), jnp.zeros((B, N - 1, model.nu), jnp.float32),
            jnp.zeros((B, N, model.nx), jnp.float32), jnp.tile(x0, (B, 1)),
            jnp.tile(jnp.asarray([-0.3, 0.3, 0.95, 0, 0, 0], jnp.float32),
                     (B, N, 1)),
            jnp.zeros((B, 6), jnp.float32))


def run(per_device_batch=64, N=32, device_counts=None, out=None):
    model = load_robot("indy7")
    settings = BSQPSettings(N=N, max_sqp_iters=P["max_sqp_iters"],
                            max_pcg_iters=P["max_pcg_iters"])
    cp = CostParams.create(q_cost=P["q_cost"], qd_cost=P["qd_cost"],
                           u_cost=P["u_cost"], N_cost=P["N_cost"],
                           q_lim_cost=P["q_lim_cost"])
    all_devices = jax.devices()
    counts = device_counts or sorted(
        {1, 2, len(all_devices) // 2 or 1, len(all_devices)}
    )
    results = {}
    base_throughput = None
    for n in counts:
        if n > len(all_devices):
            continue
        B = per_device_batch * n
        mesh = make_mesh(all_devices[:n])
        hp = HyperParams.create(B, rho=P["rho"], mu=P["mu"], pcg_tol=P["pcg_tol"])
        args = _problem(B, N, model)
        X, U, lam, x_s, ref, fe, hp_s = shard_solve_args(mesh, *args, hp)
        dt = jnp.float32(0.01)

        def f(X, U, lam):
            return solve_batched_sharded(model, settings, cp, hp_s, X, U, lam,
                                         x_s, ref, fe, dt)

        t = time_fn(f, (X, U, lam), chain=lambda a, o: (o[0], o[1], o[2]),
                    k_small=2, k_big=12)
        thr = B / t
        if base_throughput is None:
            base_throughput = thr / n * 1  # per-device baseline at smallest n
        eff = thr / (base_throughput * n)
        results[n] = {"batch": B, "ms": round(t * 1e3, 3),
                      "solves_per_s": round(thr, 1),
                      "efficiency": round(eff, 4)}
        print(f"devices={n:3d} B={B:5d}: {t*1e3:8.3f} ms  {thr:10.0f} solves/s"
              f"  efficiency {eff*100:5.1f}%")
    doc = {"metric": "scaling", "value": results, "unit": "solves/s",
           "vs_baseline": None,
           "meta": {"backend": jax.default_backend(),
                    "devices": len(all_devices), "N": N,
                    "per_device_batch": per_device_batch,
                    "note": ("weak scaling, per-device batch fixed. On the "
                             "virtual CPU mesh all devices share the host "
                             "cores, so 'efficiency' measures correctness of "
                             "the sharded program, not hardware scaling — "
                             "real ICI/DCN efficiency needs a TPU slice.")}}
    print(json.dumps(doc))
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--out", default=None, help="write the result JSON here")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    run(args.per_device_batch, args.N, out=args.out)
