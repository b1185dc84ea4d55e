#!/bin/bash
# Round-5 follow-up queue: the reference notebook's own pickplace working
# point (gato_pickplace.ipynb cell 1: N=16, dt=0.01, zero start) — the cells
# where the batch-helps-goals story lives — plus a host-loop cross-check at
# the same point (loop-semantics fidelity for the device rollout).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5

run() {
    name=$1; to=$2; shift 2
    echo "=== $name ==="
    timeout "$to" "$@" 2>&1 | tee /tmp/tpu_r5/$name.log | tail -30
}

timeout 90 python -c "import jax; assert jax.default_backend() == 'tpu', jax.devices(); print('TPU OK:', jax.devices())" || {
    echo "TPU unreachable; aborting"; exit 1; }

run pickplace_n16 7200 python examples/pickplace.py --device-loop \
    --batch-sizes 1 8 32 128 --N 16 --dt 0.01 \
    --save PICKPLACE_RESULTS.json --viz plots/pickplace.png

# host-loop cross-check at the notebook point (B=8; ~0.2 s/cycle)
run pickplace_host16 5400 python examples/pickplace.py \
    --batch-sizes 8 --N 16 --dt 0.01

# hparam study at reference scale (failed in the 5a queue: missing sys.path
# bootstrap, fixed since)
run hparam 5400 python examples/hparam_batch.py --trials 50 \
    --save examples/hparam_batch_results.json

echo "round-5b queue done"
