#!/bin/bash
# Round-5c queue: re-record the pickplace acceptance cells with the
# RK4-substepped hypothesis scoring (default since the A/B showed the
# one-step score is noise-dominated at large B), plus the hparam study that
# failed to launch in 5a/5b.
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

run pickplace_n16_v2 7200 python examples/pickplace.py --device-loop \
    --batch-sizes 1 8 32 128 --N 16 --dt 0.01 \
    --save PICKPLACE_RESULTS.json --viz plots/pickplace.png

run pickplace_n32_v2 7200 python examples/pickplace.py --device-loop \
    --batch-sizes 1 8 32 128 --N 32 \
    --save PICKPLACE_RESULTS.json

run pickplace_n128_v2 5400 python examples/pickplace.py --device-loop \
    --batch-sizes 32 --N 128 --save PICKPLACE_RESULTS.json

run hparam 5400 python examples/hparam_batch.py --trials 50 \
    --save examples/hparam_batch_results.json

echo "round-5c queue done"
