#!/bin/bash
# One-shot TPU benchmarking queue for round 2 (run when the tunnel is up).
# Produces: /tmp/tune_iter.json, /tmp/tune_solve.json, BENCH_GRID candidate,
# headline JSON, iiwa14 grid. Each step is independently resumable.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 3000 "$@" 2>&1 | tee /tmp/tpu_queue/$name.log | tail -25
}

# 0. is the chip reachable?
timeout 90 python -c "import jax; assert jax.default_backend() == 'tpu', jax.devices(); print('TPU OK:', jax.devices())" || {
    echo "TPU unreachable; aborting"; exit 1; }

# 1. A/B the fused iteration kernel (segmented) and the whole-solve kernel
run tune_iter  python tools/tune_gates.py iter  --out /tmp/tpu_queue/tune_iter.json
run tune_solve python tools/tune_gates.py solve --out /tmp/tpu_queue/tune_solve.json

# 2. headline + full grid with current gates (compare vs BENCH_GRID.json)
run headline python bench.py
run grid     python bench.py --grid

# 3. iiwa14 capability column (no reference heatmap; recorded for coverage)
run grid_iiwa python bench.py --grid --plant iiwa14

echo "queue done; logs in /tmp/tpu_queue/"
