#!/bin/bash
# Round-3 TPU evidence queue: run AFTER the kernel auto-gates are set from
# tune data. Re-records the latency grid with the new defaults engaged, the
# headline, the iiwa14 capability grid, on-hardware closed-loop tracking
# parity (VERDICT round-2 items 1/2/6), and the N=128 real-time-emulation
# comparison (item 3). Each step is independently resumable; logs in
# /tmp/tpu_r3/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r3

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 5400 "$@" 2>&1 | tee /tmp/tpu_r3/$name.log | tail -30
}

timeout 90 python -c "import jax; assert jax.default_backend() == 'tpu', jax.devices(); print('TPU OK:', jax.devices())" || {
    echo "TPU unreachable; aborting"; exit 1; }

# 1. full grid with the new defaults -> BENCH_GRID.json (last line is the
#    JSON record) + headline
run grid python bench.py --grid
tail -1 /tmp/tpu_r3/grid.log > BENCH_GRID.json && echo "BENCH_GRID.json updated"
run headline python bench.py

# 2. heatmap PNG from the recorded grid
run heatmap python plots/fig8_heatmap.py --from-json BENCH_GRID.json \
    --out plots/gato_tpu_solve_time_heatmap.png

# 3. on-hardware closed-loop tracking parity (backend recorded per cell)
run parity_tpu python tools/parity_fig8.py --cells N8_B1,N8_B32,N32_B1,N32_B32

# 4. N=128 real-time emulation: the reference's own benchmark-loop semantics
#    (sim advances by measured solve time -> tens of solves per knot)
run parity_rt python tools/parity_fig8.py --realtime --cells N128_B1,N128_B32 --cycles 200

# 5. iiwa14 capability grid (no reference heatmap; recorded for coverage)
run grid_iiwa python bench.py --grid --plant iiwa14

echo "round-3 queue done; logs in /tmp/tpu_r3/"
