#!/bin/bash
# Round-4 TPU evidence queue (VERDICT r3 "next round" items 3, 6, 7 + grid
# re-record after the chained-driver routing change at B > capacity).
# Ordered so an early cutoff still captures the highest-value artifacts.
# Each step independently resumable; logs in /tmp/tpu_r4/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r4

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 5400 "$@" 2>&1 | tee /tmp/tpu_r4/$name.log | tail -30
}

timeout 90 python -c "import jax; assert jax.default_backend() == 'tpu', jax.devices(); print('TPU OK:', jax.devices())" || {
    echo "TPU unreachable; aborting"; exit 1; }

# 1. full grid with the chained driver engaged at B > capacity ->
#    BENCH_GRID.json (also the no-regression check for the routing change)
run grid python bench.py --grid
tail -1 /tmp/tpu_r4/grid.log > BENCH_GRID.json && echo "BENCH_GRID.json updated"
run headline python bench.py

# 2. on-hardware closed-loop tracking parity (unfinished r3 step; backend
#    recorded per cell)
run parity_tpu python tools/parity_fig8.py --cells N8_B1,N8_B32,N32_B1,N32_B32

# 3. N=128 real-time emulation (round-2 ask #2, still unrecorded)
run parity_rt python tools/parity_fig8.py --realtime --cells N128_B1,N128_B32 --cycles 200

# 4. iiwa14 capability grid (7-DOF changes channel counts/VMEM pressure;
#    megakernel gates were tuned on 6-DOF only)
run grid_iiwa python bench.py --grid --plant iiwa14
tail -1 /tmp/tpu_r4/grid_iiwa.log > BENCH_GRID_IIWA14.json && echo "BENCH_GRID_IIWA14.json updated"

# 5. heatmap PNG from the fresh grid
run heatmap python plots/fig8_heatmap.py --from-json BENCH_GRID.json \
    --out plots/gato_tpu_solve_time_heatmap.png

# 6. anomalous TUNE_GATES cells re-measured with per-arm work recorded
#    (VERDICT r3 weak #5: N8_B8 / N64_B8 fused faster than their own B=1)
run tune_work python tools/tune_gates.py solve --verbose-work \
    --cells 8:1,8:8,8:32,64:1,64:8 --out TUNE_GATES_WORK.json

# 7. multichip-program overhead on the one real chip -> SCALING.json
run shardmap python tools/shardmap_overhead.py --cells 32:32,32:512 --out SCALING.json

echo "round-4 queue done; logs in /tmp/tpu_r4/"
