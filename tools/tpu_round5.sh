#!/bin/bash
# Round-5 TPU evidence queue (VERDICT r4 "next round" items, in value order:
# pickplace acceptance at reference scale, realtime parity at N=8/32, iiwa14
# grid with work traces, roofline, fig-8 disturbance sweep, hardened scaling
# bound, 50-trial hparam study, 4096-lane fleet).
# Each step independently resumable; logs in /tmp/tpu_r5/.
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

# 1. pick-and-place acceptance at reference scale (VERDICT item 1):
#    iiwa14 + 15 kg pendulum, 5-goal sequence, on-device goals rollout
run pickplace_n32 5400 python examples/pickplace.py --device-loop \
    --batch-sizes 1 8 32 128 --N 32 \
    --save PICKPLACE_RESULTS.json --viz plots/pickplace.png
run pickplace_n128 5400 python examples/pickplace.py --device-loop \
    --batch-sizes 32 --N 128 --save PICKPLACE_RESULTS.json

# 2. realtime-emulation parity cells at N=8/32 (VERDICT item 2)
run parity_rt8 4800 python tools/parity_fig8.py --realtime \
    --cells N8_B1,N8_B32 --cycles 200
run parity_rt32 4800 python tools/parity_fig8.py --realtime \
    --cells N32_B1,N32_B32 --cycles 200

# 3. iiwa14 grid v2 with per-cell chained work traces (VERDICT item 3)
run grid_iiwa 9000 python bench.py --grid --plant iiwa14 --verbose-work
tail -1 /tmp/tpu_r5/grid_iiwa.log > BENCH_GRID_IIWA14.json \
    && echo "BENCH_GRID_IIWA14.json updated"

# 4. roofline: megakernel executed-ops vs VPU/MXU peaks (VERDICT item 4)
run roofline 5400 python tools/roofline.py \
    --cells 8:512,32:512,64:32,64:128,64:512,128:512 --out ROOFLINE.json

# 5. fig-8 disturbance-batch sweep (VERDICT item 5)
run fig8_dist 5400 python examples/fig8_tracking.py \
    --batch-sizes 1 32 128 --sim-time 5.0 --save FIG8_DISTURBANCE.json

# 6. hardened multichip-overhead bound (VERDICT item 6)
run shardmap 7200 python tools/shardmap_overhead.py --out SCALING.json

# 7. hparam-batch study at the reference's scale: 50 goals, iiwa14 N=64
#    (VERDICT item 7)
run hparam 5400 python examples/hparam_batch.py --trials 50 \
    --save examples/hparam_batch_results.json

# 8. mixed fleet at BASELINE config #5 scale: 2 x 2048 lanes, N=128
#    (VERDICT item 8)
run fleet 5400 python examples/mixed_fleet.py --cycles 12 --B 2048 --N 128 \
    --device-time --save examples/mixed_fleet_results_tpu.json

# 9. refreshed indy7 grid + headline (post round-5 solver changes)
run grid 7200 python bench.py --grid
tail -1 /tmp/tpu_r5/grid.log > BENCH_GRID.json && echo "BENCH_GRID.json updated"
run headline 1800 python bench.py
run heatmap 900 python plots/fig8_heatmap.py --from-json BENCH_GRID.json \
    --out plots/gato_tpu_solve_time_heatmap.png

# 10. host-loop pickplace cross-check cell (loop-semantics fidelity evidence
#     for the device rollout; B=8 N=32, capped)
run pickplace_host 3600 python examples/pickplace.py \
    --batch-sizes 8 --N 32

echo "round-5 queue done; logs in /tmp/tpu_r5/"
