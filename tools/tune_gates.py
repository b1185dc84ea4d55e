"""A/B the Pallas-kernel auto gates with honest chained device timing.

Round-2 knobs: iter_kernel (ops/pallas_iter.py, one fused SQP iteration,
segment-packed short horizons) and solve_kernel (ops/pallas_solve.py, the
whole solve in one kernel launch). Both need linear_solver="pcg", so every
arm forces pcg — the btd-vs-pcg choice is tuned separately (bench.pick_solver).

Usage (TPU): python tools/tune_gates.py iter|solve|all [--out tune.json]
Timing: bench.bench_solve's chained closed-loop method (utils/timing.py) —
per-dispatch wall timing is meaningless on this runtime (CLAUDE.md).
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["iter", "solve", "big", "all"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--cells", default=None,
                    help="comma list like 8:1,8:32,16:32 overriding defaults")
    ap.add_argument("--verbose-work", action="store_true",
                    help="record per-arm chained work (pcg iters, step sizes)"
                         " so cells doing non-comparable work are visible"
                         " (VERDICT r3: N8_B8 fused 3.6us < its own B=1 row"
                         " smelled like an early-exit artifact)")
    args = ap.parse_args()

    import contextlib
    import io

    from bench import bench_solve
    from gato_tpu.ops.pallas_iter import iter_capacity

    results = {}

    def run(N, B, tag, solver="pcg", **overrides):
        key = f"N{N}_B{B}_{tag}"
        if args.verbose_work:
            # capture bench_solve's [work] lines into the record
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                t = bench_solve(N, B, solver=solver, verbose_work=True,
                                **overrides)
            work = [l.strip() for l in buf.getvalue().splitlines()
                    if "[work]" in l]
            results[key] = {"us": round(t * 1e6, 1), "work": work}
            print(f"{key}: {t*1e6:9.1f} us", flush=True)
            for l in work:
                print(f"    {l}", flush=True)
        else:
            t = bench_solve(N, B, solver=solver, **overrides)
            results[key] = round(t * 1e6, 1)
            print(f"{key}: {t*1e6:9.1f} us", flush=True)
        return t

    cells = ([tuple(map(int, c.split(":"))) for c in args.cells.split(",")]
             if args.cells else
             [(8, 1), (8, 8), (8, 32), (8, 128), (16, 1), (16, 32),
              (16, 64), (32, 1), (32, 8), (32, 32), (64, 1), (64, 8),
              (128, 1), (128, 8)])

    if args.which in ("iter", "all"):
        for N, B in cells:
            if B > iter_capacity(N):
                continue
            run(N, B, "iter_off", iter_kernel="off")
            run(N, B, "iter_fused", iter_kernel="fused")

    if args.which in ("solve", "all"):
        for N, B in cells:
            if B > iter_capacity(N):
                continue
            run(N, B, "solve_off", iter_kernel="off", solve_kernel="off")
            run(N, B, "solve_fused", solve_kernel="fused")

    if args.which == "big":
        # Beyond one kernel grid step: the megakernel grids over chunks of
        # iter_capacity(N) problems (sequential grid, per-chunk solve_ratio
        # exit — identical semantics at the heatmap's max_sqp_iters=1). The
        # real large-B contest is megakernel-vs-btd (bench.pick_solver routes
        # B>=32 to the direct block-tridiagonal solve today).
        big_cells = ([tuple(map(int, c.split(":"))) for c in args.cells.split(",")]
                     if args.cells else
                     [(8, 512), (8, 1024), (16, 128), (16, 512), (32, 128),
                      (32, 512), (64, 32), (64, 128), (128, 32), (128, 128)])
        for N, B in big_cells:
            run(N, B, "btd", solver="btd")
            run(N, B, "solve_fused", solve_kernel="fused")

    out = args.out or f"/tmp/tune_{args.which}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"saved -> {out}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
