"""Solve-time heatmap over (horizon N x batch B) — the
plots/fig8_benchmark_heatmap.ipynb analogue. Consumes either live bench runs
or pickles from examples/benchmark_fig8.py."""

import argparse
import json

import numpy as np


def collect(Ns, Bs, solver="auto"):
    from bench import bench_solve

    grid = np.zeros((len(Ns), len(Bs)))
    for i, N in enumerate(Ns):
        for j, B in enumerate(Bs):
            t = bench_solve(N, B, solver=solver)
            grid[i, j] = t * 1e3
            print(f"N={N} B={B}: {t*1e3:.3f} ms")
    return grid


def plot(grid, Ns, Bs, out="gato_tpu_solve_time_heatmap.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(np.log10(grid), cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(Bs)), [str(b) for b in Bs])
    ax.set_yticks(range(len(Ns)), [str(n) for n in Ns])
    ax.set_xlabel("batch size B")
    ax.set_ylabel("horizon N")
    ax.set_title("gato_tpu batched BSQP solve time (ms, log10 color)")
    for i in range(len(Ns)):
        for j in range(len(Bs)):
            ax.text(j, i, f"{grid[i, j]:.2f}", ha="center", va="center",
                    color="w", fontsize=8)
    fig.colorbar(im, ax=ax, label="log10 ms")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"saved -> {out}")


def from_bench_grid(path, Ns, Bs):
    """Load a grid from bench.py --grid output (BENCH_GRID.json)."""
    with open(path) as f:
        data = json.load(f)["value"]
    g = np.zeros((len(Ns), len(Bs)))
    for i, N in enumerate(Ns):
        for j, B in enumerate(Bs):
            g[i, j] = data[f"N{N}_B{B}"]["ms"]
    return g


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--Ns", type=int, nargs="+", default=[8, 16, 32, 64, 128])
    ap.add_argument("--Bs", type=int, nargs="+", default=[1, 32, 128, 512])
    ap.add_argument("--out", default="gato_tpu_solve_time_heatmap.png")
    ap.add_argument("--json", default=None, help="also dump the grid as JSON")
    ap.add_argument("--from-json", default=None,
                    help="plot from a bench.py --grid JSON instead of re-measuring")
    args = ap.parse_args()
    if args.from_json:
        g = from_bench_grid(args.from_json, args.Ns, args.Bs)
    else:
        g = collect(args.Ns, args.Bs)
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"Ns": args.Ns, "Bs": args.Bs, "ms": g.tolist()}, f)
    plot(g, args.Ns, args.Bs, args.out)
