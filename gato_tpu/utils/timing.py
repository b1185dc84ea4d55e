"""Robust device timing for the tunneled TPU runtime.

On this platform `block_until_ready` returns before device execution finishes
and a device->host read carries ~25ms of tunnel latency, so single-call wall
timing is meaningless. We instead queue K data-independent-free (chained)
executions and synchronize once, taking the slope between two chain lengths;
the tunnel latency and dispatch cost cancel in the difference. Medians over
several trials reject scheduler noise.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    _ = np.asarray(leaf.ravel()[0])


def time_fn(f, args, chain=None, k_small=5, k_big=45, trials=5):
    """Per-execution seconds of f(*args).

    chain: optional fn (args, out) -> new args, making successive executions
    data-dependent so the device cannot overlap them. Defaults to reusing the
    same args (executions still serialize on the single TPU stream).
    """
    out = f(*args)
    _sync(out)

    def run(k):
        a, o = args, out
        t0 = time.perf_counter()
        for _ in range(k):
            if chain is not None:
                a = chain(a, o)
            o = f(*a)
        _sync(o)
        return time.perf_counter() - t0

    run(k_small)  # extra warm
    diffs = []
    for _ in range(trials):
        t_small = run(k_small)
        t_big = run(k_big)
        diffs.append((t_big - t_small) / (k_big - k_small))
    return float(np.median(diffs))


def time_fn_ms(f, args, **kw):
    return time_fn(f, args, **kw) * 1e3


def time_loop_fn(run, k_small=5, k_big=45, trials=5, min_chain_s=0.15,
                 k_max=4000):
    """Device-sustained per-iteration seconds via on-device chaining with a
    DYNAMIC chain length.

    `run(k)` must execute k data-dependent iterations of the workload inside
    one jitted program (a lax.fori_loop whose carry feeds each step) and
    return device output to sync on. Because k is a runtime argument there is
    ONE compile, so the chain can be stretched until it dwarfs the
    per-dispatch tunnel jitter (sub-0.1ms workloads need k in the thousands —
    a fixed k=45 lets a single delayed dispatch corrupt the slope by 10x).

    The estimate is the slope between the MINIMA of the two chain lengths:
    tunnel/sync hiccups (tens of ms, occasionally 100ms+) only ever ADD
    time, so per-sample minima converge to the clean runs where medians of
    per-pair slopes still swallow sign-flipping errors.
    """
    _sync(run(k_small))
    t0 = time.perf_counter()
    _sync(run(k_big))
    est = (time.perf_counter() - t0) / k_big
    if est * (k_big - k_small) < min_chain_s:
        k_big = min(k_max, max(k_big, int(min_chain_s / max(est, 1e-9))))

    def once(k):
        t0 = time.perf_counter()
        _sync(run(k))
        return time.perf_counter() - t0

    t_smalls, t_bigs = [], []
    for _ in range(trials):
        t_smalls.append(once(k_small))
        t_bigs.append(once(k_big))
    return (min(t_bigs) - min(t_smalls)) / (k_big - k_small)


def time_scan_fn(build, k_small=5, k_big=45, trials=5):
    """Device-sustained per-iteration seconds via on-device chaining.

    `build(k)` must return `(fn, args)` where `fn(*args)` runs k data-dependent
    iterations of the workload inside ONE jitted program (a lax.scan whose
    carry feeds each step from the previous). The host dispatches each program
    once, so the ~50-400us-jitter per-dispatch tunnel cost — which dominates
    `time_fn` for sub-ms workloads — is paid once per k iterations instead of
    once per iteration. The slope between the two chain lengths is pure
    device time.
    """
    f_small, args_small = build(k_small)
    f_big, args_big = build(k_big)
    _sync(f_small(*args_small))
    _sync(f_big(*args_big))

    def run(f, args):
        t0 = time.perf_counter()
        o = f(*args)
        _sync(o)
        return time.perf_counter() - t0

    diffs = []
    for _ in range(trials):
        t_small = run(f_small, args_small)
        t_big = run(f_big, args_big)
        diffs.append((t_big - t_small) / (k_big - k_small))
    return float(np.median(diffs))
