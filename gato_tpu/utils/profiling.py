"""Profiling hooks: jax.profiler traces around solver calls.

The reference's observability is wall-clock stats threaded through SQPStats
(bsqp.cuh:109-190); we return the same stats pytree from the jitted solve and
add device-level tracing via jax.profiler for kernel-level inspection.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gato_tpu_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)
