"""gato_tpu: TPU-native batched SQP trajectory optimization (BSQP) for MPC.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of A2R-Lab/GATO
(GPU-Accelerated and Batched Trajectory Optimization, arXiv 2510.07625).
"""

import os as _os

import jax as _jax

# Persistent compilation cache: the solver jit-specializes per
# (plant, N, B, settings) like the reference's compiled module matrix; the
# cache makes the second process as fast as the second call. Opt out with
# GATO_TPU_NO_CACHE=1.
if _os.environ.get("GATO_TPU_NO_CACHE") != "1":
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("GATO_TPU_CACHE", "/tmp/gato_tpu_jax_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax versions
        pass

from .robots.model import RobotModel, load_robot  # noqa: F401

__version__ = "0.1.0"
