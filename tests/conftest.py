"""Test configuration.

- Forces the CPU backend with 8 virtual devices so multi-chip sharding paths
  are exercised without TPU hardware (the driver separately dry-runs the
  multi-chip path; bench.py runs on the real chip). NOTE: the JAX_PLATFORMS
  env var is ignored by the axon TPU plugin in this image — only
  jax.config.update('jax_platforms', ...) reliably selects the backend.
- Enables x64 so oracle tests can compare algorithms in float64; production
  code paths remain float32 (dtypes are explicit throughout gato_tpu).
- Persistent compilation cache keeps repeat test runs fast.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/gato_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite accumulates tens of GB of live executables/arrays in one
    process; at high RSS this image's XLA segfaults inside
    LoadedExecutable.serialize() when writing NEW persistent-cache entries
    (observed repeatedly at ~70 tests in). Dropping the in-process caches at
    module boundaries keeps RSS low; cross-module reuse still comes from the
    persistent disk cache."""
    yield
    jax.clear_caches()
    gc.collect()
