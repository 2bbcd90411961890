"""Test configuration: force an 8-device virtual CPU backend.

Tests must run without TPU hardware and must exercise multi-device sharding,
so we ask XLA for 8 host (CPU) devices before JAX is imported anywhere.
"""

import os

# Force CPU: the env may pre-set JAX_PLATFORMS to a TPU platform, but tests
# must exercise the virtual 8-device CPU mesh (and not hold the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
_FORCE_CPU = True
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site plugin (PJRT tunnel) may have programmatically set
# jax_platforms to its own backend at interpreter startup, which beats the
# env var. Override back to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-dominated (the full
# train step takes ~75s to build on CPU); cache hits cut reruns ~10x.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(511990)
