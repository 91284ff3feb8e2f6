"""Test configuration.

Multi-host logic is tested on CPU with a virtual 8-device mesh, per the project
test strategy (SURVEY.md section 4): the reference has no automated tests at all,
so this suite *is* the test pyramid for the framework.
"""
import os

# Run tests on CPU with 8 virtual devices so the sharding paths compile and
# execute without TPU hardware.  NB: this environment pre-imports jax at
# interpreter startup (sitecustomize), so JAX_PLATFORMS/XLA_FLAGS env vars set
# here are already too late — the config update below is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Physics validation wants float64 on CPU.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite's wall time is dominated by
# recompiling the same transport/mesh programs every run; with a warm cache
# the full default run drops by an order of magnitude.  Safe across pytest-
# xdist workers (the cache layer uses atomic renames).
_cache_dir = os.environ.get(
    "MCRAT_TPU_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
