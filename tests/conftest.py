"""Test env: force an 8-device virtual CPU mesh before jax imports.

This is the TPU-native substitute for multi-chip test hardware (see
SURVEY.md §4): sharding/pjit tests run against 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME does force
# the CPU client on this stack
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: this host has ONE cpu core — caching
# compiled executables across test runs cuts suite time from ~30min to
# seconds on re-runs. A SEPARATE dir from the TPU/bench cache: the TPU
# tunnel's remote compile service writes CPU AOT entries with the remote
# machine's features into its cache, which crash when loaded here.
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/lang2seg_jax_cache_cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# a site plugin may import jax before this conftest runs, making the env
# vars too late for platform selection on this stack — the config API
# still works until the backend initializes
jax.config.update("jax_platforms", "cpu")
# same for the persistent-cache env vars: when jax was pre-imported the
# env block above is a no-op, and every compile silently skips the cache
# (observed: a 700 s train-step compile re-paid on the next run). The
# config API always lands.
jax.config.update("jax_compilation_cache_dir", "/tmp/lang2seg_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly @pytest.mark.slow is the quick tier:
    `pytest -m quick` is the <5-min (warm-cache) verification loop;
    `pytest -m slow` covers the compile-heavy remainder in a second
    window (see the verify skill for the cold-run chunking recipe)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.RandomState(3)
