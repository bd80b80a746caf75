"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): the double-precision
Reference profile is the oracle; sharding tests use the virtual device mesh
the way the reference tests multi-GPU with two in-process contexts
(platforms/cuda/tests/TestCudaNonbondedForce.cpp:37 testParallelComputation).
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the axon plugin force-registers itself as default; tests run on CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent XLA compilation cache: re-runs of the suite skip the dominant
# jit-compile cost (the reference's ctest shards per-suite instead; here one
# on-disk cache serves every test process)
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
