"""Real-hardware test tier: compiles and runs the Pallas/Mosaic path on the
actual accelerator (no interpret mode, no CPU pinning).

The main suite under tests/ pins jax to a virtual CPU mesh, so nothing there
exercises real Mosaic lowering — the reference instead runs every shared test
per platform (platforms/cuda/tests/*.cpp wrappers).  This tier is that
per-platform wrapper for the TPU: run it before every snapshot
(`python -m pytest tests_tpu/ -q`).  All tests skip when no accelerator
backend is attached.
"""
import os

import jax
import pytest

# same config the package itself runs under in production — do NOT pin CPU
jax.config.update("jax_enable_x64", True)

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

try:
    HAS_ACCEL = any(d.platform != "cpu" for d in jax.devices())
except Exception:
    HAS_ACCEL = False


def pytest_runtest_setup(item):
    if not HAS_ACCEL:
        pytest.skip("no accelerator device attached (TPU test tier)")
