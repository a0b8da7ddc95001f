"""Test harness: force JAX onto 8 virtual CPU devices before any jax import.

Multi-chip sharding tests run on this virtual mesh (the facility the torch
reference lacks entirely — see SURVEY.md §4). Real-TPU execution is covered
by bench.py / __graft_entry__.py which the driver runs on hardware.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("OMP_NUM_THREADS", "1")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: XLA compiles dominate test wall-clock on
# small CI boxes; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/some_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin and pins
# jax_platforms to "axon,cpu" regardless of JAX_PLATFORMS; tests must run on
# the virtual CPU mesh, so override the config before any backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(114514)
