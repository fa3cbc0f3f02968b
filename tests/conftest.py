"""Test environment: run everything on an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY/driver contract:
multi-chip sharding is validated on virtual CPU devices; the single real TPU
chip is reserved for bench runs).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Persistent compile cache: jit-compiles dominate test wall-time on this
# 1-core host; cache them across pytest processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
