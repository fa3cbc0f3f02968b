"""Test environment: run everything on an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY/driver contract:
multi-chip sharding is validated on virtual CPU devices; the single real TPU
chip is reserved for bench runs).
"""
import os

# XLA:CPU JIT-loads every compiled program as a handful of fresh mmap
# regions and never unmaps them; a full-suite run (~131 tests, thousands of
# compiles on the 8-device virtual mesh) crosses the default
# vm.max_map_count=65530 around test ~120, at which point a failed mmap
# SEGFAULTS the compiler mid-test (measured: worker at 53k maps at 86% of
# a 19-module subset; full suite died at the same test twice). Raise the
# limit for the whole machine when we can (container runs as root);
# harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _cur = int(f.read())
    if _cur < 1048576:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1048576")
except OSError:
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Persistent compile cache: jit-compiles dominate test wall-time on this
# 1-core host; cache them across pytest processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# The host image ships a sitecustomize that registers a tunneled TPU backend
# ('axon') at interpreter start, so env vars alone are too late. Force the
# platform at the config level BEFORE any backend initializes: tests must
# run on the virtual 8-device CPU mesh, never on the single real TPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not touch the real TPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
