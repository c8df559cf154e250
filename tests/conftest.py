"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing device kernels against the CPU
oracle on a single machine (SURVEY.md §4); multi-chip sharding is exercised
with ``--xla_force_host_platform_device_count=8`` as the TPU-mesh stand-in.

Note: this environment pre-imports jax via sitecustomize (axon PJRT), so
the platform must be forced through ``jax.config`` rather than env vars.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# ZKTPU_TEST_CACHE_DIR isolates the test run's compile cache; "none"
# disables it entirely — the cache-write path (zstandard compress of
# multi-GB serialized executables) segfaults on the big 8-device
# shard_map executables the slow tier compiles
_cache_dir = os.environ.get("ZKTPU_TEST_CACHE_DIR", "/tmp/zktpu_jax_cache")
if _cache_dir.lower() != "none":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x5DBE6259)  # seeded, deterministic
