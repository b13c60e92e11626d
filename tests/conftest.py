"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Tests are hermetic on CPU (the real TPU chip is reserved for benchmarks);
multi-chip sharding tests use the 8 virtual devices.
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin injects itself ahead of JAX_PLATFORMS; force CPU
# explicitly (tests are hermetic on 8 virtual CPU devices).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older JAX: the XLA_FLAGS route above applies

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-process executables between modules.

    A long -x run accumulates hundreds of compiled programs; on the 2-vCPU
    box the XLA:CPU compiler segfaults deep into the suite (observed at
    test_whir's rs_encode compile) unless the in-process state is released.
    The persistent disk cache keeps reloads cheap.
    """
    yield
    jax.clear_caches()
