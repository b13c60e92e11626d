"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Tests are hermetic on CPU (the real TPU chip is reserved for benchmarks);
multi-chip sharding tests use the 8 virtual devices.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
