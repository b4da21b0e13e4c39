"""Test configuration: run everything on a simulated 8-device CPU mesh.

The real TPU (1 chip) is reserved for benchmarks; tests must be runnable
anywhere. Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin grabs the backend even with JAX_PLATFORMS=cpu set in
# the environment; the config update below wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
