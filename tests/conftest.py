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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_after_module():
    """Free compiled executables between test modules.

    The suite compiles ~150 whole-model scan graphs in one process; past
    roughly a hundred, the XLA CPU client aborts/segfaults inside
    backend_compile_and_load (reproduced at the same test index across
    runs; any module passes in isolation). Module-scoped engine fixtures
    die at module end anyway, so dropping the executable cache costs
    only intra-module reuse."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "smoke: fast core-coverage tier (pytest -m smoke, < 3 min)")
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (subprocess fleets, big shapes)")
