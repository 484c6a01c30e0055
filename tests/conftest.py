"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding-aware code is validated
on `--xla_force_host_platform_device_count=8` CPU devices. Must run before
jax is imported anywhere.
"""

import os

# the axon TPU plugin registers itself from sitecustomize whenever
# PALLAS_AXON_POOL_IPS is set and then overrides the platform choice;
# clear it so JAX_PLATFORMS=cpu actually yields the virtual CPU mesh.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported during pytest plugin discovery, baking in
# the axon platform from the ambient env — override through the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (multi-process runs)")


@pytest.fixture
def rng():
    return np.random.default_rng(3)
