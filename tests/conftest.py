"""Test configuration: 8 virtual CPU devices for distributed tests.

This environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU plugin), so env vars alone don't steer the backend. XLA_FLAGS
still applies because no backend is initialized yet at conftest import time;
the platform override must go through jax.config (SURVEY §4: fake-device
testing via xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
