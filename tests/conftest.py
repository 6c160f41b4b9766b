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
# Persistent compilation cache OFF for the whole test session. CLI-main
# tests (train/generate/export) set jax_compilation_cache_dir globally —
# an intentional process-lifetime setting in production — and the cache
# WRITE of a later test's compiled program then segfaults inside
# jax._src.compilation_cache.put_executable_and_time on this CPU backend
# (reproduced twice at test_serving.py::test_export_cli_e2e, killing the
# suite at ~80%). Tests gain nothing from the persistent cache (fresh
# process per run); the kill switch below is honored regardless of any
# cache_dir a CLI sets later.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


# Curated <5-minute gate on a single CPU core (measured per-file timings in
# round 2): core math goldens, optimizer parity, ops kernels, data layer,
# config/registry, native C++ path, VAE + GAN model families, grad-accum
# equivalence. The diffusion/trainer/distributed/e2e files compile large
# programs and stay in the full run.
QUICK_FILES = {
    "test_config_registry.py",
    "test_data.py",
    "test_metrics.py",
    "test_native.py",
    "test_ops.py",
    "test_optim_parity.py",
    "test_vae.py",
    "test_gan_family.py",
    "test_grad_accum.py",
    "test_lpips.py",
    "test_bench_utils.py",
}


def pytest_collection_modifyitems(config, items):
    """Auto-apply the ``quick`` marker to the curated fast gate subset.

    ``pytest -m quick`` is the documented <5-minute CI gate (single CPU
    core); the full suite (default invocation) runs everything including
    the 31-config e2e matrix.
    """
    for item in items:
        if "slow" in item.keywords:
            continue
        if item.fspath.basename in QUICK_FILES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
