"""Test configuration: force an 8-virtual-device CPU platform.

This is the TPU-native analog of a "fake backend" for distributed tests
(SURVEY.md §4): multi-host collective logic runs on a simulated 8-device mesh
via --xla_force_host_platform_device_count, so sharding/collective code is
exercised without TPU hardware.

NOTE: this environment pre-registers a TPU PJRT plugin at interpreter start
(sitecustomize), which overrides the JAX_PLATFORMS env var — so the platform
must be forced via jax.config.update AFTER importing jax, BEFORE first device
use. XLA_FLAGS is still read at backend-init time, so setting it here works.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices for mesh tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
