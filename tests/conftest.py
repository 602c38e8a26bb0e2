"""Test configuration: force an 8-device virtual CPU platform.

This is the TPU-world analogue of "multi-node without a cluster" — all
sharding/collective tests run on a virtual 8-device CPU mesh
(SURVEY.md §4).

Note: this environment pre-imports jax at interpreter start (sitecustomize
registering a remote TPU PJRT plugin), so setting JAX_PLATFORMS in the
environment here is too late; ``jax.config.update`` before any backend
initialization is the reliable switch, and XLA_FLAGS must be in place
before the CPU client is created (which happens lazily at first use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
