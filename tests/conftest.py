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
import hashlib
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def _host_fingerprint() -> str:
    """Short hash of the host CPU feature flags: XLA:CPU AOT results
    compiled on a machine with different features SIGILL when loaded
    (the cache key does not include the target machine), so the cache
    dir is keyed by the feature set (same scheme as __graft_entry__)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


# persistent compilation cache: the heavy e2e tests spend most of their
# wall-clock in XLA:CPU compiles on this 1-CPU sandbox; a warm cache
# turns reruns into seconds (VERDICT r2 weak #7).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
        __file__))), f".jax_cache-{_host_fingerprint()}"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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
