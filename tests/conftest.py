"""Test env: force an 8-device CPU mesh so sharding logic runs without TPUs.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU chip) and
# a sitecustomize registers the axon PJRT plugin at interpreter startup, so
# jax is already imported by the time this runs; the env var is too late but
# jax.config.update before first backend use still wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
