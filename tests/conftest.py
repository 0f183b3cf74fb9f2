"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must be hermetic and runnable without TPU hardware; multi-chip sharding
tests use the 8 virtual CPU devices. Must run before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset (e.g. axon/tpu)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def jax_devices():
    import jax
    return jax.devices()
