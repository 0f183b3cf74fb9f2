"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must be hermetic and runnable without TPU hardware; multi-chip sharding
tests use the 8 virtual CPU devices.

The container's sitecustomize registers the axon TPU backend at interpreter
startup and pins jax_platforms to it, so plain env vars are ignored; we
override via jax.config before any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the test suite: the quick loop is
# dominated by XLA CPU compiles, and test artifacts never leave this
# machine (the package-level configure_jax deliberately skips the CPU
# cache because cached CPU executables are machine-feature sensitive —
# that concern doesn't apply to a local pytest cache directory).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".pytest_xla_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def jax_devices():
    return jax.devices()


def pytest_report_header(config):
    return (f"jax backend: {jax.default_backend()} "
            f"({len(jax.devices())} devices)")
