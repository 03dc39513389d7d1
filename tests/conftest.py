"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding paths are validated on a host-platform device mesh
(xla_force_host_platform_device_count), the TPU-world substitute for fake
backends. Real-TPU benchmarking happens outside the test suite (bench.py).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize pre-imports jax with a TPU plugin; env vars
# alone are too late, but the backend is not initialized yet at conftest time,
# so a config update still wins.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/tests/test_data")


@pytest.fixture(scope="session")
def ref_test_data() -> pathlib.Path:
    """Read-only ZInD mini-dataset fixtures shipped with the reference repo."""
    if not REFERENCE_TEST_DATA.exists():
        pytest.skip("reference test data unavailable")
    return REFERENCE_TEST_DATA
