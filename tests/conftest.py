"""Test configuration: force CPU with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding tests use the
virtual CPU mesh (``xla_force_host_platform_device_count``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax and pins the platform to
# the axon TPU tunnel before any user code runs, so mutating
# JAX_PLATFORMS here is too late — override the live config instead
# (backends initialize lazily, so this still wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def scenes_dir() -> pathlib.Path:
    return REFERENCE / "scenes"


@pytest.fixture(scope="session")
def meshes_dir() -> pathlib.Path:
    return REFERENCE / "meshes"
