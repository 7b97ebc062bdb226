"""Test configuration: force CPU with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding tests use the
virtual CPU mesh (``xla_force_host_platform_device_count``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def scenes_dir() -> pathlib.Path:
    return REFERENCE / "scenes"


@pytest.fixture(scope="session")
def meshes_dir() -> pathlib.Path:
    return REFERENCE / "meshes"
