"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding is exercised the standard JAX way
(xla_force_host_platform_device_count) since tests run without TPU hardware.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference_data = pytest.mark.skipif(
    not reference_available(), reason="reference dataset tree not mounted"
)
