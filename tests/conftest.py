"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding is exercised the standard JAX way
(xla_force_host_platform_device_count) since tests run without TPU hardware.
Must run before jax is imported anywhere.
"""

import os

# Force CPU: the environment's sitecustomize presets JAX_PLATFORMS=axon (the
# real TPU via a tunnel) and PRE-IMPORTS jax, so the env var is already
# latched into jax.config — it must be overridden via config.update, and
# XLA_FLAGS must be set before the first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is dominated by CPU jit compiles,
# which are identical across runs
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference_data = pytest.mark.skipif(
    not reference_available(), reason="reference dataset tree not mounted"
)
