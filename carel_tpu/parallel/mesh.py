"""Device mesh construction.

The reference is single-GPU (SURVEY.md §2.10); here data parallelism over ICI
is first-class: a 1-D ('data',) mesh by default, with a second 'model' axis
hook for tensor parallelism (the 768-d encoder fits one chip, so 'model' stays
size 1 unless configured otherwise).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    num_devices: int = 0,
    axes: Tuple[str, ...] = ("data", "model"),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first `num_devices` devices (0 = all).

    Default layout puts every device on the 'data' axis; pass shape to carve
    out model parallelism, e.g. shape=(4, 2) on 8 devices.
    """
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)
