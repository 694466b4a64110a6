"""Sharding helpers: batch-sharded data, replicated params.

Data-parallel training = batch arrays sharded over the 'data' mesh axis,
parameters and optimizer state replicated; the gradient all-reduce over ICI is
inserted by the partitioner when the jitted loss averages over the sharded
batch axis (the scaling-book recipe: annotate shardings, let XLA place the
collectives).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device_put every array in the batch pytree sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_stacked(mesh: Mesh, stacked: Any) -> Any:
    """Place stacked whole-epoch arrays [nb, B, ...]: the scan axis stays
    whole, the batch axis rides 'data'."""
    sh = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Replicate parameters/optimizer state across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
