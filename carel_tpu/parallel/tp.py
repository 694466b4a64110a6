"""Tensor-parallel sharding layout for the encoder.

The reference is single-device and the 768-d encoder fits one chip, so TP is
a scaling hook rather than a necessity (SURVEY.md §2.10: "leave mesh axis
hooks in place"). The layout is the standard Megatron split expressed purely
as sharding annotations — XLA inserts the all-reduces:

- attention qkv kernel [hidden, 3, heads, head_dim]: heads sharded on 'model'
- attention out kernel [heads, head_dim, hidden]: heads sharded on 'model'
  (contracting dim -> psum inserted by the partitioner)
- mlp_in kernel [hidden, mlp]: column-split on 'model'
- mlp_out kernel [mlp, hidden]: row-split on 'model' (contracting -> psum)
- embeddings / layernorms / heads: replicated
- batch arrays: sharded on 'data'

Use shard_params_tp to place a param tree; everything composes with the DP
batch sharding in carel_tpu.parallel.sharding.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path) -> P:
    keys = [getattr(p, "key", None) for p in path]
    if "qkv" in keys and "kernel" in keys:
        return P(None, None, "model", None)
    if "out" in keys and "kernel" in keys and "attention" in keys:
        return P("model", None, None)
    if "mlp_in" in keys and "kernel" in keys:
        return P(None, "model")
    if "mlp_in" in keys and "bias" in keys:
        return P("model")
    if "mlp_out" in keys and "kernel" in keys:
        return P("model", None)
    return P()  # replicated


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """device_put the param tree with the Megatron-style TP layout."""

    def place(path, x):
        return jax.device_put(x, NamedSharding(mesh, _spec_for(path)))

    return jax.tree_util.tree_map_with_path(place, params)
