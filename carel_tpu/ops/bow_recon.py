"""BoW reconstruction loss: softmax decoder vs smoothed bag-of-words targets.

Reference semantics (flagship :381-387, :252-254):

    pred   = softmax(decoder(latents))                   # [B, V]
    target = bow * (1 - ls) + ls / V                     # label smoothing
    loss   = BCE(pred, target)  (mean over B*V elements)

The BoW targets arrive SPARSE (per-example term indices + normalized counts,
carel_tpu.data.bow.BowVocab.batch_sparse); densification happens on device as
a scatter — the host never ships an [N, V] matrix. For V ~ 24k and B = 64 the
whole computation is one XLA fusion after the decoder matmul. (A Pallas
kernel fusing the decoder matmul + softmax + BCE so [B, V] logits never
touch HBM is tracked as follow-up perf work.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def densify_bow(bow_indices: jnp.ndarray, bow_weights: jnp.ndarray,
                vocab_size: int) -> jnp.ndarray:
    """Scatter sparse (indices [B,T] int32 with -1 padding, weights [B,T]) to
    a dense [B, V] float32 matrix on device."""
    B, T = bow_indices.shape
    valid = bow_indices >= 0
    safe_idx = jnp.where(valid, bow_indices, 0)
    w = jnp.where(valid, bow_weights, 0.0)
    one_hot_sum = jnp.zeros((B, vocab_size), jnp.float32)
    # scatter-add along the vocab axis
    return one_hot_sum.at[jnp.arange(B)[:, None], safe_idx].add(w)


def _bce(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-12):
    # torch nn.BCELoss clamps log to >= -100; replicate for parity
    logp = jnp.clip(jnp.log(jnp.maximum(pred, eps)), -100.0, None)
    log1mp = jnp.clip(jnp.log(jnp.maximum(1.0 - pred, eps)), -100.0, None)
    return -(target * logp + (1.0 - target) * log1mp)


def bow_reconstruction_loss(
    decoder_logits: jnp.ndarray,  # [B, V]
    bow_indices: jnp.ndarray,  # [B, T]
    bow_weights: jnp.ndarray,  # [B, T]
    label_smoothing: float = 0.1,
    example_mask: jnp.ndarray = None,  # [B]
    impl: str = "xla",
) -> jnp.ndarray:
    """Mean BCE(softmax(logits), smoothed bow) over real examples."""
    B, V = decoder_logits.shape
    pred = jax.nn.softmax(decoder_logits.astype(jnp.float32), axis=-1)
    bow = densify_bow(bow_indices, bow_weights, V)
    target = bow * (1.0 - label_smoothing) + label_smoothing / V
    per_elem = _bce(pred, target)
    per_example = jnp.mean(per_elem, axis=-1)
    if example_mask is None:
        return jnp.mean(per_example)
    denom = jnp.maximum(jnp.sum(example_mask), 1.0)
    return jnp.sum(per_example * example_mask) / denom
