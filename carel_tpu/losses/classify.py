"""Classifier losses: emotion CE, cause BCE, pos-weighted pair BCE, entropy.

Reference: get_emotion_mul_loss / get_cause_mul_loss / get_pair_mul_loss /
get_entropy_loss (flagship :461-513, ec_gan :486-495). All computed from
logits with masked means so padded rows are inert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def emotion_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask=None) -> jnp.ndarray:
    """6-class cross entropy on the sampled emotion latent (flagship :461-476)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return _masked_mean(nll, mask)


def binary_smoothed_bce(
    logits: jnp.ndarray,  # [B, 1]
    labels: jnp.ndarray,  # [B] float
    label_smoothing: float,
    num_class: int = 1,
    mask=None,
) -> jnp.ndarray:
    """BCE(sigmoid(logits), labels*(1-ls)+ls/num_class).

    The reference's binary heads (cause always; emotion in the pre-_final /
    gan variants) use nn.BCELoss over sigmoid probabilities with smoothed
    targets (flagship :478-492).
    """
    target = labels * (1.0 - label_smoothing) + label_smoothing / num_class
    x = logits[:, 0].astype(jnp.float32)
    # numerically stable BCE-with-logits against arbitrary targets
    per = jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return _masked_mean(per, mask)


def cause_bce_loss(logits, labels, label_smoothing, mask=None):
    return binary_smoothed_bce(logits, labels, label_smoothing, 1, mask)


def pair_bce_pos_weighted(
    logits: jnp.ndarray,  # [B, 1]
    labels: jnp.ndarray,  # [B] float 0/1
    label_smoothing: float,
    mask=None,
) -> jnp.ndarray:
    """BCEWithLogits with per-batch pos_weight = (N-P)/P and the reference's
    inf-guard: when the batch has no positives (pos_weight = inf) the whole
    loss is zeroed (flagship :494-513).
    """
    if mask is None:
        mask = jnp.ones_like(labels)
    n = jnp.sum(mask)
    p = jnp.sum(labels * mask)
    pos_weight = (n - p) / jnp.maximum(p, 1.0)

    target = labels * (1.0 - label_smoothing) + label_smoothing
    x = logits[:, 0].astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(x)
    log_one_minus = jax.nn.log_sigmoid(-x)
    per = -(pos_weight * target * log_sig + (1.0 - target) * log_one_minus)
    loss = _masked_mean(per, mask)
    # inf-guard: p == 0 means pos_weight would be inf in the reference
    return jnp.where(p > 0, loss, 0.0)


def entropy_loss(logits: jnp.ndarray, epsilon: float = 1e-8,
                 mask=None) -> jnp.ndarray:
    """Negative entropy of sigmoid predictions: mean(sum(p*log(p+eps)))
    (ec_gan :486-495). Minimizing drives the adversary toward uncertainty."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    per = jnp.sum(p * jnp.log(p + epsilon), axis=-1)
    return _masked_mean(per, mask)
