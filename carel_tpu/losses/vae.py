"""VAE losses: KL with tanh annealing, BoW reconstruction.

Reference: get_kl_loss / get_annealed_weight (flagship :515-534) and
get_reconstruct_loss (flagship :381-387). All means are masked so padded
batch rows contribute nothing.
"""

from __future__ import annotations

import jax.numpy as jnp

from carel_tpu.ops.bow_recon import bow_reconstruction_loss


def _masked_mean(x: jnp.ndarray, mask=None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def kl_loss(mu: jnp.ndarray, log_var: jnp.ndarray, mask=None) -> jnp.ndarray:
    """mean over batch of -0.5 * sum(1 + lv - exp(lv) - mu^2) (flagship :525-534)."""
    per_example = -0.5 * jnp.sum(
        1.0 + log_var - jnp.exp(log_var) - mu**2, axis=-1
    )
    return _masked_mean(per_example, mask)


def annealed_kl_weight(iteration, kl_ann_iterations: int,
                       lambda_weight: float) -> jnp.ndarray:
    """tanh ramp (flagship :515-523): applied while iteration < T, weight 1 after.

    Works on traced iteration values (jnp.where, no Python branch) so the
    train step stays jittable.
    """
    it = jnp.asarray(iteration, jnp.float32)
    T = float(kl_ann_iterations)
    w = (jnp.tanh((it - T * 1.5) / (T / 3.0)) + 1.0) * lambda_weight
    return jnp.where(it < T, w, 1.0)


def reconstruction_loss(
    recon_logits: jnp.ndarray,
    bow_indices: jnp.ndarray,
    bow_weights: jnp.ndarray,
    label_smoothing: float,
    mask=None,
) -> jnp.ndarray:
    return bow_reconstruction_loss(
        recon_logits, bow_indices, bow_weights, label_smoothing, mask
    )
