"""Disentanglement-regularizer registry.

One entry per reference trainer family (SURVEY.md §2.2): none, mmd, hsic, gan,
vi. Each term consumes the DrlModel output dict and returns the scalar added
to the VAE/classifier loss; GAN's discriminator losses and VI's approximation
loss (which train separate parameter groups) are exposed separately for the
multi-optimizer train steps.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from carel_tpu.config import LossConfig, Regularizer
from carel_tpu.losses.classify import binary_smoothed_bce, entropy_loss
from carel_tpu.ops.pairwise import hsic, mmd_statistic


def _masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def club_aprx_loss(out: Dict, mask=None) -> jnp.ndarray:
    """Negative log-likelihood training the approximation net p(e|c)
    (vi_final :421-426). Uses the stop-gradient club outputs so only the club
    params receive gradient."""
    mu, lv = out["club_mu_sg"], out["club_lv_sg"]
    e = jax.lax.stop_gradient(out["z_emotion"])
    ll = jnp.sum(-((mu - e) ** 2) / jnp.exp(lv) - lv, axis=-1)
    return -_masked_mean(ll, mask)


def club_upper_loss(out: Dict, rng: jax.Array, mask=None) -> jnp.ndarray:
    """CLUB-style upper bound on I(e;c): positive vs shuffled-negative
    contrast (vi_final :428-439)."""
    mu, lv = out["club_mu"], out["club_lv"]
    e = out["z_emotion"]
    perm = jax.random.permutation(rng, e.shape[0])
    positive = -((mu - e) ** 2) / jnp.exp(lv)
    negative = -((mu - e[perm]) ** 2) / jnp.exp(lv)
    diff = jnp.sum(positive, axis=-1) - jnp.sum(negative, axis=-1)
    return _masked_mean(diff, mask) / 2.0


def gan_disc_losses(out: Dict, cfg: LossConfig, emotion_labels, cause_labels,
                    mask=None):
    """Discriminator BCEs on detached latents (ec_gan :224-240, :458-468)."""
    ec = binary_smoothed_bce(out["ec_disc_logits_sg"], emotion_labels,
                             cfg.label_smoothing, 1, mask)
    ce = binary_smoothed_bce(out["ce_disc_logits_sg"], cause_labels,
                             cfg.label_smoothing, 1, mask)
    return ec, ce


def regularizer_loss(
    out: Dict,
    cfg: LossConfig,
    mask=None,
    rng: jax.Array = None,
    vi_beta: jnp.ndarray = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """The weighted disentanglement term added to the main loss.

    mmd: -weight * MMD (flagship :231-233, :256 — the sign flip is the trick);
    hsic: weight * HSIC (ec_hsic :213-214);
    gan: weight * (entropy(ec_disc) + entropy(ce_disc)) (ec_gan :275-279);
    vi: beta * club_upper (vi_final :772-781);
    none: 0.
    """
    reg = cfg.regularizer
    if reg == Regularizer.NONE:
        return jnp.asarray(0.0, jnp.float32)
    if reg == Regularizer.MMD:
        m = mmd_statistic(out["z_emotion"], out["z_cause"],
                          cfg.mmd_alphas, mask=mask, impl=impl)
        return cfg.mmd_loss_weight * (-m)
    if reg == Regularizer.HSIC:
        h = hsic(out["z_emotion"], out["z_cause"],
                 cfg.hsic_sigma, cfg.hsic_sigma, mask=mask, impl=impl)
        return cfg.hsic_weight * h
    if reg == Regularizer.GAN:
        ent = entropy_loss(out["ec_disc_logits"], cfg.epsilon, mask) + \
            entropy_loss(out["ce_disc_logits"], cfg.epsilon, mask)
        return cfg.ecce_adv_loss_weight * ent
    if reg == Regularizer.VI:
        beta = vi_beta if vi_beta is not None else jnp.asarray(1.0)
        return beta * club_upper_loss(out, rng, mask)
    raise ValueError(f"unknown regularizer {reg}")
