"""Train step for the original 3-latent DRL (drl_classifier.py).

Six optimizers in the reference (5x RMSprop for the adversaries + Adam for
the VAE/classifiers, :985-991). As with the GAN variant, the reference's
zero-all/backward-each/step-all sequence is equivalent to one gradient of the
summed loss with per-group optimizers: disc losses see stop-gradient latents
(only disc params), and the entropy terms' disc gradients land in the same
grad tree the disc RMSprops consume.

Loss weights: con_adv .03, ec_adv 1, ecce_adv 3, con_mul 3, ec_mul 10,
pair_mul 30, KLs annealed, reconstruction (:323-331, flag defaults :41-49).
The bow_loss variant reuses sigmoid(content_logits) as detached per-word BCE
weights (drl_classifier_bow_loss.py:246-257).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from carel_tpu.losses.classify import binary_smoothed_bce, entropy_loss
from carel_tpu.losses.vae import annealed_kl_weight, kl_loss
from carel_tpu.models.drl_original import DrlOriginalModel
from carel_tpu.ops.bow_recon import densify_bow


@dataclass(frozen=True)
class OriginalLossConfig:
    con_adv_loss_weight: float = 0.03
    ec_adv_loss_weight: float = 1.0
    ecce_adv_loss_weight: float = 3.0
    con_mul_loss_weight: float = 3.0
    ec_mul_loss_weight: float = 10.0
    pair_mul_loss_weight: float = 30.0
    ec_kl_lambda: float = 0.03
    con_kl_lambda: float = 0.03
    kl_ann_iterations: int = 20000
    label_smoothing: float = 0.1
    epsilon: float = 1e-8
    learned_bow_weights: bool = False  # the bow_loss variant
    vae_lr: float = 1e-5
    adv_lr: float = 3e-3


def _masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def original_losses(cfg: OriginalLossConfig, out, batch, iteration):
    mask = batch["example_mask"]
    bow_dim = out["recon_logits"].shape[-1]
    bow = densify_bow(batch["bow_indices"], batch["bow_weights"], bow_dim)
    smoothed_bow = bow * (1 - cfg.label_smoothing) \
        + cfg.label_smoothing / bow_dim
    emo_labels = jnp.ones_like(batch["pair_labels"])  # binary all-ones
    cau_labels = batch["pair_labels"]

    weights_con = weights_ec = None
    if cfg.learned_bow_weights:
        con_w = jax.nn.sigmoid(out["content_logits"].astype(jnp.float32))
        weights_con = con_w
        weights_ec = 1.0 - con_w

    def bce_bow(logits, weights=None, kind="sigmoid"):
        p = (jax.nn.softmax(logits.astype(jnp.float32), -1)
             if kind == "softmax" else
             jax.nn.sigmoid(logits.astype(jnp.float32)))
        p = jnp.clip(p, 1e-12, 1.0 - 1e-7)
        per = -(smoothed_bow * jnp.log(p)
                + (1.0 - smoothed_bow) * jnp.log1p(-p))
        if weights is not None:
            per = per * jax.lax.stop_gradient(weights)
        return _masked_mean(jnp.mean(per, -1), mask)

    ls = cfg.label_smoothing
    # discriminator losses (stop-gradient latents)
    disc_losses = (
        bce_bow(out["content_disc_emo_sg"], weights_ec)
        + bce_bow(out["content_disc_cau_sg"], weights_ec)
        + binary_smoothed_bce(out["emotion_disc_sg"], emo_labels, ls, 1, mask)
        + binary_smoothed_bce(out["cause_disc_sg"], cau_labels, ls, 1, mask)
        + binary_smoothed_bce(out["ec_disc_sg"], emo_labels, ls, 1, mask)
        + binary_smoothed_bce(out["ce_disc_sg"], cau_labels, ls, 1, mask)
    )

    # adversarial entropies on live latents
    ent = lambda name: entropy_loss(out[name], cfg.epsilon, mask)
    con_entropy = ent("content_disc_emo") + ent("content_disc_cau")
    ec_entropy = ent("emotion_disc") + ent("cause_disc")
    ecce_entropy = ent("ec_disc") + ent("ce_disc")

    # multitask
    emo_mul = binary_smoothed_bce(out["emotion_logits"], emo_labels, ls, 1,
                                  mask)
    cau_mul = binary_smoothed_bce(out["cause_logits"], cau_labels, ls, 1,
                                  mask)
    con_mul = bce_bow(out["content_logits"], weights_con, kind="softmax")
    pair_mul = binary_smoothed_bce(out["pair_logits"], cau_labels, ls, 1,
                                   mask)

    ann_ec = annealed_kl_weight(iteration, cfg.kl_ann_iterations,
                                cfg.ec_kl_lambda)
    ann_con = annealed_kl_weight(iteration, cfg.kl_ann_iterations,
                                 cfg.con_kl_lambda)
    kls = (ann_ec * kl_loss(out["emotion_mu"], out["emotion_log_var"], mask)
           + ann_ec * kl_loss(out["cause_mu"], out["cause_log_var"], mask)
           + ann_con * kl_loss(out["content_mu"], out["content_log_var"],
                               mask))

    recon = bce_bow(out["recon_logits"], kind="softmax")

    vae_loss = (cfg.con_adv_loss_weight * con_entropy
                + cfg.ec_adv_loss_weight * ec_entropy
                + cfg.ecce_adv_loss_weight * ecce_entropy
                + cfg.ec_mul_loss_weight * (emo_mul + cau_mul)
                + cfg.con_mul_loss_weight * con_mul
                + cfg.pair_mul_loss_weight * pair_mul
                + kls + recon)

    return vae_loss, disc_losses, {
        "vae_loss": vae_loss, "disc_loss": disc_losses,
        "pair_loss": pair_mul, "recon_loss": recon,
    }


_DISC_NAMES = ("emotion_disc", "content_disc", "cause_disc", "ec_disc",
               "ce_disc")


def _label(path) -> str:
    keys = [getattr(p, "key", None) for p in path]
    if any(k in _DISC_NAMES for k in keys):
        return "disc"
    if any(k in ("emotion_mu", "emotion_log_var", "cause_mu",
                 "cause_log_var", "content_mu", "content_log_var")
           for k in keys):
        return "frozen"  # same get_params quirk as the flagship (:956-976)
    return "main"


def make_original_train_step(cfg: OriginalLossConfig,
                             model: DrlOriginalModel) -> Callable:
    def make_state(params, rng):
        labels = jax.tree_util.tree_map_with_path(
            lambda p, _: _label(p), params)
        mk = jax.tree_util.tree_map(lambda l: l == "main", labels)
        dk = jax.tree_util.tree_map(lambda l: l == "disc", labels)
        nmk = jax.tree_util.tree_map(lambda l: l != "main", labels)
        ndk = jax.tree_util.tree_map(lambda l: l != "disc", labels)
        main_tx = optax.chain(
            optax.masked(optax.adam(cfg.vae_lr, eps=1e-8), mk),
            optax.masked(optax.set_to_zero(), nmk))
        disc_tx = optax.chain(
            optax.masked(optax.rmsprop(cfg.adv_lr, decay=0.99, eps=1e-8), dk),
            optax.masked(optax.set_to_zero(), ndk))
        return {
            "params": params,
            "main_opt": main_tx.init(params),
            "disc_opt": disc_tx.init(params),
            "rng": rng,
        }, main_tx, disc_tx

    def build(params, rng):
        state, main_tx, disc_tx = make_state(params, rng)

        @jax.jit
        def step(state, batch, iteration):
            rng, fwd = jax.random.split(state["rng"])
            s_rng, d_rng = jax.random.split(fwd)

            def loss_fn(p):
                out = model.apply(
                    {"params": p}, batch["input_ids"],
                    batch["attention_mask"], batch["token_type_ids"],
                    deterministic=False,
                    rngs={"sample": s_rng, "dropout": d_rng})
                vae_loss, disc_losses, metrics = original_losses(
                    cfg, out, batch, iteration)
                return vae_loss + disc_losses, metrics

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            mu, mo = main_tx.update(grads, state["main_opt"], state["params"])
            params = optax.apply_updates(state["params"], mu)
            du, do = disc_tx.update(grads, state["disc_opt"], params)
            params = optax.apply_updates(params, du)
            return {"params": params, "main_opt": mo, "disc_opt": do,
                    "rng": rng}, metrics

        return state, step

    return build
