"""Jitted train and eval steps for every regularizer variant.

One train step per config (the regularizer choice is static Python, so each
preset traces to one fused XLA program):

- none/mmd/hsic: single grad of the weighted multi-task loss
  (flagship forward :184-263, train :820-845);
- gan: one grad of (ec_disc_bce + ce_disc_bce + vae_loss) — equivalent to the
  reference's accumulate-then-step-all sequence because the disc BCEs see
  stop-gradient latents and the entropy term's disc gradient lands in the
  same grad tree (ec_gan :775-804);
- vi: phase 1 updates the CLUB net from the approximation NLL, phase 2 adds
  beta * upper bound (recomputed with the updated club params) to the vae
  loss (vi_final :760-781).

The losses are means over the per-device batch shard; under a 'data'-sharded
batch with replicated params the partitioner turns the grad sum into a psum
over ICI — data parallelism comes from sharding annotations, not code.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from carel_tpu.config import CarelConfig, Regularizer
from carel_tpu.losses.classify import (
    binary_smoothed_bce,
    cause_bce_loss,
    emotion_ce_loss,
    pair_bce_pos_weighted,
)
from carel_tpu.losses.registry import (
    club_aprx_loss,
    club_upper_loss,
    gan_disc_losses,
    regularizer_loss,
)
from carel_tpu.losses.vae import annealed_kl_weight, kl_loss, reconstruction_loss
from carel_tpu.models.drl import DrlModel


def vae_and_classifier_loss(
    cfg: CarelConfig,
    out: Dict,
    batch: Dict,
    iteration,
    reg_rng=None,
    vi_beta=None,
    ops_impl: str = "xla",
    decoder_params: Dict = None,
) -> Tuple[jnp.ndarray, Dict]:
    """The weighted multi-task loss (flagship :208-261).

    With ops_impl='pallas' and decoder_params given, the reconstruction term
    runs as the fully-fused Pallas kernel (decoder matmul + softmax + BCE,
    carel_tpu.ops.pallas_bow) from the generative embedding.
    """
    lc = cfg.loss
    mask = batch["example_mask"]
    emo_labels = batch["emotion_labels"]
    pair_labels = batch["pair_labels"]

    if cfg.model.binary_emotion:
        emo = binary_smoothed_bce(
            out["emotion_logits"], jnp.ones_like(pair_labels),
            lc.label_smoothing, 1, mask)
    else:
        emo = emotion_ce_loss(out["emotion_logits"], emo_labels, mask)
    cau = cause_bce_loss(out["cause_logits"], pair_labels,
                         lc.label_smoothing, mask)
    pair = pair_bce_pos_weighted(out["pair_logits"], pair_labels,
                                 lc.label_smoothing, mask)

    ann = annealed_kl_weight(iteration, lc.kl_ann_iterations, lc.ec_kl_lambda)
    kl_e = ann * kl_loss(out["emotion_mu"], out["emotion_log_var"], mask)
    kl_c = ann * kl_loss(out["cause_mu"], out["cause_log_var"], mask)

    if ops_impl == "pallas" and decoder_params is not None:
        from carel_tpu.ops.pallas_bow import fused_bow_loss

        recon = fused_bow_loss(
            out["generative_emb"], decoder_params["kernel"],
            decoder_params["bias"], batch["bow_indices"],
            batch["bow_weights"], lc.label_smoothing, mask)
    else:
        recon = reconstruction_loss(
            out["recon_logits"], batch["bow_indices"], batch["bow_weights"],
            lc.label_smoothing, mask)

    reg = regularizer_loss(out, lc, mask, rng=reg_rng, vi_beta=vi_beta,
                           impl=ops_impl)

    if cfg.loss.regularizer == Regularizer.GAN:
        # gan weights emo+cau together with ec_mul_loss_weight (ec_gan :275-279)
        total = (reg
                 + lc.emo_mul_loss_weight * (emo + cau)
                 + lc.pair_mul_loss_weight * pair
                 + kl_e + kl_c + recon)
    elif cfg.loss.regularizer == Regularizer.HSIC:
        # hsic: reg has weight 1, emo/cau share ec weight (ec_hsic :249-253)
        total = (reg
                 + lc.emo_mul_loss_weight * (emo + cau)
                 + lc.pair_mul_loss_weight * pair
                 + kl_e + kl_c + recon)
    else:
        total = (reg
                 + lc.emo_mul_loss_weight * emo
                 + lc.cau_mul_loss_weight * cau
                 + lc.pair_mul_loss_weight * pair
                 + kl_e + kl_c + recon)

    metrics = {
        "loss": total,
        "emo_loss": emo,
        "cau_loss": cau,
        "pair_loss": pair,
        "kl_emotion": kl_e,
        "kl_cause": kl_c,
        "recon_loss": recon,
        "reg_loss": reg,
    }
    return total, metrics


def make_train_step(cfg: CarelConfig, model: DrlModel,
                    ops_impl: str = "xla") -> Callable:
    """Build the jitted train step for this config's regularizer."""
    reg = cfg.loss.regularizer

    fused_bow = ops_impl == "pallas"

    def forward(params, batch, rng, deterministic=False):
        sample_rng, dropout_rng = jax.random.split(rng)
        return model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"],
            deterministic=deterministic,
            compute_recon=not fused_bow,
            rngs={"sample": sample_rng, "dropout": dropout_rng},
        )

    def _dec(params):
        return params["heads"]["decoder"] if fused_bow else None

    def step(state, batch, iteration, vi_beta=0.0):
        rng, fwd_rng, reg_rng = jax.random.split(state.rng, 3)

        if reg == Regularizer.VI:
            # phase 1: train the CLUB net on the approximation NLL
            def aprx_loss_fn(params):
                out = forward(params, batch, fwd_rng)
                return club_aprx_loss(out, batch["example_mask"])

            aprx_grads = jax.grad(aprx_loss_fn)(state.params)
            state = state.apply_club(aprx_grads)

            # phase 2: main loss + beta * upper bound with the updated club
            def loss_fn(params):
                out = forward(params, batch, fwd_rng)
                total, metrics = vae_and_classifier_loss(
                    cfg, out, batch, iteration, reg_rng=reg_rng,
                    vi_beta=vi_beta, ops_impl=ops_impl,
                    decoder_params=_dec(params))
                return total, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # club params update only from the aprx phase (the reference's
            # vae_and_cls_opt excludes them, vi_final :295-301)
            state = state.apply_main(grads, with_disc=False)
            return state.replace(rng=rng), metrics

        def loss_fn(params):
            out = forward(params, batch, fwd_rng)
            total, metrics = vae_and_classifier_loss(
                cfg, out, batch, iteration, reg_rng=reg_rng,
                ops_impl=ops_impl, decoder_params=_dec(params))
            if reg == Regularizer.GAN:
                ec_bce, ce_bce = gan_disc_losses(
                    out, cfg.loss, jnp.ones_like(batch["pair_labels"]),
                    batch["pair_labels"], batch["example_mask"])
                metrics["ec_disc_loss"] = ec_bce
                metrics["ce_disc_loss"] = ce_bce
                total = total + ec_bce + ce_bce
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_main(grads, with_disc=(reg == Regularizer.GAN))
        return state.replace(rng=rng), metrics

    return jax.jit(step, donate_argnums=(0,) if cfg.train.donate else ())


def make_eval_step(cfg: CarelConfig, model: DrlModel,
                   sample: bool = True) -> Callable:
    """Batched eval: pair probabilities (get_pair_preds, flagship :265-282).

    The reference re-samples latents at eval; `sample` keeps that behavior,
    with the rng threaded explicitly for reproducibility.
    """

    def step(params, batch, rng):
        out = model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"],
            deterministic=True,
            sample=sample,
            rngs={"sample": rng} if sample else {},
        )
        return jax.nn.sigmoid(out["pair_logits"][:, 0].astype(jnp.float32))

    return jax.jit(step)
