"""Clause-level emotion classifier with DANN domain adaptation.

Reproduces emotion_classifier.py (:112-174): encoder pooler -> linear 768->32
-> relu -> dropout -> batchnorm (feature extractor), a 32->32->7 recognizer,
and a gradient-reversal domain head 32->32->2. Training pairs the emotion CE
on labeled source clauses with the adversarial domain CE on source+target
clauses; class imbalance is handled with inverse-frequency example weights
(the reference's ImbalancedDatasetSampler, :273, :499).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from carel_tpu.config import EncoderConfig
from carel_tpu.models.discriminators import grad_reverse
from carel_tpu.models.encoder import TransformerEncoder


class ClauseEmotionDANN(nn.Module):
    encoder_cfg: EncoderConfig
    feature_dim: int = 32  # linear_width_l
    hidden_dim: int = 32  # linear_width
    n_class: int = 7
    dropout: float = 0.1
    domain_weight: float = 1.0  # GRL lambda

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True,
                 use_running_average: bool = True):
        _, pooled = TransformerEncoder(self.encoder_cfg, name="encoder")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)
        x = nn.relu(nn.Dense(self.feature_dim, name="linear_l")(
            pooled.astype(jnp.float32)))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        feat = nn.BatchNorm(use_running_average=use_running_average,
                            name="batchnorm_l")(x)
        # emotion recognizer
        h = nn.relu(nn.Dense(self.hidden_dim, name="linear_1")(feat))
        emotion_logits = nn.Dense(self.n_class, name="linear_2")(h)
        # domain discriminator through gradient reversal
        d = grad_reverse(feat, self.domain_weight)
        d = nn.relu(nn.Dense(self.hidden_dim, name="dom_linear_1")(d))
        domain_logits = nn.Dense(2, name="dom_linear_2")(d)
        return emotion_logits, domain_logits


def imbalanced_sample_weights(labels: np.ndarray) -> np.ndarray:
    """Inverse-class-frequency weights (torchsampler.ImbalancedDatasetSampler
    semantics): drawing with these probabilities oversamples rare classes."""
    labels = np.asarray(labels)
    counts = np.bincount(labels, minlength=int(labels.max()) + 1)
    w = 1.0 / np.maximum(counts[labels], 1)
    return w / w.sum()


def train_dann(
    model: "ClauseEmotionDANN",
    source: dict,  # {"input_ids","attention_mask","token_type_ids","labels"}
    target: dict,  # same keys; labels ignored (unlabeled)
    epochs: int = 5,
    batch_size: int = 32,
    learning_rate: float = 2e-5,
    seed: int = 42,
    logger=None,
):
    """Adversarial domain-adaptation loop (emotion_classifier.py:448-553):
    each batch mixes imbalance-oversampled source clauses (emotion CE) with
    target clauses (domain CE through the GRL)."""
    import optax

    rng = jax.random.key(seed)
    init_ids = source["input_ids"][:2]
    variables = model.init(
        {"params": rng}, init_ids, source["attention_mask"][:2],
        source["token_type_ids"][:2], use_running_average=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(learning_rate, eps=1e-8)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, ids, mask, types, emo_y, dom_y,
             dr):
        def loss_fn(p):
            (emo, dom), updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, ids, mask, types,
                deterministic=False, use_running_average=False,
                mutable=["batch_stats"], rngs={"dropout": dr})
            e_loss, d_loss = dann_losses(emo, dom, emo_y, dom_y)
            return e_loss + d_loss, (updates, e_loss, d_loss)

        (loss, (updates, e_loss, d_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, u),
                updates.get("batch_stats", batch_stats), opt_state,
                e_loss, d_loss)

    n_src = len(source["labels"])
    n_tgt = len(target["input_ids"])
    src_w = imbalanced_sample_weights(np.asarray(source["labels"]))
    data_rng = np.random.default_rng(seed)
    half = batch_size // 2
    steps_per_epoch = max(n_src // half, 1)
    for epoch in range(epochs):
        for _ in range(steps_per_epoch):
            si = data_rng.choice(n_src, half, p=src_w)
            ti = data_rng.choice(n_tgt, batch_size - half)
            ids = jnp.concatenate([source["input_ids"][si],
                                   target["input_ids"][ti]])
            mask = jnp.concatenate([source["attention_mask"][si],
                                    target["attention_mask"][ti]])
            types = jnp.concatenate([source["token_type_ids"][si],
                                     target["token_type_ids"][ti]])
            emo_y = jnp.concatenate([
                jnp.asarray(np.asarray(source["labels"])[si], jnp.int32),
                jnp.full(batch_size - half, -1, jnp.int32)])
            dom_y = jnp.concatenate([
                jnp.zeros(half, jnp.int32),
                jnp.ones(batch_size - half, jnp.int32)])
            rng, dr = jax.random.split(rng)
            params, batch_stats, opt_state, e_loss, d_loss = step(
                params, batch_stats, opt_state, ids, mask, types,
                emo_y, dom_y, dr)
        if logger:
            logger.log({"event": "dann_epoch", "epoch": epoch + 1,
                        "emo_loss": float(e_loss),
                        "dom_loss": float(d_loss)})
    return params, batch_stats


def dann_losses(
    emotion_logits: jnp.ndarray,
    domain_logits: jnp.ndarray,
    emotion_labels: jnp.ndarray,  # [B] int; -1 = unlabeled (target domain)
    domain_labels: jnp.ndarray,  # [B] int 0=source 1=target
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(emotion CE over labeled rows, domain CE over all rows)."""
    labeled = (emotion_labels >= 0).astype(jnp.float32)
    safe = jnp.maximum(emotion_labels, 0)
    logp = jax.nn.log_softmax(emotion_logits.astype(jnp.float32), -1)
    emo_nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    emo_loss = jnp.sum(emo_nll * labeled) / jnp.maximum(jnp.sum(labeled), 1.0)

    dlogp = jax.nn.log_softmax(domain_logits.astype(jnp.float32), -1)
    dom_nll = -jnp.take_along_axis(
        dlogp, domain_labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return emo_loss, jnp.mean(dom_nll)
