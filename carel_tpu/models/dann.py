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


def init_dann(model: "ClauseEmotionDANN", probe: dict, seed: int = 42,
              encoder_params=None):
    """Initialize (params, batch_stats); optionally splice in pretrained
    encoder weights (carel_tpu.pretrain output)."""
    rng = jax.random.key(seed)
    variables = model.init(
        {"params": rng}, probe["input_ids"][:2], probe["attention_mask"][:2],
        probe["token_type_ids"][:2], use_running_average=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if encoder_params is not None:
        params = dict(params)
        params["encoder"] = encoder_params
    return params, batch_stats


def predict_dann(model: "ClauseEmotionDANN", params, batch_stats, data: dict,
                 batch_size: int = 256) -> np.ndarray:
    """Emotion softmax probabilities [N, n_class] over a clause set."""
    @jax.jit
    def fwd(params, batch_stats, ids, mask, types):
        emo, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             ids, mask, types, deterministic=True,
                             use_running_average=True)
        return jax.nn.softmax(emo.astype(jnp.float32), -1)

    n = len(data["input_ids"])
    out = []
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        out.append(np.asarray(fwd(
            params, batch_stats, jnp.asarray(data["input_ids"][s:e]),
            jnp.asarray(data["attention_mask"][s:e]),
            jnp.asarray(data["token_type_ids"][s:e]))))
    return np.concatenate(out, 0)


def train_dann(
    model: "ClauseEmotionDANN",
    labeled: dict,  # {"input_ids","attention_mask","token_type_ids","labels"}
    unlabeled: dict,  # same keys; labels ignored (other domain, unlabeled)
    epochs: int = 5,
    batch_size: int = 32,
    learning_rate: float = 2e-5,
    seed: int = 42,
    logger=None,
    init=None,  # (params, batch_stats, opt_state) to continue training
    labeled_domain: int = 0,  # domain id of the labeled half (0=src, 1=tgt)
    use_domain_loss: bool = True,
    eval_fn=None,  # called with (params, batch_stats, epoch) after each epoch
):
    """Adversarial domain-adaptation loop (emotion_classifier.py:448-553):
    each batch mixes imbalance-oversampled labeled clauses (emotion CE) with
    clauses from the other domain (domain CE through the GRL).

    use_domain_loss=False reproduces the reference's SHIPPED recipe exactly —
    its train_model has the discriminator path commented out
    (emotion_classifier.py:279-288, 330-347) so only the emotion CE trains;
    True enables the full DANN objective the model class was built for
    (GRL + domain head, :78-174).

    Returns (params, batch_stats, opt_state); pass the triple back via `init`
    for the self-training iterations (the reference reuses one Adam across
    the base run and all self-train iterations, :500, :527-534).
    """
    import optax

    rng = jax.random.key(seed)
    tx = optax.adam(learning_rate, eps=1e-8)
    if init is None:
        params, batch_stats = init_dann(model, labeled, seed)
        opt_state = tx.init(params)
    else:
        params, batch_stats, opt_state = init
        if opt_state is None:
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
            total = e_loss + d_loss if use_domain_loss else e_loss
            return total, (updates, e_loss, d_loss)

        (loss, (updates, e_loss, d_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, u),
                updates.get("batch_stats", batch_stats), opt_state,
                e_loss, d_loss)

    n_lab = len(labeled["labels"])
    n_unl = len(unlabeled["input_ids"])
    lab_w = imbalanced_sample_weights(np.asarray(labeled["labels"]))
    data_rng = np.random.default_rng(seed)
    half = batch_size // 2
    steps_per_epoch = max(n_lab // half, 1)
    for epoch in range(epochs):
        for _ in range(steps_per_epoch):
            si = data_rng.choice(n_lab, half, p=lab_w)
            ti = data_rng.choice(n_unl, batch_size - half)
            ids = jnp.concatenate([labeled["input_ids"][si],
                                   unlabeled["input_ids"][ti]])
            mask = jnp.concatenate([labeled["attention_mask"][si],
                                    unlabeled["attention_mask"][ti]])
            types = jnp.concatenate([labeled["token_type_ids"][si],
                                     unlabeled["token_type_ids"][ti]])
            emo_y = jnp.concatenate([
                jnp.asarray(np.asarray(labeled["labels"])[si], jnp.int32),
                jnp.full(batch_size - half, -1, jnp.int32)])
            dom_y = jnp.concatenate([
                jnp.full(half, labeled_domain, jnp.int32),
                jnp.full(batch_size - half, 1 - labeled_domain, jnp.int32)])
            rng, dr = jax.random.split(rng)
            params, batch_stats, opt_state, e_loss, d_loss = step(
                params, batch_stats, opt_state, ids, mask, types,
                emo_y, dom_y, dr)
        if logger:
            logger.log({"event": "dann_epoch", "epoch": epoch + 1,
                        "emo_loss": float(e_loss),
                        "dom_loss": float(d_loss)})
        if eval_fn is not None:
            eval_fn(params, batch_stats, epoch + 1)
    return params, batch_stats, opt_state


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
