"""VAE heads and attention adapters over the encoder output.

Covers the reference's DrlClassifier head stack (flagship :164-182): the two
diagonal-Gaussian latents (emotion/cause mu + log_var), the three classifiers,
the BoW softmax decoder, and the newsplit attention adapters
(newsplit :184-331): a learnable query attending over the last hidden state
with softmax ('raw'), sparsemax, or entmax15 attention.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from carel_tpu.config import AdapterKind, ModelConfig
from carel_tpu.ops.entmax import entmax15, sparsemax


def sample_prior(
    rng: jax.Array,
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    compat: bool = True,
) -> jnp.ndarray:
    """Reparameterized sample from N(mu, sigma).

    compat=True reproduces the reference quirk (flagship :345-351): ONE noise
    vector of shape (ec_dim,) shared across the batch, and std = exp(log_var)
    (not exp(0.5 * log_var)). compat=False is the textbook VAE sampling.
    """
    if compat:
        eps = jax.random.normal(rng, (mu.shape[-1],), mu.dtype)
        return mu + eps[None, :] * jnp.exp(log_var)
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * log_var)


class AttentionAdapter(nn.Module):
    """Single learnable query attending over the sequence.

    kind=RAW uses standard multi-head softmax attention with output
    projection (the reference's nn.MultiheadAttention, newsplit :299-301).
    kind=SPARSEMAX / ENTMAX reproduce the reference's custom subclasses
    (newsplit :184-277): single extra q/k projections, scores scaled by
    sqrt(embed_dim), the sparse transform applied over key positions, and the
    output computed against the UNPROJECTED values (their `.matmul(value)`).
    """

    hidden_dim: int
    num_heads: int
    kind: AdapterKind

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, L, D = hidden.shape
        query = self.param(
            "query", nn.initializers.normal(1.0), (1, 1, D), jnp.float32
        )
        q = jnp.broadcast_to(query, (B, 1, D)).astype(hidden.dtype)

        if self.kind == AdapterKind.RAW:
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=D,
                out_features=D,
                dtype=hidden.dtype,
                name="mha",
            )
            mask4 = mask[:, None, None, :].astype(bool)
            out = attn(q, hidden, hidden, mask=mask4,
                       deterministic=deterministic)
            return out[:, 0, :]

        # sparse variants: q/k projections, full-dim scores, raw values
        qp = nn.Dense(D, name="q_proj", dtype=jnp.float32)(q.astype(jnp.float32))
        kp = nn.Dense(D, name="k_proj", dtype=jnp.float32)(
            hidden.astype(jnp.float32))
        # v_proj exists in the reference but its output is unused in the
        # sparse paths (they matmul the raw `value`); keep the layer for
        # checkpoint-shape parity.
        _ = nn.Dense(D, name="v_proj", dtype=jnp.float32)(
            hidden.astype(jnp.float32))
        scores = jnp.einsum("bqd,bkd->bqk", qp, kp,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(D, jnp.float32))
        scores = jnp.where(mask[:, None, :] > 0, scores, -1e9)
        if self.kind == AdapterKind.SPARSEMAX:
            weights = sparsemax(scores)
        else:
            weights = entmax15(scores)
        out = jnp.einsum("bqk,bkd->bqd", weights,
                         hidden.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return out[:, 0, :].astype(hidden.dtype)


class VaeHeads(nn.Module):
    """Latent heads + classifiers + BoW decoder (flagship :164-182)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.emotion_mu = nn.Dense(cfg.ec_dim, name="emotion_mu")
        self.emotion_log_var = nn.Dense(cfg.ec_dim, name="emotion_log_var")
        self.cause_mu = nn.Dense(cfg.ec_dim, name="cause_mu")
        self.cause_log_var = nn.Dense(cfg.ec_dim, name="cause_log_var")
        e_classes = 1 if cfg.binary_emotion else cfg.e_num_class
        self.emotion_classifier = nn.Dense(e_classes, name="emotion_classifier")
        self.cause_classifier = nn.Dense(cfg.c_num_class, name="cause_classifier")
        self.pair_classifier = nn.Dense(cfg.pair_num_class, name="pair_classifier")
        self.decoder = nn.Dense(cfg.bow_dim, name="decoder")
        self.dropout = nn.Dropout(cfg.dropout)

    def latent_params(self, emotion_feat, cause_feat):
        return (
            self.emotion_mu(emotion_feat),
            self.emotion_log_var(emotion_feat),
            self.cause_mu(cause_feat),
            self.cause_log_var(cause_feat),
        )

    def emotion_logits(self, z_e, deterministic: bool = True):
        return self.emotion_classifier(self.dropout(z_e, deterministic=deterministic))

    def cause_logits(self, z_c, deterministic: bool = True):
        return self.cause_classifier(self.dropout(z_c, deterministic=deterministic))

    def pair_logits(self, pair_emb, deterministic: bool = True):
        return self.pair_classifier(
            self.dropout(pair_emb, deterministic=deterministic))

    def decode(self, generative_emb):
        return self.decoder(generative_emb)
