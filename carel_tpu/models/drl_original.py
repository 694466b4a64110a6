"""Original 3-latent DRL model: content + emotion + cause.

Reproduces drl_classifier.py (:148-335) — the port of "Disentangled
Representation Learning for Non-Parallel Text Style Transfer" the whole
repo forked from: a 384-d content latent alongside the two 24-d
emotion/cause latents, five linear adversaries (emotion/cause discs over the
content latent, a BoW content disc over each of the emotion/cause latents,
and the ec/ce cross discs), a multi-label BoW content classifier, and a
decoder over the concatenation of all three samples. The bow_loss variant
(drl_classifier_bow_loss.py:246-257, :438-448, :537-550) reuses the content
classifier's sigmoid as detached per-word BCE weights.

All adversary outputs are emitted twice: once on stop-gradient latents (for
the discriminator losses, which must not touch the encoder) and once live
(for the encoder's entropy terms).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from carel_tpu.config import EncoderConfig
from carel_tpu.models.encoder import TransformerEncoder
from carel_tpu.models.heads import sample_prior


@dataclass(frozen=True)
class OriginalModelConfig:
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    ec_dim: int = 24
    con_dim: int = 384  # drl_classifier.py:34
    ec_num_class: int = 1
    pair_num_class: int = 1
    bow_dim: int = 0
    dropout: float = 0.5
    compat_sampling: bool = True


class DrlOriginalModel(nn.Module):
    cfg: OriginalModelConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = TransformerEncoder(cfg.encoder, name="encoder")
        self.content_mu = nn.Dense(cfg.con_dim, name="content_mu")
        self.content_log_var = nn.Dense(cfg.con_dim, name="content_log_var")
        self.emotion_mu = nn.Dense(cfg.ec_dim, name="emotion_mu")
        self.emotion_log_var = nn.Dense(cfg.ec_dim, name="emotion_log_var")
        self.cause_mu = nn.Dense(cfg.ec_dim, name="cause_mu")
        self.cause_log_var = nn.Dense(cfg.ec_dim, name="cause_log_var")
        # adversaries (drl_classifier.py:170-176)
        self.emotion_disc = nn.Dense(cfg.ec_num_class, name="emotion_disc")
        self.content_disc = nn.Dense(cfg.bow_dim, name="content_disc")
        self.cause_disc = nn.Dense(cfg.ec_num_class, name="cause_disc")
        self.ec_disc = nn.Dense(cfg.ec_num_class, name="ec_disc")
        self.ce_disc = nn.Dense(cfg.ec_num_class, name="ce_disc")
        # classifiers + decoder (:177-184)
        self.content_classifier = nn.Dense(cfg.bow_dim,
                                           name="content_classifier")
        self.emotion_classifier = nn.Dense(cfg.ec_num_class,
                                           name="emotion_classifier")
        self.cause_classifier = nn.Dense(cfg.ec_num_class,
                                         name="cause_classifier")
        self.pair_classifier = nn.Dense(cfg.pair_num_class,
                                        name="pair_classifier")
        self.decoder = nn.Dense(cfg.bow_dim, name="decoder")
        self.dropout = nn.Dropout(cfg.dropout)

    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True, sample: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        _, pooled = self.encoder(input_ids, attention_mask, token_type_ids,
                                 deterministic=deterministic)
        pooled = pooled.astype(jnp.float32)
        con_mu = self.content_mu(pooled)
        con_lv = self.content_log_var(pooled)
        e_mu = self.emotion_mu(pooled)
        e_lv = self.emotion_log_var(pooled)
        c_mu = self.cause_mu(pooled)
        c_lv = self.cause_log_var(pooled)

        if sample:
            rng = self.make_rng("sample")
            r1, r2, r3 = jax.random.split(rng, 3)
            z_con = sample_prior(r1, con_mu, con_lv, cfg.compat_sampling)
            z_e = sample_prior(r2, e_mu, e_lv, cfg.compat_sampling)
            z_c = sample_prior(r3, c_mu, c_lv, cfg.compat_sampling)
        else:
            z_con, z_e, z_c = con_mu, e_mu, c_mu

        drop = lambda x: self.dropout(x, deterministic=deterministic)
        sg = jax.lax.stop_gradient
        pair_emb = jnp.concatenate([z_e, z_c], axis=-1)
        generative_emb = jnp.concatenate([z_e, z_c, z_con], axis=-1)

        return {
            "content_mu": con_mu, "content_log_var": con_lv,
            "emotion_mu": e_mu, "emotion_log_var": e_lv,
            "cause_mu": c_mu, "cause_log_var": c_lv,
            "z_content": z_con, "z_emotion": z_e, "z_cause": z_c,
            # disc losses see detached latents (:352-364 pattern)
            "content_disc_emo_sg": self.content_disc(drop(sg(z_e))),
            "content_disc_cau_sg": self.content_disc(drop(sg(z_c))),
            "emotion_disc_sg": self.emotion_disc(drop(sg(z_con))),
            "cause_disc_sg": self.cause_disc(drop(sg(z_con))),
            "ec_disc_sg": self.ec_disc(drop(sg(z_c))),
            "ce_disc_sg": self.ce_disc(drop(sg(z_e))),
            # live outputs for the encoder's entropy terms
            "content_disc_emo": self.content_disc(drop(z_e)),
            "content_disc_cau": self.content_disc(drop(z_c)),
            "emotion_disc": self.emotion_disc(drop(z_con)),
            "cause_disc": self.cause_disc(drop(z_con)),
            "ec_disc": self.ec_disc(drop(z_c)),
            "ce_disc": self.ce_disc(drop(z_e)),
            # classifiers
            "content_logits": self.content_classifier(drop(z_con)),
            "emotion_logits": self.emotion_classifier(drop(z_e)),
            "cause_logits": self.cause_classifier(drop(z_c)),
            "pair_logits": self.pair_classifier(drop(pair_emb)),
            "recon_logits": self.decoder(generative_emb),
        }
