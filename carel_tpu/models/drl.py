"""DrlModel: the two-latent disentangled VAE pair classifier.

TPU-native equivalent of the reference's DrlClassifier (flagship :149-343,
newsplit :309-485 with adapters). One Flax module covers every variant; the
regularizer-specific sub-networks (GAN discriminators, CLUB net) are always
present in the param tree but only trained/used when the config selects them —
keeping one jitted train step per config without Python branching on traced
values.

Outputs are raw tensors; all losses live in carel_tpu.losses so the train step
composes them per the selected regularizer.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from carel_tpu.config import AdapterKind, ModelConfig
from carel_tpu.models.discriminators import ClubNet, LinearDiscriminator
from carel_tpu.models.encoder import TransformerEncoder
from carel_tpu.models.heads import AttentionAdapter, VaeHeads, sample_prior


class DrlModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = TransformerEncoder(cfg.encoder, name="encoder")
        self.heads = VaeHeads(cfg, name="heads")
        if cfg.adapter != AdapterKind.NONE:
            self.emotion_adapter = AttentionAdapter(
                cfg.encoder.hidden_dim, cfg.head_number, cfg.adapter,
                name="emotion_adapter")
            self.cause_adapter = AttentionAdapter(
                cfg.encoder.hidden_dim, cfg.head_number, cfg.adapter,
                name="cause_adapter")
        # GAN cross adversaries: predict emotion from the cause latent and
        # vice versa (ec_gan :168-169). ec_num_class=1 there.
        self.ec_disc = LinearDiscriminator(1, cfg.dropout, name="ec_disc")
        self.ce_disc = LinearDiscriminator(1, cfg.dropout, name="ce_disc")
        # CLUB approximation network p(e|c) (vi_final :153-161)
        self.club = ClubNet(cfg.ec_dim, name="club")

    def features(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True):
        """Emotion/cause feature vectors from the encoder.

        Without adapters both are the pooler output (flagship :202-206);
        with adapters each latent gets its own attention readout over the
        last hidden state (newsplit :357-376).
        """
        hidden, pooled = self.encoder(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)
        if self.cfg.adapter == AdapterKind.NONE:
            return pooled, pooled
        e_feat = self.emotion_adapter(hidden, attention_mask, deterministic)
        c_feat = self.cause_adapter(hidden, attention_mask, deterministic)
        return e_feat, c_feat

    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        deterministic: bool = True,
        sample: bool = True,
        compute_recon: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """compute_recon=False skips the decoder matmul — the fused Pallas
        BoW loss (ops_impl='pallas') consumes generative_emb + the decoder
        params directly and never materializes the [B, V] logits."""
        cfg = self.cfg
        e_feat, c_feat = self.features(
            input_ids, attention_mask, token_type_ids, deterministic)
        e_feat = e_feat.astype(jnp.float32)
        c_feat = c_feat.astype(jnp.float32)
        e_mu, e_lv, c_mu, c_lv = self.heads.latent_params(e_feat, c_feat)

        if sample:
            rng = self.make_rng("sample")
            r1, r2 = jax.random.split(rng)
            z_e = sample_prior(r1, e_mu, e_lv, compat=cfg.compat_sampling)
            z_c = sample_prior(r2, c_mu, c_lv, compat=cfg.compat_sampling)
        else:
            z_e, z_c = e_mu, c_mu

        pair_emb = jnp.concatenate([z_e, z_c], axis=-1)

        out = {
            "emotion_mu": e_mu,
            "emotion_log_var": e_lv,
            "cause_mu": c_mu,
            "cause_log_var": c_lv,
            "z_emotion": z_e,
            "z_cause": z_c,
            "generative_emb": pair_emb,
            "emotion_logits": self.heads.emotion_logits(z_e, deterministic),
            "cause_logits": self.heads.cause_logits(z_c, deterministic),
            "pair_logits": self.heads.pair_logits(pair_emb, deterministic),
        }
        if compute_recon:
            out["recon_logits"] = self.heads.decode(pair_emb)

        # GAN adversaries: discriminator sees stop-gradient latents (their
        # loss must not update the encoder, ec_gan :430-456); the encoder's
        # entropy loss sees the live latents through fresh disc applications.
        out["ec_disc_logits_sg"] = self.ec_disc(
            jax.lax.stop_gradient(z_c), deterministic)
        out["ce_disc_logits_sg"] = self.ce_disc(
            jax.lax.stop_gradient(z_e), deterministic)
        out["ec_disc_logits"] = self.ec_disc(z_c, deterministic)
        out["ce_disc_logits"] = self.ce_disc(z_e, deterministic)

        # CLUB net on stop-gradient cause latent (aprx loss trains only the
        # club params, vi_final :421-426) and on the live latent (upper
        # bound, :428-439)
        out["club_mu_sg"], out["club_lv_sg"] = self.club(
            jax.lax.stop_gradient(z_c))
        out["club_mu"], out["club_lv"] = self.club(z_c)

        return out

    def pair_probabilities(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        sample: bool = True,
    ) -> jnp.ndarray:
        """Eval-time pair probabilities (get_pair_preds, flagship :265-282).

        The reference re-samples latents at prediction time; sample=False
        gives the deterministic mean-latent prediction instead.
        """
        out = self(input_ids, attention_mask, token_type_ids,
                   deterministic=True, sample=sample)
        return jax.nn.sigmoid(out["pair_logits"][:, 0])
