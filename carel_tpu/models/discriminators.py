"""Adversarial and variational auxiliary networks.

- LinearDiscriminator: the GAN variant's cross-latent adversaries (ec_disc /
  ce_disc, drl_classifier_ec_gan.py:168-169) — a single linear layer whose
  input latents are stop-gradient'ed for the discriminator loss.
- ClubNet: the VI variant's conditional approximation network p(e|c)
  (drl_classifier_ec_vi_final.py:153-161): two MLPs producing mu (linear-relu-
  linear) and log_var (linear-relu-linear-tanh).
- grad_reverse: gradient reversal layer for the DANN stage-1 variant
  (emotion_classifier.py:78-110), as a jax.custom_vjp.
- DomainDiscriminator: hidden-relu-hidden-relu-logit domain head
  (emotion_classifier.py:154-174).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearDiscriminator(nn.Module):
    num_classes: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="disc")(z)


class ClubNet(nn.Module):
    """Approximation network for the CLUB-style upper bound."""

    ec_dim: int = 24

    @nn.compact
    def __call__(self, cause_emb):
        h = nn.Dense(self.ec_dim, name="mu_in")(cause_emb)
        mu = nn.Dense(self.ec_dim, name="mu_out")(nn.relu(h))
        g = nn.Dense(self.ec_dim, name="lv_in")(cause_emb)
        log_var = jnp.tanh(nn.Dense(self.ec_dim, name="lv_out")(nn.relu(g)))
        return mu, log_var


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_reverse(x, lambda_: float = 1.0):
    return x


def _gr_fwd(x, lambda_):
    return x, None


def _gr_bwd(lambda_, _, g):
    return (-lambda_ * g,)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class DomainDiscriminator(nn.Module):
    hidden_dim: int = 100
    grl_lambda: float = 1.0

    @nn.compact
    def __call__(self, features):
        x = grad_reverse(features, self.grl_lambda)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(x))
        return nn.Dense(1, name="out")(x)
