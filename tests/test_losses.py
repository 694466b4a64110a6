"""Loss-function tests against torch oracles and closed forms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.losses.classify import (
    binary_smoothed_bce,
    emotion_ce_loss,
    entropy_loss,
    pair_bce_pos_weighted,
)
from carel_tpu.losses.vae import annealed_kl_weight, kl_loss

torch = pytest.importorskip("torch")


def test_kl_matches_torch_formula():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(8, 24)).astype(np.float32)
    lv = rng.normal(size=(8, 24)).astype(np.float32) * 0.3
    got = float(kl_loss(jnp.asarray(mu), jnp.asarray(lv)))
    tmu, tlv = torch.tensor(mu), torch.tensor(lv)
    want = torch.mean(
        -0.5 * torch.sum(1 + tlv - tlv.exp() - tmu.pow(2), dim=1)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_annealed_weight_matches_reference():
    import math

    T, lam = 20000, 0.03
    for it in [0, 5000, 19999]:
        want = (math.tanh((it - T * 1.5) / (T / 3)) + 1) * lam
        got = float(annealed_kl_weight(it, T, lam))
        # f32 tanh in the saturated tail is only accurate to ~1e-9 absolute
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8)
    # after the ramp the reference stops weighting (weight 1)
    assert float(annealed_kl_weight(20000, T, lam)) == 1.0


def test_emotion_ce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 6)).astype(np.float32)
    labels = rng.integers(0, 6, 16).astype(np.int32)
    got = float(emotion_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cause_bce_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(16, 1)).astype(np.float32)
    labels = rng.integers(0, 2, 16).astype(np.float32)
    ls = 0.1
    got = float(binary_smoothed_bce(jnp.asarray(logits), jnp.asarray(labels), ls))
    probs = torch.sigmoid(torch.tensor(logits))
    smoothed = torch.tensor(labels)[:, None] * (1 - ls) + ls / 1
    want = torch.nn.BCELoss()(probs, smoothed).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pair_bce_pos_weight_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(16, 1)).astype(np.float32)
    labels = (rng.random(16) > 0.75).astype(np.float32)
    assert labels.sum() > 0
    ls = 0.1
    got = float(pair_bce_pos_weighted(jnp.asarray(logits), jnp.asarray(labels), ls))
    t_labels = torch.tensor(labels)[:, None]
    smoothed = t_labels * (1 - ls) + ls / 1
    pos_weight = (len(labels) - t_labels.sum()) / t_labels.sum()
    want = torch.nn.BCEWithLogitsLoss(pos_weight=pos_weight)(
        torch.tensor(logits), smoothed
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pair_bce_inf_guard():
    logits = jnp.asarray(np.random.default_rng(4).normal(size=(8, 1)),
                         jnp.float32)
    labels = jnp.zeros(8, jnp.float32)  # no positives -> pos_weight = inf
    got = float(pair_bce_pos_weighted(logits, labels, 0.1))
    assert got == 0.0  # reference zeroes the loss (flagship :510-513)


def test_pair_bce_mask_equals_subset():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(12, 1)).astype(np.float32)
    labels = (rng.random(12) > 0.5).astype(np.float32)
    m = np.concatenate([np.ones(8), np.zeros(4)]).astype(np.float32)
    got = float(pair_bce_pos_weighted(jnp.asarray(logits), jnp.asarray(labels),
                                      0.1, jnp.asarray(m)))
    want = float(pair_bce_pos_weighted(jnp.asarray(logits[:8]),
                                       jnp.asarray(labels[:8]), 0.1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_entropy_loss_matches_torch():
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(10, 1)).astype(np.float32)
    got = float(entropy_loss(jnp.asarray(logits), 1e-8))
    p = torch.sigmoid(torch.tensor(logits))
    want = torch.mean(torch.sum(p * torch.log(p + 1e-8), dim=1)).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)
