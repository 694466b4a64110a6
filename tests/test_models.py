"""Model shape/behavior tests with the tiny encoder config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.config import AdapterKind, ModelConfig
from carel_tpu.models.drl import DrlModel
from carel_tpu.models.encoder import TransformerEncoder, tiny_encoder_config
from carel_tpu.models.heads import sample_prior
from carel_tpu.models.pair_classifier import PairClassifierModel
from carel_tpu.models.stage1 import DocEmotionModel


def _batch(rng, B=4, L=16, vocab=512):
    ids = rng.integers(0, vocab, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[:, L // 2:] = 0
    types = np.zeros((B, L), np.int32)
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)


def test_encoder_shapes_and_mask_invariance():
    cfg = tiny_encoder_config()
    rng = np.random.default_rng(0)
    ids, mask, types = _batch(rng)
    enc = TransformerEncoder(cfg)
    params = enc.init(jax.random.key(0), ids, mask, types)
    hidden, pooled = enc.apply(params, ids, mask, types)
    assert hidden.shape == (4, 16, 64)
    assert pooled.shape == (4, 64)
    # masked positions must not affect the pooled output
    ids2 = np.asarray(ids).copy()
    ids2[:, 8:] = 7  # change padding tokens
    _, pooled2 = enc.apply(params, jnp.asarray(ids2), mask, types)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2),
                               atol=1e-5)


def test_roberta_position_ids_path():
    cfg = tiny_encoder_config(arch="roberta", type_vocab_size=0)
    rng = np.random.default_rng(1)
    ids, mask, types = _batch(rng)
    enc = TransformerEncoder(cfg)
    params = enc.init(jax.random.key(0), ids, mask, None)
    hidden, pooled = enc.apply(params, ids, mask, None)
    assert pooled.shape == (4, 64)


def test_sample_prior_compat_quirk():
    rng = jax.random.key(42)
    mu = jnp.zeros((8, 24))
    lv = jnp.zeros((8, 24))
    z = sample_prior(rng, mu, lv, compat=True)
    # one shared noise vector across the batch (flagship :345-351)
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(z[5]), atol=1e-7)
    z2 = sample_prior(rng, mu, lv, compat=False)
    assert not np.allclose(np.asarray(z2[0]), np.asarray(z2[5]))
    # compat std is exp(log_var), not exp(log_var/2)
    lv3 = jnp.full((1, 4), 2.0)
    zc = sample_prior(rng, jnp.zeros((1, 4)), lv3, compat=True)
    eps = jax.random.normal(jax.random.split(rng)[0] if False else rng, (4,))
    np.testing.assert_allclose(np.asarray(zc[0]), np.asarray(eps * jnp.exp(2.0)),
                               rtol=1e-5)


def _drl_cfg(**kw):
    enc = tiny_encoder_config()
    defaults = dict(encoder=enc, ec_dim=8, bow_dim=32, dropout=0.1)
    defaults.update(kw)
    return ModelConfig(**defaults)


def test_drl_model_outputs():
    cfg = _drl_cfg()
    model = DrlModel(cfg)
    rng = np.random.default_rng(2)
    ids, mask, types = _batch(rng)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1),
         "dropout": jax.random.key(2)},
        ids, mask, types, deterministic=False)
    out = model.apply(params, ids, mask, types, deterministic=True,
                      rngs={"sample": jax.random.key(3)})
    assert out["emotion_mu"].shape == (4, 8)
    assert out["pair_logits"].shape == (4, 1)
    assert out["emotion_logits"].shape == (4, 6)
    assert out["recon_logits"].shape == (4, 32)
    assert out["club_mu"].shape == (4, 8)
    # stop-gradient disc logits must not carry encoder gradient
    def disc_loss(p):
        o = model.apply(p, ids, mask, types, deterministic=True,
                        rngs={"sample": jax.random.key(3)})
        return jnp.sum(o["ec_disc_logits_sg"] ** 2)

    g = jax.grad(lambda p: disc_loss(p))(params)
    enc_g = jax.tree_util.tree_leaves(g["params"]["encoder"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in enc_g)
    disc_g = jax.tree_util.tree_leaves(g["params"]["ec_disc"])
    assert any(float(jnp.abs(x).max()) > 0.0 for x in disc_g)


@pytest.mark.parametrize("kind", [AdapterKind.RAW, AdapterKind.SPARSEMAX,
                                  AdapterKind.ENTMAX])
def test_drl_model_with_adapters(kind):
    cfg = _drl_cfg(adapter=kind, head_number=2)
    model = DrlModel(cfg)
    rng = np.random.default_rng(3)
    ids, mask, types = _batch(rng)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        ids, mask, types)
    out = model.apply(params, ids, mask, types,
                      rngs={"sample": jax.random.key(3)})
    assert out["pair_logits"].shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out["pair_logits"])))


def test_pair_classifier_shapes():
    cfg = tiny_encoder_config()
    model = PairClassifierModel(cfg)
    rng = np.random.default_rng(4)
    ids, mask, types = _batch(rng)
    params = model.init(jax.random.key(0), ids, mask, types)
    logits = model.apply(params, ids, mask, types)
    assert logits.shape == (4, 1)


@pytest.mark.parametrize("mixer", ["bilstm", "transformer"])
def test_stage1_model(mixer):
    cfg = tiny_encoder_config()
    model = DocEmotionModel(cfg, n_hidden=16, clause_mixer=mixer)
    rng = np.random.default_rng(5)
    B, D, S = 2, 6, 12
    ids = jnp.asarray(rng.integers(0, 512, (B, D, S)).astype(np.int32))
    mask = jnp.ones((B, D, S), jnp.int32)
    types = jnp.zeros((B, D, S), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask, types)
    pred, reg = model.apply(params, ids, mask, types)
    assert pred.shape == (B, D, 7)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, rtol=1e-5)
    assert float(reg) > 0


def test_encoder_remat_matches_nonremat():
    """remat=True (jax.checkpoint per layer, encoder.py:151) must be a pure
    perf knob: identical forward outputs AND identical gradients."""
    import dataclasses

    cfg = tiny_encoder_config()
    rng = np.random.default_rng(3)
    ids, mask, types = _batch(rng)
    enc = TransformerEncoder(cfg)
    enc_r = TransformerEncoder(dataclasses.replace(cfg, remat=True))
    params = enc.init(jax.random.key(0), ids, mask, types)

    def loss(apply_params, model):
        hidden, pooled = model.apply(apply_params, ids, mask, types)
        return jnp.sum(pooled ** 2) + jnp.sum(hidden ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, enc)
    l1, g1 = jax.value_and_grad(loss)(params, enc_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
