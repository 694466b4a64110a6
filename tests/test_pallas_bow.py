"""Fused Pallas BoW loss: value and gradient parity vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.ops.bow_recon import bow_reconstruction_loss
from carel_tpu.ops.pallas_bow import fused_bow_loss


def _problem(B=8, D=16, V=700, T=5, seed=0, with_mask=False):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
    idx = rng.integers(0, V, (B, T)).astype(np.int32)
    idx[:, -1] = -1  # padded nnz slot
    wts = (rng.random((B, T)) * 0.5).astype(np.float32)
    wts[:, -1] = 0.0
    mask = None
    if with_mask:
        mask = jnp.asarray(
            np.concatenate([np.ones(B - 2), np.zeros(2)]).astype(np.float32))
    return h, W, b, jnp.asarray(idx), jnp.asarray(wts), mask


def _xla_loss(h, W, b, idx, wts, mask, ls=0.1):
    logits = h @ W + b
    return bow_reconstruction_loss(logits, idx, wts, ls, mask)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_value_matches_xla(with_mask):
    h, W, b, idx, wts, mask = _problem(with_mask=with_mask)
    want = float(_xla_loss(h, W, b, idx, wts, mask))
    got = float(fused_bow_loss(h, W, b, idx, wts, 0.1, mask, tile_v=256))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_fused_value_nonaligned_vocab():
    # V=700 not a multiple of the tile; also exercise duplicate nnz indices
    h, W, b, idx, wts, _ = _problem(V=700, T=6, seed=1)
    idx = idx.at[0, 1].set(idx[0, 0])  # duplicate index in one row
    want = float(_xla_loss(h, W, b, idx, wts, None))
    got = float(fused_bow_loss(h, W, b, idx, wts, 0.1, None, tile_v=256))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_fused_grads_match_xla():
    h, W, b, idx, wts, mask = _problem(B=6, D=8, V=300, T=4, seed=2,
                                       with_mask=True)

    f_ref = lambda h, W, b: _xla_loss(h, W, b, idx, wts, mask)
    f_pal = lambda h, W, b: fused_bow_loss(h, W, b, idx, wts, 0.1, mask,
                                           tile_v=128)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(h, W, b)
    gp = jax.grad(f_pal, argnums=(0, 1, 2))(h, W, b)
    for a, c, name in zip(gp, gr, "hWb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=1e-7, err_msg=name)


def test_train_step_with_pallas_ops():
    """End-to-end train step with ops_impl='pallas' (fused MMD + fused BoW)
    matches the XLA step's loss on identical state/batch."""
    import sys

    sys.path.insert(0, "tests")
    from tests.test_train_step import make_state, synth_batch, tiny_cfg

    from carel_tpu.config import Regularizer
    from carel_tpu.train.steps import make_train_step

    cfg = tiny_cfg(Regularizer.MMD)
    model, state = make_state(cfg)
    batch = synth_batch(np.random.default_rng(9))
    s_xla, m_xla = make_train_step(cfg, model, ops_impl="xla")(
        state, batch, 0, 0.0)
    model2, state2 = make_state(cfg)
    s_pal, m_pal = make_train_step(cfg, model2, ops_impl="pallas")(
        state2, batch, 0, 0.0)
    np.testing.assert_allclose(float(m_pal["loss"]), float(m_xla["loss"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m_pal["recon_loss"]),
                               float(m_xla["recon_loss"]), rtol=5e-4)
    # params after one step agree closely
    a = s_xla.params["heads"]["decoder"]["kernel"]
    b = s_pal.params["heads"]["decoder"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
