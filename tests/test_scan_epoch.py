"""Scanned-epoch training equals the per-step loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, "tests")
from tests.test_train_step import make_state, synth_batch, tiny_cfg

from carel_tpu.config import Regularizer
from carel_tpu.data.batching import PairArrays
from carel_tpu.train.scan_epoch import make_epoch_step, stack_epoch
from carel_tpu.train.steps import make_train_step


def _arrays(n=24, L=16, vocab=128, bow=64, seed=0):
    rng = np.random.default_rng(seed)
    return PairArrays(
        input_ids=rng.integers(1, vocab, (n, L)).astype(np.int32),
        attention_mask=np.ones((n, L), np.int32),
        token_type_ids=np.zeros((n, L), np.int32),
        pair_labels=rng.integers(0, 2, n).astype(np.float32),
        emotion_labels=rng.integers(0, 6, n).astype(np.int32),
        temporal_order=np.zeros(n, bool),
        bow_indices=rng.integers(0, bow, (n, 4)).astype(np.int32),
        bow_weights=np.full((n, 4), 0.25, np.float32),
    )


@pytest.mark.parametrize("reg", [Regularizer.MMD, Regularizer.VI])
def test_scan_epoch_matches_per_step(reg):
    cfg = tiny_cfg(reg)
    arrays = _arrays()
    stacked = stack_epoch(arrays, cfg.train.batch_size)  # no shuffle
    nb = stacked["input_ids"].shape[0]

    model, state_a = make_state(cfg)
    epoch_step = make_epoch_step(cfg, model)
    state_a2, losses = epoch_step(state_a, stacked, 0.3)
    assert losses.shape == (nb,)
    assert np.all(np.isfinite(np.asarray(losses)))

    # per-step loop over the same batches with the same starting rng
    model_b, state_b = make_state(cfg)
    step = make_train_step(cfg, model_b)
    per_losses = []
    for it in range(nb):
        batch = {k: stacked[k][it] for k in stacked}
        state_b, metrics = step(state_b, batch, it, 0.3)
        per_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(np.asarray(losses), np.asarray(per_losses),
                               rtol=2e-3, atol=1e-4)
    # final params agree
    a = np.asarray(state_a2.params["encoder"]["pooler"]["kernel"])
    b = np.asarray(state_b.params["encoder"]["pooler"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
