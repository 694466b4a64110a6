"""End-to-end smoke: real corpus slice -> pipeline -> train -> eval ->
self-train, with the tiny CPU encoder. Exercises every layer (SURVEY.md §7
minimum slice) in under a minute."""

import os

import numpy as np
import pytest

import jax

from carel_tpu.config import PRESETS, Regularizer, SelfStrategy, TrainConfig
from carel_tpu.models.encoder import tiny_encoder_config
from carel_tpu.pipeline import build_pipeline, init_state, resolve_paths
from carel_tpu.selftrain import self_train
from carel_tpu.train.loop import evaluate, train_epochs
from carel_tpu.train.steps import make_eval_step, make_train_step
from tests.conftest import REFERENCE_ROOT, requires_reference_data

import dataclasses


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference data not mounted")
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = PRESETS["ec_mmd_final_mul_newsplit_emnlp"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, data_root=REFERENCE_ROOT,
                                 max_len=32),
        train=TrainConfig(batch_size=16, vae_lr=5e-4, epochs=1,
                          self_epochs=1, self_iteration=2,
                          eval_batch_size=64, donate=False,
                          checkpoint_dir=str(tmp / "ckpt"),
                          self_strategy=SelfStrategy.TEMPORAL_ORDER_MODIFICATION),
    )
    return build_pipeline(cfg, cache_dir=str(tmp / "cache"),
                          encoder_cfg=tiny_encoder_config(),
                          max_train_docs=40, max_test_docs=25)


@requires_reference_data
def test_pipeline_shapes(pipe):
    assert len(pipe.train_arrays) > 20
    assert len(pipe.test_arrays) > 20
    assert pipe.cfg.model.bow_dim == len(pipe.bow) > 1000
    assert pipe.cfg.model.encoder.vocab_size == pipe.tokenizer.vocab_size
    assert pipe.train_arrays.input_ids.shape[1] == 32


@requires_reference_data
def test_train_eval_selftrain_roundtrip(pipe):
    cfg = pipe.cfg
    state = init_state(pipe)
    train_step = make_train_step(cfg, pipe.model)
    eval_step = make_eval_step(cfg, pipe.model)

    state, best = train_epochs(
        cfg, state, train_step, eval_step,
        pipe.train_arrays, pipe.test_arrays, pipe.num_unpred_pairs,
        pipe.model_id, epochs=1)
    assert 0.0 <= best[2] <= 1.0

    res = evaluate(eval_step, state.params, pipe.test_arrays,
                   pipe.num_unpred_pairs, jax.random.key(0), 64)
    assert res.probs.shape == (len(pipe.test_arrays),)
    assert np.all((res.probs >= 0) & (res.probs <= 1))

    state, self_best = self_train(
        cfg, state, train_step, eval_step,
        pipe.test_pairs, pipe.test_arrays, pipe.num_unpred_pairs,
        pipe.encode, pipe.model_id, iterations=1)
    assert 0.0 <= self_best[2] <= 1.0


@requires_reference_data
def test_restart_from_best_unconditional(pipe):
    """Every train() call ends by reloading the best checkpoint — ALSO when
    the call itself saved nothing (flagship :916-917). Load-bearing for
    self-training: pseudo-labels must come from the best-so-far model, not a
    drifted/collapsed state (round-3 fix; education collapsed 0.56 -> 0.11
    without it)."""
    import jax.numpy as jnp

    cfg = pipe.cfg
    state = init_state(pipe)
    train_step = make_train_step(cfg, pipe.model)
    eval_step = make_eval_step(cfg, pipe.model)

    # force a best save regardless of F1 (best_f1_so_far < 0)
    state, _ = train_epochs(
        cfg, state, train_step, eval_step, pipe.train_arrays,
        pipe.test_arrays, pipe.num_unpred_pairs, pipe.model_id,
        epochs=1, best_f1_so_far=-1.0)
    saved = jax.tree_util.tree_leaves(state.params)[0]

    # corrupt the live params, run a 0-epoch call (no save possible):
    # the unconditional reload must restore the checkpointed value
    corrupted = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    state = state.replace(params=corrupted)
    state, _ = train_epochs(
        cfg, state, train_step, eval_step, pipe.train_arrays,
        pipe.test_arrays, pipe.num_unpred_pairs, pipe.model_id, epochs=0)
    restored = jax.tree_util.tree_leaves(state.params)[0]
    assert jnp.allclose(restored, saved), \
        "train_epochs must reload the best ckpt even when it saved nothing"

    # device-memory best cache: same restart semantics without the disk
    # round trip, and the handed-out params are a fresh copy (donation-safe)
    cache: dict = {}
    state, _ = train_epochs(
        cfg, state, train_step, eval_step, pipe.train_arrays,
        pipe.test_arrays, pipe.num_unpred_pairs, pipe.model_id,
        epochs=1, best_f1_so_far=-1.0, best_cache=cache)
    assert cache.get("params") is not None
    cached_leaf = jax.tree_util.tree_leaves(cache["params"])[0]
    state = state.replace(params=jax.tree_util.tree_map(
        lambda x: x + 1.0, state.params))
    state, _ = train_epochs(
        cfg, state, train_step, eval_step, pipe.train_arrays,
        pipe.test_arrays, pipe.num_unpred_pairs, pipe.model_id,
        epochs=0, best_cache=cache)
    out_leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert jnp.allclose(out_leaf, cached_leaf)
    assert out_leaf is not cached_leaf  # fresh copy, not the cached buffer


@requires_reference_data
def test_resolve_paths_match_reference_layout():
    cfg = PRESETS["ec_mmd_final_mul_newsplit_emnlp"]
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, data_root=REFERENCE_ROOT))
    train_p, test_p, bow_p = resolve_paths(cfg)
    assert train_p.endswith("data/ECPE_new_dataset/home.txt")
    assert test_p.endswith(
        "pair_data/predicted_emotion/source_home/education.txt")
    assert bow_p.endswith("data/all_data_pair_zh.txt")
    assert os.path.exists(train_p) and os.path.exists(test_p)

    cfg2 = PRESETS["ec_mmd_final_mul"]
    cfg2 = cfg2.replace(data=dataclasses.replace(
        cfg2.data, data_root=REFERENCE_ROOT))
    train_p, test_p, _ = resolve_paths(cfg2)
    assert train_p.endswith("domains/THUCTC_multiple/society_num.txt")
    assert test_p.endswith("pair_data/emotion/education.txt")
    assert os.path.exists(train_p) and os.path.exists(test_p)

    cfg3 = PRESETS["en_newsplit"]
    cfg3 = cfg3.replace(data=dataclasses.replace(
        cfg3.data, data_root=REFERENCE_ROOT))
    train_p, test_p, bow_p = resolve_paths(cfg3)
    assert train_p.endswith("domains/Englishnovel_multiple/enecpe_num.txt")
    assert test_p.endswith(
        "pair_data/predicted_emotion/source_enecpe_num/reccon_test.txt")
    assert os.path.exists(train_p) and os.path.exists(test_p)


@requires_reference_data
def test_auto_max_len(tmp_path):
    cfg = PRESETS["ec_mmd_final_mul_newsplit_emnlp"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, data_root=REFERENCE_ROOT,
                                 max_len=0),
        train=TrainConfig(batch_size=8, donate=False,
                          checkpoint_dir=str(tmp_path)))
    pipe = build_pipeline(cfg, cache_dir=str(tmp_path / "c"),
                          encoder_cfg=tiny_encoder_config(),
                          max_train_docs=30, max_test_docs=15)
    L = pipe.cfg.data.max_len
    assert 32 <= L < 128 and L % 16 == 0
    assert pipe.train_arrays.input_ids.shape[1] == L
    # no truncation: every row ends before the window
    assert int(pipe.train_arrays.attention_mask.sum(1).max()) <= L
