"""Mesh plumbing tests: --mesh_shape parsing, shard_stacked placement, and
scan-epoch loss identity between single-device and dp4 x tp2 meshes."""

import numpy as np

import jax
import jax.numpy as jnp


def test_mesh_shape_parsing(tmp_path):
    import argparse

    from carel_tpu.cli.main import _apply_overrides, build_parser
    from carel_tpu.config import PRESETS

    parser = build_parser()
    args = parser.parse_args([
        "train", "--mesh_shape", "4,2", "--cpu",
        "--cache_dir", str(tmp_path)])
    cfg = _apply_overrides(PRESETS[args.preset], args)
    assert cfg.train.mesh_shape == (4, 2)

    import pytest

    args = parser.parse_args(["train", "--mesh_shape", "8", "--cpu",
                              "--cache_dir", str(tmp_path)])
    with pytest.raises(SystemExit):
        _apply_overrides(PRESETS[args.preset], args)


def test_shard_stacked_layout():
    from carel_tpu.parallel.mesh import make_mesh
    from carel_tpu.parallel.sharding import shard_stacked

    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    stacked = {"x": np.zeros((3, 8, 5), np.float32)}
    placed = shard_stacked(mesh, stacked)
    sh = placed["x"].sharding
    # scan axis whole, batch axis split over 'data' (4), feature whole
    assert sh.shard_shape(placed["x"].shape) == (3, 2, 5)


def test_scan_epoch_mesh_loss_identity():
    """The scanned whole-epoch step yields identical per-batch losses on a
    dp4 x tp2 mesh and on one device."""
    from __graft_entry__ import _flagship_cfg
    from carel_tpu.models.drl import DrlModel
    from carel_tpu.parallel.mesh import make_mesh
    from carel_tpu.parallel.sharding import shard_stacked
    from carel_tpu.parallel.tp import shard_params_tp
    from carel_tpu.train.scan_epoch import make_epoch_step
    from carel_tpu.train.state import create_train_state

    cfg = _flagship_cfg(tiny=True)
    model = DrlModel(cfg.model)
    B, L = 8, cfg.data.max_len
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 256, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "token_type_ids": jnp.zeros((B, L), jnp.int32),
        "pair_labels": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        "emotion_labels": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
        "bow_indices": jnp.asarray(rng.integers(0, 64, (B, 4)), jnp.int32),
        "bow_weights": jnp.full((B, 4), 0.25, jnp.float32),
        "example_mask": jnp.ones(B, jnp.float32),
    }
    stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"])
    ep = make_epoch_step(cfg, model)

    state1 = create_train_state(cfg, variables["params"], jax.random.key(2))
    _, losses_single = ep(state1, stacked, 0.0)

    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    state2 = create_train_state(
        cfg, shard_params_tp(mesh, variables["params"]), jax.random.key(2))
    _, losses_mesh = ep(state2, shard_stacked(mesh, stacked), 0.0)

    np.testing.assert_allclose(np.asarray(losses_single),
                               np.asarray(losses_mesh), atol=1e-4)
