"""Train-step tests: one step per regularizer on the tiny encoder, loss
decreases over steps, optimizer-group isolation, and data-parallel execution
over the fake 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.config import (
    CarelConfig,
    DataConfig,
    LossConfig,
    ModelConfig,
    Regularizer,
    TrainConfig,
)
from carel_tpu.models.drl import DrlModel
from carel_tpu.models.encoder import tiny_encoder_config
from carel_tpu.train.state import create_train_state, param_labels
from carel_tpu.train.steps import make_eval_step, make_train_step

VOCAB = 128
BOW = 64


def tiny_cfg(reg=Regularizer.MMD, **loss_kw):
    return CarelConfig(
        model=ModelConfig(encoder=tiny_encoder_config(vocab_size=VOCAB),
                          ec_dim=8, bow_dim=BOW, dropout=0.1),
        loss=LossConfig(regularizer=reg, **loss_kw),
        data=DataConfig(max_len=16),
        train=TrainConfig(batch_size=8, vae_lr=1e-3, donate=False),
    )


def synth_batch(rng, B=8, L=16):
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, VOCAB, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "token_type_ids": jnp.zeros((B, L), jnp.int32),
        "pair_labels": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        "emotion_labels": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
        "bow_indices": jnp.asarray(rng.integers(0, BOW, (B, 4)), jnp.int32),
        "bow_weights": jnp.full((B, 4), 0.25, jnp.float32),
        "example_mask": jnp.ones(B, jnp.float32),
    }
    return batch


def make_state(cfg):
    model = DrlModel(cfg.model)
    rng = np.random.default_rng(0)
    b = synth_batch(rng)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        b["input_ids"], b["attention_mask"], b["token_type_ids"])
    state = create_train_state(cfg, variables["params"], jax.random.key(2))
    return model, state


@pytest.mark.parametrize("reg", [Regularizer.NONE, Regularizer.MMD,
                                 Regularizer.HSIC, Regularizer.GAN,
                                 Regularizer.VI])
def test_one_step_each_regularizer(reg):
    cfg = tiny_cfg(reg)
    model, state = make_state(cfg)
    step = make_train_step(cfg, model)
    batch = synth_batch(np.random.default_rng(1))
    state2, metrics = step(state, batch, 0, 0.5)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params actually moved
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    moved = [v for v in jax.tree_util.tree_leaves(delta)]
    assert max(moved) > 0


def test_frozen_latent_heads_compat():
    cfg = tiny_cfg(Regularizer.MMD)
    model, state = make_state(cfg)
    step = make_train_step(cfg, model)
    batch = synth_batch(np.random.default_rng(2))
    state2, _ = step(state, batch, 0, 0.0)
    # the four latent projections stay at init (reference get_params quirk)
    for name in ["emotion_mu", "emotion_log_var", "cause_mu", "cause_log_var"]:
        before = state.params["heads"][name]["kernel"]
        after = state2.params["heads"][name]["kernel"]
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # while encoder and classifiers move
    b = state.params["encoder"]["pooler"]["kernel"]
    a = state2.params["encoder"]["pooler"]["kernel"]
    assert float(jnp.abs(a - b).max()) > 0


def test_gan_disc_updates_only_in_gan_mode():
    for reg, expect_move in [(Regularizer.MMD, False), (Regularizer.GAN, True)]:
        cfg = tiny_cfg(reg)
        model, state = make_state(cfg)
        step = make_train_step(cfg, model)
        batch = synth_batch(np.random.default_rng(3))
        state2, _ = step(state, batch, 0, 0.0)
        before = state.params["ec_disc"]["disc"]["kernel"]
        after = state2.params["ec_disc"]["disc"]["kernel"]
        moved = float(jnp.abs(after - before).max()) > 0
        assert moved == expect_move, reg


def test_vi_club_updates():
    cfg = tiny_cfg(Regularizer.VI)
    model, state = make_state(cfg)
    step = make_train_step(cfg, model)
    batch = synth_batch(np.random.default_rng(4))
    state2, _ = step(state, batch, 0, 0.5)
    before = state.params["club"]["mu_in"]["kernel"]
    after = state2.params["club"]["mu_in"]["kernel"]
    assert float(jnp.abs(after - before).max()) > 0


def test_loss_decreases_over_steps():
    cfg = tiny_cfg(Regularizer.NONE)
    model, state = make_state(cfg)
    step = make_train_step(cfg, model)
    batch = synth_batch(np.random.default_rng(5))
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, i, 0.0)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_eval_step_probabilities():
    cfg = tiny_cfg(Regularizer.MMD)
    model, state = make_state(cfg)
    ev = make_eval_step(cfg, model)
    batch = synth_batch(np.random.default_rng(6))
    p = np.asarray(ev(state.params, batch, jax.random.key(0)))
    assert p.shape == (8,)
    assert np.all((p >= 0) & (p <= 1))
    # sampling rng changes predictions (the reference's stochastic eval)
    p2 = np.asarray(ev(state.params, batch, jax.random.key(1)))
    assert not np.allclose(p, p2)
    # deterministic eval is reproducible
    ev_det = make_eval_step(cfg, model, sample=False)
    d1 = np.asarray(ev_det(state.params, batch, jax.random.key(0)))
    d2 = np.asarray(ev_det(state.params, batch, jax.random.key(1)))
    np.testing.assert_allclose(d1, d2)


def test_data_parallel_step_on_mesh():
    """DP over the fake 8-device mesh: sharded batch, replicated params."""
    from carel_tpu.parallel.mesh import make_mesh
    from carel_tpu.parallel.sharding import shard_batch, shard_params

    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    cfg = tiny_cfg(Regularizer.MMD)
    model, state = make_state(cfg)
    mesh = make_mesh(8, axes=("data",))
    state = jax.tree_util.tree_map(
        lambda x: x, state)  # no-op; params replicated below
    sharded_state = state.replace(
        params=shard_params(mesh, state.params),
        main_opt_state=shard_params(mesh, state.main_opt_state),
        disc_opt_state=shard_params(mesh, state.disc_opt_state),
        club_opt_state=shard_params(mesh, state.club_opt_state),
    )
    step = make_train_step(cfg, model)
    batch = synth_batch(np.random.default_rng(7), B=16)
    sharded_batch = shard_batch(mesh, batch)
    state2, metrics = step(sharded_state, sharded_batch, 0, 0.0)
    assert np.isfinite(float(metrics["loss"]))
    # single-device result matches the 8-way sharded result
    state_1dev, metrics_1 = make_train_step(cfg, model)(state, batch, 0, 0.0)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_1["loss"]), rtol=1e-4)


def test_tensor_parallel_step_on_mesh():
    """dp4 x tp2: encoder weights Megatron-split on 'model', batch on 'data';
    loss matches the single-device step."""
    from carel_tpu.parallel.mesh import make_mesh
    from carel_tpu.parallel.sharding import shard_batch
    from carel_tpu.parallel.tp import shard_params_tp

    cfg = tiny_cfg(Regularizer.MMD)
    model, state = make_state(cfg)
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    from carel_tpu.train.state import create_train_state

    tp_params = shard_params_tp(mesh, state.params)
    tp_state = create_train_state(cfg, tp_params, jax.random.key(2))
    batch = synth_batch(np.random.default_rng(11), B=16)
    sharded = shard_batch(mesh, batch)
    step = make_train_step(cfg, model)
    tp_state2, m_tp = step(tp_state, sharded, 0, 0.0)
    state_1, m_1 = make_train_step(cfg, model)(state, batch, 0, 0.0)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=1e-4)


def test_prefetch_to_device():
    from carel_tpu.data.batching import iter_batches
    from carel_tpu.data.prefetch import prefetch_to_device

    # synthetic arrays through the real batch iterator
    from carel_tpu.data.batching import PairArrays

    n = 20
    arrs = PairArrays(
        input_ids=np.arange(n * 4, dtype=np.int32).reshape(n, 4),
        attention_mask=np.ones((n, 4), np.int32),
        token_type_ids=np.zeros((n, 4), np.int32),
        pair_labels=np.arange(n, dtype=np.float32),
        emotion_labels=np.zeros(n, np.int32),
        temporal_order=np.zeros(n, bool),
        bow_indices=np.zeros((n, 2), np.int32),
        bow_weights=np.zeros((n, 2), np.float32),
    )
    it = iter_batches(arrs, 8, shuffle=False)
    out = list(prefetch_to_device(it, size=2, transform=lambda b: b.as_dict()))
    assert len(out) == 3
    assert isinstance(out[0]["input_ids"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out[0]["pair_labels"][:8]),
                                  np.arange(8, dtype=np.float32))
    # error propagation
    def bad():
        yield arrs
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad(), transform=lambda b: b.input_ids))


def test_flagship_loss_composition():
    """The total is exactly 30*(-MMD) + 10*emo + 10*cau + 30*pair + KLe + KLc
    + recon (flagship :256-261) — guards the loss formula against edits."""
    from carel_tpu.losses.classify import (
        cause_bce_loss, emotion_ce_loss, pair_bce_pos_weighted)
    from carel_tpu.losses.vae import (
        annealed_kl_weight, kl_loss, reconstruction_loss)
    from carel_tpu.ops.pairwise import mmd_statistic
    from carel_tpu.train.steps import vae_and_classifier_loss

    cfg = tiny_cfg(Regularizer.MMD)
    model, state = make_state(cfg)
    batch = synth_batch(np.random.default_rng(13))
    out = model.apply({"params": state.params}, batch["input_ids"],
                      batch["attention_mask"], batch["token_type_ids"],
                      deterministic=True,
                      rngs={"sample": jax.random.key(5)})
    total, metrics = vae_and_classifier_loss(cfg, out, batch, iteration=3)

    lc = cfg.loss
    m = batch["example_mask"]
    ann = annealed_kl_weight(3, lc.kl_ann_iterations, lc.ec_kl_lambda)
    expected = (
        lc.mmd_loss_weight * (-mmd_statistic(out["z_emotion"], out["z_cause"],
                                             lc.mmd_alphas, mask=m))
        + lc.emo_mul_loss_weight * emotion_ce_loss(
            out["emotion_logits"], batch["emotion_labels"], m)
        + lc.cau_mul_loss_weight * cause_bce_loss(
            out["cause_logits"], batch["pair_labels"], lc.label_smoothing, m)
        + lc.pair_mul_loss_weight * pair_bce_pos_weighted(
            out["pair_logits"], batch["pair_labels"], lc.label_smoothing, m)
        + ann * kl_loss(out["emotion_mu"], out["emotion_log_var"], m)
        + ann * kl_loss(out["cause_mu"], out["cause_log_var"], m)
        + reconstruction_loss(out["recon_logits"], batch["bow_indices"],
                              batch["bow_weights"], lc.label_smoothing, m)
    )
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-6)


def test_bf16_mu_dtype_knob():
    """--optim_mu_dtype bfloat16 (round-4 HBM lever) stores the main Adam
    first moment in bf16 and produces the same first step as f32-mu within
    bf16 rounding; float32 default leaves no bf16 leaves in the opt state."""
    cfg32 = tiny_cfg(Regularizer.MMD)
    cfg16 = dataclasses.replace(
        cfg32,
        train=dataclasses.replace(cfg32.train, optim_mu_dtype="bfloat16"))
    model, s32 = make_state(cfg32)
    _, s16 = make_state(cfg16)

    def mu_dtypes(state):
        return {str(l.dtype) for l in jax.tree_util.tree_leaves(
            state.main_opt_state) if hasattr(l, "dtype")}

    assert "bfloat16" not in mu_dtypes(s32)
    assert "bfloat16" in mu_dtypes(s16)

    batch = synth_batch(np.random.default_rng(6))
    r32, m32 = make_train_step(cfg32, model)(s32, batch, 0, 0.5)
    r16, m16 = make_train_step(cfg16, model)(s16, batch, 0, 0.5)
    # loss is computed from the pre-update forward pass: identical
    assert float(m32["loss"]) == pytest.approx(float(m16["loss"]), rel=1e-6)
    # post-update params agree to bf16 rounding of the first moment
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32)).max()),
        r32.params, r16.params)
    assert max(jax.tree_util.tree_leaves(deltas)) < 5e-2


def test_dispatch_retry_narrowing(monkeypatch):
    """ADVICE r3: retry ONLY transient tunnel signatures; re-raise the
    original transient error when a retry trips over donated buffers; plain
    INTERNAL execution errors are not retried."""
    import carel_tpu.train.loop as loop

    monkeypatch.setattr(loop.time, "sleep", lambda s: None)

    # transient remote-compile failure, then success -> retried
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("INTERNAL: remote_compile stream aborted")
        return "ok"

    assert loop._dispatch_with_retry(flaky) == "ok"
    assert len(calls) == 2

    # generic INTERNAL (execution-phase shape) -> NOT retried
    calls.clear()

    def hard():
        calls.append(1)
        raise RuntimeError("INTERNAL: Failed to execute XLA computation")

    with pytest.raises(RuntimeError, match="execute"):
        loop._dispatch_with_retry(hard)
    assert len(calls) == 1

    # transient, then deleted-buffer artifact -> ORIGINAL error re-raised
    calls.clear()

    def donated():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("UNAVAILABLE: response body closed")
        raise RuntimeError("Array has been deleted with shape=f32[8]")

    with pytest.raises(RuntimeError, match="response body closed"):
        loop._dispatch_with_retry(donated)
    assert len(calls) == 2
