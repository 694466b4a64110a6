"""Plain (non-VAE) pair/triple classifier trainer.

Covers the reference's pair_classifier.py (:235-396, hyperparams :399-408:
Adam 1e-5, dropout 0.1, plain BCEWithLogits, threshold self-training),
pair_classifier_self_chain.py (sentence-pair encoding + self-chain test
reader) and the CIT triple classifier's training loop (mc_classifier.py
:170-320 — same skeleton over (emotion, X, cause) triples).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carel_tpu.config import EncoderConfig, SelfStrategy
from carel_tpu.data.batching import PairArrays, cut_batch, iter_batches
from carel_tpu.data.pairs import PairSet
from carel_tpu.models.pair_classifier import PairClassifierModel
from carel_tpu.selftrain.strategies import generate_self_train_pairs
from carel_tpu.train.logging import JsonlLogger
from carel_tpu.train.metrics import prf_with_forced_misses


@dataclass(frozen=True)
class PairTrainerConfig:
    max_len: int = 128
    batch_size: int = 64
    epochs: int = 10
    self_epochs: int = 10
    self_iteration: int = 30
    learning_rate: float = 1e-5
    dropout: float = 0.1
    self_strategy: SelfStrategy = SelfStrategy.THRESHOLD
    eval_batch_size: int = 512
    seed: int = 42


@dataclass
class SimpleState:
    params: dict
    opt_state: tuple
    rng: jax.Array


def build_pair_trainer(cfg: PairTrainerConfig, encoder_cfg: EncoderConfig):
    """(model, init_fn, train_step, eval_step) for the plain classifier."""
    model = PairClassifierModel(encoder_cfg, cfg.dropout)
    tx = optax.adam(cfg.learning_rate, eps=1e-8)

    def init_fn(rng: jax.Array, max_len: int) -> SimpleState:
        p_rng, s_rng = jax.random.split(rng)
        dummy = (jnp.zeros((2, max_len), jnp.int32),
                 jnp.ones((2, max_len), jnp.int32),
                 jnp.zeros((2, max_len), jnp.int32))
        params = model.init({"params": p_rng}, *dummy)["params"]
        return SimpleState(params, tx.init(params), s_rng)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, batch["input_ids"], batch["attention_mask"],
                batch["token_type_ids"], deterministic=False,
                rngs={"dropout": rng})
            x = logits[:, 0].astype(jnp.float32)
            t = batch["pair_labels"]
            per = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
            m = batch["example_mask"]
            return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        logits = model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], deterministic=True)
        return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))

    return model, init_fn, train_step, eval_step


def _predict(eval_step, params, arrays: PairArrays, batch_size: int
             ) -> np.ndarray:
    n = len(arrays)
    probs = np.zeros(n, np.float32)
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        batch = cut_batch(arrays, idx, batch_size)
        p = np.asarray(eval_step(params, batch.as_dict()))
        probs[idx] = p[: len(idx)]
    return probs


def train_pair_classifier(
    cfg: PairTrainerConfig,
    encoder_cfg: EncoderConfig,
    train_arrays: PairArrays,
    test_arrays: PairArrays,
    num_unpred_pairs: int = 0,
    test_pairs: Optional[PairSet] = None,
    encode: Optional[Callable[[PairSet], PairArrays]] = None,
    logger: Optional[JsonlLogger] = None,
) -> Tuple[dict, Tuple[float, float, float]]:
    """Base training + threshold self-training; returns (params, best prf)."""
    logger = logger or JsonlLogger(echo=False)
    model, init_fn, train_step, eval_step = build_pair_trainer(
        cfg, encoder_cfg)
    state = init_fn(jax.random.key(cfg.seed), train_arrays.input_ids.shape[1])
    data_rng = np.random.default_rng(cfg.seed)

    best = (0.0, 0.0, 0.0)
    best_params = state.params

    def run_epochs(arrays, params, opt_state, rng, epochs, best, best_params):
        for _ in range(epochs):
            for batch in iter_batches(arrays, cfg.batch_size, rng=data_rng):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = train_step(
                    params, opt_state, batch.as_dict(), sub)
            probs = _predict(eval_step, params, test_arrays,
                             cfg.eval_batch_size)
            prf = prf_with_forced_misses(test_arrays.pair_labels, probs,
                                         num_unpred_pairs)
            logger.log({"event": "pair_eval", "p": prf[0], "r": prf[1],
                        "f1": prf[2]})
            if prf[2] > best[2]:
                best, best_params = prf, params
        return params, opt_state, rng, best, best_params

    params, opt_state, rng, best, best_params = run_epochs(
        train_arrays, state.params, state.opt_state, state.rng,
        cfg.epochs, best, best_params)

    if test_pairs is not None and encode is not None:
        st_rng = np.random.default_rng(cfg.seed + 1)
        for i in range(cfg.self_iteration):
            probs = _predict(eval_step, best_params, test_arrays,
                             cfg.eval_batch_size)
            pseudo = generate_self_train_pairs(
                test_pairs, np.round(probs), cfg.self_strategy,
                iteration=i, round_up=True, rng=st_rng)
            if len(pseudo) == 0:
                continue
            # each iteration fine-tunes FROM the best model, not the drifted
            # one: the reference's train() ends with an unconditional best-
            # checkpoint reload (pair_classifier.py:386)
            params, opt_state, rng, best, best_params = run_epochs(
                encode(pseudo), best_params, opt_state, rng,
                cfg.self_epochs, best, best_params)

    return best_params, best
