"""End-to-end driver for the original 3-latent DRL trainer.

Reproduces drl_classifier.py:802-1041 (and the bow_loss variant's learned
BoW re-weighting, drl_classifier_bow_loss.py:246-257): old-split zh data
(train domains/THUCTC_multiple/<source>.txt, test pair_data/emotion/
<target>.txt with num_unpred accounting), the six-optimizer step
(5x RMSprop adversaries + Adam, expressed as two masked optax groups in
steps_original.make_original_train_step), per-epoch full-test eval with
best-F1 orbax checkpointing + reload, and the 50-iteration self-training
loop (strategy `random` by default, drl_classifier.py:734-799).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from carel_tpu.config import CarelConfig, SelfStrategy
from carel_tpu.data.batching import PairArrays, encode_pairs, iter_batches
from carel_tpu.data.bow import build_bow_vocab_zh
from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.data.pairs import PairSet, build_pairs
from carel_tpu.models.drl_original import DrlOriginalModel, OriginalModelConfig
from carel_tpu.selftrain.strategies import generate_self_train_pairs
from carel_tpu.train import checkpoint as ckpt
from carel_tpu.train.logging import JsonlLogger
from carel_tpu.train.loop import evaluate
from carel_tpu.train.steps_original import (
    OriginalLossConfig,
    make_original_train_step,
)


def make_original_eval_step(model: DrlOriginalModel):
    """Pair probabilities with re-sampled latents (get_pair_preds,
    drl_classifier.py:337-351 pattern — stochastic eval like the flagship)."""

    def step(params, batch, rng):
        out = model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"],
            deterministic=True, sample=True, rngs={"sample": rng})
        return jax.nn.sigmoid(out["pair_logits"][:, 0].astype(jnp.float32))

    return jax.jit(step)


def _train_phase(cfg: CarelConfig, state, step, eval_step,
                 train_arrays: PairArrays, test_arrays: PairArrays,
                 num_unpred: int, model_id: str, epochs: int,
                 logger: JsonlLogger, data_rng, eval_rng,
                 best: Tuple[float, float, float]):
    """One train() call of the reference (:808-960): epochs over batches,
    eval per epoch, checkpoint on best F1."""
    saved = False
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        losses = []
        for it, batch in enumerate(iter_batches(
                train_arrays, cfg.train.batch_size, shuffle=True,
                rng=data_rng)):
            state, metrics = step(state, batch.as_dict(), it)
            losses.append(metrics["vae_loss"])
        loss = float(np.mean([np.asarray(l) for l in losses]))
        eval_rng, sub = jax.random.split(eval_rng)
        res = evaluate(eval_step, state["params"], test_arrays, num_unpred,
                       sub, cfg.train.eval_batch_size)
        logger.log({"event": "eval", "epoch": epoch, "loss": loss,
                    "precision": res.precision, "recall": res.recall,
                    "f1": res.f1, "epoch_seconds": time.time() - t0})
        if res.f1 > best[2]:
            best = (res.precision, res.recall, res.f1)
            ckpt.save_best(cfg.train.checkpoint_dir, model_id,
                           state["params"])
            saved = True
            logger.log({"event": "best", "epoch": epoch, "f1": res.f1})
    # unconditional best-ckpt reload after every train() call
    # (drl_classifier.py:954) — keeps self-training anchored to the best model
    import os

    if saved or os.path.exists(os.path.join(
            os.path.abspath(cfg.train.checkpoint_dir), f"{model_id}_best")):
        state = dict(state)
        state["params"] = ckpt.load_best(cfg.train.checkpoint_dir, model_id,
                                         state["params"])
    return state, best, eval_rng


def run_original(
    cfg: CarelConfig,
    loss_cfg: OriginalLossConfig,
    encoder_cfg,
    model_id: str,
    cache_dir: str = ".carel_cache",
    logger: Optional[JsonlLogger] = None,
    max_train_docs: int = 0,
    max_test_docs: int = 0,
) -> Tuple[dict, Tuple[float, float, float], Tuple[float, float, float]]:
    """Full original-DRL run. Returns (state, base_best, self_best)."""
    import os
    import random as _random

    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.pipeline import fit_max_len, resolve_paths

    logger = logger or JsonlLogger(echo=False)
    train_path, test_path, bow_path = resolve_paths(cfg)
    train_docs = parse_ecpe_file(train_path)
    test_docs = parse_ecpe_file(test_path)
    if max_train_docs:
        train_docs = train_docs[:max_train_docs]
    if max_test_docs:
        test_docs = test_docs[:max_test_docs]
    rng = _random.Random(cfg.data.seed)
    train_pairs = build_pairs(train_docs, test=False, rng=rng)
    test_pairs = build_pairs(test_docs, test=True, rng=rng)
    bow = build_bow_vocab_zh(bow_path)

    os.makedirs(cache_dir, exist_ok=True)
    tok_cache = os.path.join(cache_dir, f"tokenizer_{cfg.data.language}.json")
    hf = cfg.data.tokenizer if cfg.data.tokenizer not in ("auto", "") else None
    corpus = None
    if hf is None and not os.path.exists(tok_cache):
        corpus = [c.text for doc in parse_ecpe_file(bow_path)
                  for c in doc.clauses]
    tokenizer = build_tokenizer(cfg.data.language, corpus, tok_cache, hf)

    enc = dataclasses.replace(encoder_cfg, vocab_size=tokenizer.vocab_size)
    max_len = cfg.data.max_len or fit_max_len(
        tokenizer, train_pairs.pairs + test_pairs.pairs)
    train_arrays = encode_pairs(train_pairs, tokenizer, bow, max_len)
    test_arrays = encode_pairs(test_pairs, tokenizer, bow, max_len)
    num_unpred = test_pairs.num_unpred_emotions
    logger.log({"event": "config", "preset": "drl_original",
                "model_id": model_id, "train_pairs": len(train_arrays),
                "test_pairs": len(test_arrays), "num_unpred": num_unpred,
                "bow_dim": len(bow), "max_len": max_len,
                "learned_bow_weights": loss_cfg.learned_bow_weights})

    model = DrlOriginalModel(OriginalModelConfig(
        encoder=enc, bow_dim=len(bow), ec_num_class=1,
        compat_sampling=cfg.model.compat_sampling))
    init_rng = jax.random.key(cfg.train.seed)
    p_rng, s_rng, st_rng = jax.random.split(init_rng, 3)
    B, L = 2, max_len
    dummy = (jnp.zeros((B, L), jnp.int32), jnp.ones((B, L), jnp.int32),
             jnp.zeros((B, L), jnp.int32))
    params = model.init({"params": p_rng, "sample": s_rng}, *dummy)["params"]
    if cfg.model.pretrained_encoder:
        params = dict(params)
        if os.path.exists(os.path.join(cfg.model.pretrained_encoder,
                                       "config.json")):
            from carel_tpu.models.hf_port import port_hf_encoder

            params["encoder"] = port_hf_encoder(
                cfg.model.pretrained_encoder, enc)
        else:
            from carel_tpu.pretrain import load_encoder

            params["encoder"] = load_encoder(
                cfg.model.pretrained_encoder, params["encoder"])

    build = make_original_train_step(loss_cfg, model)
    state, step = build(params, st_rng)
    eval_step = make_original_eval_step(model)

    data_rng = np.random.default_rng(cfg.train.seed)
    eval_rng = jax.random.key(cfg.train.seed + 7)
    state, base_best, eval_rng = _train_phase(
        cfg, state, step, eval_step, train_arrays, test_arrays, num_unpred,
        model_id, cfg.train.epochs, logger, data_rng, eval_rng,
        (0.0, 0.0, 0.0))
    logger.log({"event": "base_done", "p": base_best[0], "r": base_best[1],
                "f1": base_best[2]})

    # self-training (drl_classifier.py:1019-1039)
    self_best = (0.0, 0.0, 0.0)
    self_rng = np.random.default_rng(cfg.train.seed + 13)
    for i in range(cfg.train.self_iteration):
        eval_rng, sub = jax.random.split(eval_rng)
        res = evaluate(eval_step, state["params"], test_arrays, num_unpred,
                       sub, cfg.train.eval_batch_size)
        pseudo = generate_self_train_pairs(
            test_pairs, res.probs, cfg.train.self_strategy, iteration=i,
            round_up=cfg.train.round_up, rng=self_rng,
            conf_margin=cfg.train.self_conf_margin)
        if len(pseudo) == 0:
            logger.log({"event": "selftrain_empty", "iteration": i + 1})
            continue
        pseudo_arrays = encode_pairs(pseudo, tokenizer, bow, max_len)
        logger.log({"event": "selftrain_iter", "iteration": i + 1,
                    "pseudo_pairs": len(pseudo)})
        state, self_best, eval_rng = _train_phase(
            cfg, state, step, eval_step, pseudo_arrays, test_arrays,
            num_unpred, model_id, cfg.train.self_epochs, logger,
            np.random.default_rng(cfg.train.seed + 100 + i), eval_rng,
            self_best)
        logger.log({"event": "selftrain_best", "iteration": i + 1,
                    "f1": self_best[2]})
    if cfg.train.self_iteration:
        logger.log({"event": "self_done", "p": self_best[0],
                    "r": self_best[1], "f1": self_best[2]})
    return state, base_best, self_best
