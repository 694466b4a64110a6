"""Stage-1 trainer: document-level emotion detection + self-training +
pair-file generation.

Reproduces baseline_emotion_classifier_final_devin.py's train() (:330-553):
train on the source domain, evaluate micro-PRF (labels 0-5) on the target,
confidence-threshold self-training (best emotion clause prob > 0.7 pseudo-
labels the doc), iterate while the self-train set grows, and write
pair_data/predicted_emotion/source_{src}/{tgt}.txt files on best self-F1.

Optimizer parity quirk: the reference constructs a NEW Adam INSIDE the batch
loop (devin :381, :477), so optimizer state never accumulates — each step is
effectively sign-SGD with Adam's step-1 bias correction. fresh_adam=True (the
default) reproduces that exactly; False uses a standard carried Adam, which
usually trains better.

The clause-level DANN variant (emotion_classifier.py:78-174) is a separate
driver: carel_tpu.stage1.dann_driver (CLI verb `dann`).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carel_tpu.config import EncoderConfig
from carel_tpu.models.stage1 import DocEmotionModel
from carel_tpu.stage1.data import DocArrays
from carel_tpu.stage1.pair_writer import write_pair_data
from carel_tpu.train.logging import JsonlLogger
from carel_tpu.train.metrics import micro_prf


@dataclass(frozen=True)
class Stage1Config:
    language: str = "zh"
    source_domain: str = "home"
    target_domain: str = "education"
    max_sen_len: int = 60
    max_doc_len: int = 75
    n_hidden: int = 100
    n_class: int = 7
    training_epoch: int = 10
    self_epoch: int = 5
    threshold: float = 0.7
    # pseudo-label up to top_k confident emotion clauses per doc; the 'com'
    # variant (baseline_emotion_classifier_com.py:33-34) uses top_k=2
    top_k: int = 1
    batch_size: int = 4
    learning_rate: float = 2e-5
    keep_softmax: float = 1.0
    l2_reg: float = 1e-5
    emotion_weight: float = 1.0
    clause_mixer: str = "bilstm"
    fresh_adam: bool = True  # reference's new-Adam-per-step quirk
    seed: int = 42
    checkpoint_dir: str = "runs/ckpt"  # gitignored; matches TrainConfig
    save_dir: str = ""  # pair-file output dir; default mirrors the reference


def _fresh_adam_update(grads, lr: float, eps: float = 1e-8):
    """One step of a freshly-initialized Adam == lr * g / (|g| + eps)."""
    return jax.tree_util.tree_map(
        lambda g: -lr * g / (jnp.abs(g) + eps), grads)


def make_stage1_step(cfg: Stage1Config, model: DocEmotionModel,
                     tx: Optional[optax.GradientTransformation]):
    def loss_fn(params, batch, rng):
        pred, reg = model.apply(
            {"params": params}, batch["x_ids"], batch["x_masks"],
            batch["x_types"], deterministic=False,
            rngs={"dropout": rng})
        # -sum(y * log(pred)) / sum(doc_len) (devin :378-379); padded clause
        # rows have all-zero one-hots so they contribute nothing
        valid = jnp.maximum(jnp.sum(batch["doc_len"]), 1.0)
        ce = -jnp.sum(batch["y_emotion"] * jnp.log(pred + 1e-12)) / valid
        loss = ce * cfg.emotion_weight + reg * cfg.l2_reg
        return loss, pred

    if cfg.fresh_adam:
        def step(params, opt_state, batch, rng):
            (loss, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng)
            updates = _fresh_adam_update(grads, cfg.learning_rate)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
    else:
        def step(params, opt_state, batch, rng):
            (loss, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    return jax.jit(step)


def make_stage1_eval(model: DocEmotionModel):
    def ev(params, batch):
        pred, _ = model.apply(
            {"params": params}, batch["x_ids"], batch["x_masks"],
            batch["x_types"], deterministic=True)
        return pred

    return jax.jit(ev)


def _batch_dict(arr: DocArrays, idx) -> dict:
    sub = arr.take(idx)
    return {
        "x_ids": jnp.asarray(sub.x_ids),
        "x_masks": jnp.asarray(sub.x_masks),
        "x_types": jnp.asarray(sub.x_types),
        "doc_len": jnp.asarray(sub.doc_len, jnp.float32),
        "y_emotion": jnp.asarray(sub.y_emotion),
    }


def _predict_all(eval_step, params, arr: DocArrays, batch_size: int = 8
                 ) -> np.ndarray:
    preds = []
    for s in range(0, len(arr), batch_size):
        idx = np.arange(s, min(s + batch_size, len(arr)))
        preds.append(np.asarray(eval_step(params, _batch_dict(arr, idx))))
    return np.concatenate(preds, 0)


def _self_label(arr: DocArrays, probs: np.ndarray, threshold: float,
                top_k: int = 1) -> Optional[DocArrays]:
    """Pseudo-label target docs whose best emotion clause(s) clear the
    threshold (generate_self_train_data, devin :106-160; the 'com' variant
    keeps up to top_k confident clauses, com :33-34)."""
    keep, y_new = [], []
    for i in range(len(arr)):
        d = int(arr.doc_len[i])
        candidates = []  # (prob, clause, emotion)
        for j in range(d):
            e = int(np.argmax(probs[i, j]))
            if e != 6:
                candidates.append((float(probs[i, j, e]), j, e))
        candidates.sort(reverse=True)
        chosen = [(j, e) for p, j, e in candidates[:top_k] if p > threshold]
        if chosen:
            y = np.zeros_like(arr.y_emotion[i])
            chosen_map = dict(chosen)
            for j in range(d):
                if j in chosen_map:
                    y[j, chosen_map[j]] = 1.0
                else:
                    y[j, 6] = 1.0
            keep.append(i)
            y_new.append(y)
    if not keep:
        return None
    sub = arr.take(np.asarray(keep))
    sub.y_emotion = np.stack(y_new)
    return sub


def _epoch(cfg, arr, params, opt_state, step, rng, data_rng):
    order = np.arange(len(arr))
    data_rng.shuffle(order)
    for s in range(0, len(order), cfg.batch_size):
        idx = order[s : s + cfg.batch_size]
        if len(idx) < cfg.batch_size:  # pad by repeating (tiny batches of 4)
            idx = np.concatenate([idx, order[: cfg.batch_size - len(idx)]])
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(
            params, opt_state, _batch_dict(arr, idx), sub)
    return params, opt_state, rng


def _eval_prf(eval_step, params, test: DocArrays):
    probs = _predict_all(eval_step, params, test)
    pred_op = np.argmax(probs, -1)
    true_op = np.argmax(test.y_emotion, -1)
    return micro_prf(pred_op, true_op, test.doc_len), probs


def train_stage1(
    cfg: Stage1Config,
    encoder_cfg: EncoderConfig,
    train_arr: DocArrays,
    test_arr: DocArrays,
    tokenizer,
    logger: Optional[JsonlLogger] = None,
    write_pairs: bool = True,
    encoder_ckpt: str = "",  # orbax (carel_tpu.pretrain) or HF dir
) -> Tuple[dict, Tuple[float, float, float], Optional[str]]:
    """Full stage-1 run. Returns (params, best (p,r,f1), pair_file_path)."""
    logger = logger or JsonlLogger(echo=False)
    model = DocEmotionModel(encoder_cfg, cfg.n_hidden, cfg.n_class,
                            cfg.keep_softmax, cfg.clause_mixer)
    rng = jax.random.key(cfg.seed)
    p_rng, d_rng, rng = jax.random.split(rng, 3)
    init_b = _batch_dict(train_arr, np.arange(min(2, len(train_arr))))
    params = model.init({"params": p_rng, "dropout": d_rng},
                        init_b["x_ids"], init_b["x_masks"],
                        init_b["x_types"], deterministic=False)["params"]
    if encoder_ckpt:
        # pretrained encoder (the reference downloads hub BERT, devin :265);
        # in-framework MLM output or a local HF checkpoint dir
        params = dict(params)
        if os.path.exists(os.path.join(encoder_ckpt, "config.json")):
            from carel_tpu.models.hf_port import port_hf_encoder

            params["encoder"] = port_hf_encoder(encoder_ckpt, encoder_cfg)
        else:
            from carel_tpu.pretrain import load_encoder

            params["encoder"] = load_encoder(encoder_ckpt,
                                             params["encoder"])
    tx = None if cfg.fresh_adam else optax.adam(cfg.learning_rate, eps=1e-8)
    opt_state = None if cfg.fresh_adam else tx.init(params)
    step = make_stage1_step(cfg, model, tx)
    eval_step = make_stage1_eval(model)
    data_rng = np.random.default_rng(cfg.seed)

    model_id = str(uuid.uuid4())
    save_dir = cfg.save_dir or os.path.join(
        "pair_data/predicted_emotion", f"source_{cfg.source_domain}")
    pair_file = None

    best_f1 = -1.0
    best_params = params
    best_probs = None
    for epoch in range(1, cfg.training_epoch + 1):
        params, opt_state, rng = _epoch(
            cfg, train_arr, params, opt_state, step, rng, data_rng)
        (p, r, f1), probs = _eval_prf(eval_step, params, test_arr)
        logger.log({"event": "stage1_eval", "epoch": epoch,
                    "p": p, "r": r, "f1": f1})
        if f1 > best_f1:
            best_f1, best_params, best_probs = f1, params, probs
    best = (0.0, 0.0, best_f1)

    # self-training: iterate while the pseudo-labelled set grows
    self_best_f1 = -1.0
    last_size = 0
    probs = best_probs
    while True:
        # each iteration restarts from the best checkpoint (devin :449:
        # `self_best_model = load_ckp(...)` at the top of the while loop)
        params = best_params
        pseudo = _self_label(test_arr, probs, cfg.threshold, cfg.top_k)
        size = len(train_arr) + (len(pseudo) if pseudo is not None else 0)
        if size <= last_size or pseudo is None:
            break
        last_size = size
        merged = train_arr.concat(pseudo)
        logger.log({"event": "stage1_selftrain", "set_size": size})
        for epoch in range(1, cfg.self_epoch + 1):
            params, opt_state, rng = _epoch(
                cfg, merged, params, opt_state, step, rng, data_rng)
            (p, r, f1), ep_probs = _eval_prf(eval_step, params, test_arr)
            logger.log({"event": "stage1_self_eval", "epoch": epoch,
                        "p": p, "r": r, "f1": f1})
            if f1 > self_best_f1:
                self_best_f1 = f1
                best_params = params
                probs = ep_probs
                best = (p, r, f1)
                if write_pairs:
                    pair_file = os.path.join(
                        save_dir, f"{cfg.target_domain}.txt")
                    pred_emotion = np.argmax(probs, -1)
                    write_pair_data(pair_file, test_arr, pred_emotion,
                                    tokenizer)
                    logger.log({"event": "stage1_pair_file",
                                "path": pair_file})

    return best_params, best, pair_file
