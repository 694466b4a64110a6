"""Clause-level DANN emotion-classifier driver.

Reproduces the full experiment of `emotion_classifier.py:448-553`: read the
source and target domain files into clause-level (sentence, label) sets
(:216-252), train the 7-class clause classifier with inverse-frequency
imbalanced sampling (:273, :499), evaluate micro-P/R/F1 over labels 0-5 on
the full target set each epoch (:388-392), then run `self_iteration`
self-training rounds of 10 epochs each where the WHOLE target set is
pseudo-labelled by the current best model (generate_self_train_data,
:255-277 — no confidence threshold, unlike the doc-level stage-1) and
becomes the training set.

The reference ships with the domain-adversarial term commented out of its
train loop (:279-288, 330-347) even though the model carries the GRL + domain
head (:78-110, 154-174); `use_domain_loss` toggles between the shipped recipe
(False) and the full DANN objective (True, the default here — it is the
component's reason to exist).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from carel_tpu.config import EncoderConfig
from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.models.dann import (
    ClauseEmotionDANN,
    init_dann,
    predict_dann,
    train_dann,
)
from carel_tpu.train.metrics import micro_prf


@dataclass(frozen=True)
class DannConfig:
    source_domain: str = "society"
    target_domain: str = "finance"
    doc_dir: str = "domains/THUCTC_multiple"
    epochs: int = 20  # epochs_num (emotion_classifier.py:467)
    self_iteration: int = 5  # :468
    self_epochs: int = 10  # opt.epochs_num = 10 before the loop (:530)
    batch_size: int = 32  # :469
    learning_rate: float = 1e-5  # :471
    domain_weight: float = 3.0  # GRL lambda (:472)
    max_len: int = 128  # ECPEDataset.max_len (:183)
    use_domain_loss: bool = True
    seed: int = 42


def read_clause_data(path: str) -> Tuple[list, np.ndarray]:
    """Clause-level (sentence, label) pairs (emotion_classifier.py:216-252).

    The reference takes `line.split(",")[3].replace(" ", "")` — the comma-
    truncated clause text with spaces stripped — and maps the emotion word of
    field 1 to codes 0..6 (6 = null)."""
    sentences, labels = [], []
    for doc in parse_ecpe_file(path):
        for c in doc.clauses:
            sentences.append((c.text_field3 or c.text).replace(" ", ""))
            labels.append(c.emotion)
    return sentences, np.asarray(labels, np.int32)


def _encode(tokenizer, sentences, labels, max_len: int) -> dict:
    enc = tokenizer.encode_batch(sentences, max_len)
    return {
        "input_ids": enc.input_ids,
        "attention_mask": enc.attention_mask,
        "token_type_ids": enc.token_type_ids,
        "labels": np.asarray(labels, np.int32),
    }


def _flat_prf(pred: np.ndarray, true: np.ndarray):
    """sklearn micro P/R/F1 with labels=[0..5] over flat clause arrays
    (emotion_classifier.py:388-392)."""
    n = len(pred)
    return micro_prf(pred[None, :], true[None, :], np.asarray([n]))


def run_dann(
    cfg: DannConfig,
    encoder_cfg: EncoderConfig,
    tokenizer,
    data_root: str,
    logger=None,
    encoder_params=None,
    encoder_ckpt: str = "",  # orbax dir (carel_tpu.pretrain) or HF dir
    max_clauses: int = 0,  # test-size cap; 0 = all
) -> dict:
    """Full DANN experiment; returns best base and self-training metrics."""
    src_path = os.path.join(data_root, cfg.doc_dir,
                            f"{cfg.source_domain}.txt")
    tgt_path = os.path.join(data_root, cfg.doc_dir,
                            f"{cfg.target_domain}.txt")
    src_sent, src_y = read_clause_data(src_path)
    tgt_sent, tgt_y = read_clause_data(tgt_path)
    if max_clauses:
        src_sent, src_y = src_sent[:max_clauses], src_y[:max_clauses]
        tgt_sent, tgt_y = tgt_sent[:max_clauses], tgt_y[:max_clauses]

    source = _encode(tokenizer, src_sent, src_y, cfg.max_len)
    target = _encode(tokenizer, tgt_sent, tgt_y, cfg.max_len)

    model = ClauseEmotionDANN(encoder_cfg, domain_weight=cfg.domain_weight)
    params, batch_stats = init_dann(model, source, cfg.seed,
                                    encoder_params=encoder_params)
    if encoder_ckpt:
        params = dict(params)
        if os.path.exists(os.path.join(encoder_ckpt, "config.json")):
            from carel_tpu.models.hf_port import port_hf_encoder

            params["encoder"] = port_hf_encoder(encoder_ckpt, encoder_cfg)
        else:  # orbax dir from carel_tpu.pretrain
            from carel_tpu.pretrain import load_encoder

            params["encoder"] = load_encoder(encoder_ckpt,
                                             params["encoder"])

    best = {"p": 0.0, "r": 0.0, "f1": -1.0, "params": params,
            "batch_stats": batch_stats}

    def evaluate(params, batch_stats, epoch, phase, iteration=0):
        probs = predict_dann(model, params, batch_stats, target)
        pred = probs.argmax(-1)
        p, r, f1 = _flat_prf(pred, target["labels"])
        if logger:
            logger.log({"event": f"dann_{phase}_eval", "epoch": epoch,
                        "iteration": iteration, "p": p, "r": r, "f1": f1})
        if f1 > best["f1"]:
            best.update(p=p, r=r, f1=f1, params=params,
                        batch_stats=batch_stats)
        return p, r, f1

    # base phase: labeled source vs unlabeled target
    params, batch_stats, opt_state = train_dann(
        model, source, target,
        epochs=cfg.epochs, batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate, seed=cfg.seed, logger=logger,
        init=(params, batch_stats, None), labeled_domain=0,
        use_domain_loss=cfg.use_domain_loss,
        eval_fn=lambda p, b, e: evaluate(p, b, e, "base"))
    base_best = {"p": best["p"], "r": best["r"], "f1": best["f1"]}

    # self-training: pseudo-label the ENTIRE target set with the current
    # best model and train on it (emotion_classifier.py:255-277, 527-543);
    # the optimizer state carries across iterations (:500 creates one Adam)
    for it in range(1, cfg.self_iteration + 1):
        probs = predict_dann(model, best["params"], best["batch_stats"],
                             target)
        pseudo = dict(target)
        pseudo["labels"] = probs.argmax(-1).astype(np.int32)
        if logger:
            logger.log({"event": "dann_selftrain", "iteration": it,
                        "pseudo_label_hist":
                            np.bincount(pseudo["labels"],
                                        minlength=7).tolist()})
        params, batch_stats, opt_state = train_dann(
            model, pseudo, source,
            epochs=cfg.self_epochs, batch_size=cfg.batch_size,
            learning_rate=cfg.learning_rate, seed=cfg.seed + it,
            logger=logger,
            init=(best["params"], best["batch_stats"], opt_state),
            labeled_domain=1, use_domain_loss=cfg.use_domain_loss,
            eval_fn=lambda p, b, e, _it=it: evaluate(p, b, e, "self", _it))

    return {
        "base": base_best,
        "best": {"p": best["p"], "r": best["r"], "f1": best["f1"]},
        "params": best["params"],
        "batch_stats": best["batch_stats"],
    }
