"""MMD vs no-MMD case analysis.

Reproduces mmd_wommd_case_analysis.py (:600-754): score the target test set
with two trained checkpoints (full model vs MMD-ablated), split pairs into
self-chain vs normal, and write a per-pair comparison CSV
(wommd_mmd_fin.csv layout: pair text, gold label, each model's prediction,
self-chain flag).

The reference resamples its stochastic eval until both models clear known F1
bars (:660-694) — a symptom of unseeded eval; here predictions take an
explicit PRNG key (or the deterministic mean-latent path), so one pass
suffices and results are reproducible.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import numpy as np

from carel_tpu.data.batching import PairArrays
from carel_tpu.data.pairs import PairSet
from carel_tpu.data.self_chain import self_chain_doc_ids
from carel_tpu.infer.pair_inference import score_pairs
from carel_tpu.train.metrics import prf_with_forced_misses


@dataclass
class CaseAnalysisResult:
    model_a_f1: float
    model_b_f1: float
    csv_path: str
    self_chain_counts: dict  # {"a_correct": ..., "b_correct": ...} on chain rows
    normal_counts: dict
    # sklearn-binary F1 over the pair file WITHOUT the forced-miss penalty —
    # the protocol behind the reference's 0.8649/0.733 acceptance gates
    # (mmd_wommd_case_analysis.py:688-694): overall + per split
    split_f1: Optional[dict] = None


def _binary_f1(labels: np.ndarray, preds: np.ndarray) -> float:
    tp = int(((labels == 1) & (preds == 1)).sum())
    fp = int(((labels == 0) & (preds == 1)).sum())
    fn = int(((labels == 1) & (preds == 0)).sum())
    return 2 * tp / (2 * tp + fp + fn) if tp else 0.0


def compare_checkpoints(
    eval_step: Callable,
    params_a,
    params_b,
    pair_set: PairSet,
    arrays: PairArrays,
    docs,
    out_csv: str,
    rng: Optional[jax.Array] = None,
    batch_size: int = 512,
    label_a: str = "mmd",
    label_b: str = "wommd",
) -> CaseAnalysisResult:
    rng = rng if rng is not None else jax.random.key(0)
    r1, r2 = jax.random.split(rng)
    probs_a, _ = score_pairs(eval_step, params_a, arrays, r1, batch_size)
    probs_b, _ = score_pairs(eval_step, params_b, arrays, r2, batch_size)
    preds_a = np.round(probs_a).astype(int)
    preds_b = np.round(probs_b).astype(int)
    labels = arrays.pair_labels.astype(int)

    chain_ids = set(self_chain_doc_ids(docs))
    is_chain = np.asarray([
        docs[e.doc_index].doc_id in chain_ids and e.emo_sen_id == e.cau_sen_id
        for e in pair_set.examples])

    f1_a = prf_with_forced_misses(labels, probs_a,
                                  pair_set.num_unpred_emotions)[2]
    f1_b = prf_with_forced_misses(labels, probs_b,
                                  pair_set.num_unpred_emotions)[2]

    with open(out_csv, "w", newline="", encoding="utf8") as f:
        w = csv.writer(f)
        w.writerow(["pair", "label", f"{label_a}_pred", f"{label_b}_pred",
                    "self_chain"])
        for i, ex in enumerate(pair_set.examples):
            w.writerow([ex.pair, labels[i], preds_a[i], preds_b[i],
                        int(is_chain[i])])

    def counts(mask):
        return {
            f"{label_a}_correct": int((preds_a[mask] == labels[mask]).sum()),
            f"{label_b}_correct": int((preds_b[mask] == labels[mask]).sum()),
            "total": int(mask.sum()),
        }

    def split_f1s(mask):
        return {f"{label_a}_f1": round(_binary_f1(labels[mask],
                                                  preds_a[mask]), 4),
                f"{label_b}_f1": round(_binary_f1(labels[mask],
                                                  preds_b[mask]), 4)}

    all_mask = np.ones(len(labels), bool)
    return CaseAnalysisResult(
        model_a_f1=f1_a, model_b_f1=f1_b, csv_path=out_csv,
        self_chain_counts=counts(is_chain),
        normal_counts=counts(~is_chain),
        split_f1={"overall": split_f1s(all_mask),
                  "self_chain": split_f1s(is_chain),
                  "normal": split_f1s(~is_chain)},
    )
