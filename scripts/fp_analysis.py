"""False-positive structure of a stage-2 checkpoint (education precision gap).

RESULTS.md round-3 shows the education residual is false positives on
normal (non-self-chain) pairs. This script characterizes those FPs on CPU:
sentence distance |emo - cau|, temporal order, and whether the FP's emotion
clause is a *matched* gold emotion (wrong cause picked) or a stage-1
*leftover* prediction (emotion that has no gold pair at all) — the two FP
sources the reference's test-mode candidate enumeration creates
(drl_classifier_ec_mmd_final_mul.py:663-708).

Usage: python scripts/fp_analysis.py <model_id> [target_domain]
"""

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from carel_tpu.cli.main import PRESETS, _encoder_preset  # noqa: E402
from carel_tpu.data.ecpe_format import parse_ecpe_file  # noqa: E402
from carel_tpu.infer.pair_inference import score_pairs  # noqa: E402
from carel_tpu.pipeline import build_pipeline, init_state, resolve_paths  # noqa: E402
from carel_tpu.train import checkpoint as ckpt  # noqa: E402
from carel_tpu.train.steps import make_eval_step  # noqa: E402
import dataclasses  # noqa: E402


def main():
    model_id = sys.argv[1]
    target = sys.argv[2] if len(sys.argv) > 2 else "education"
    cfg = PRESETS["ec_mmd_final_mul_newsplit_emnlp"]
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, data_root="/root/reference", target_domain=target),
        train=dataclasses.replace(cfg.train, checkpoint_dir="runs/ckpt"))
    enc = _encoder_preset("base", cfg.data.language)
    pipe = build_pipeline(cfg, cache_dir="runs/cache", encoder_cfg=enc)
    cfg = pipe.cfg
    state = init_state(pipe)
    params = ckpt.load_best(cfg.train.checkpoint_dir, model_id, state.params)
    ev = make_eval_step(cfg, pipe.model)
    probs, _ = score_pairs(ev, params, pipe.test_arrays, jax.random.key(0),
                           cfg.train.eval_batch_size)
    preds = np.round(probs).astype(np.int64)

    # gold emotion sentence ids per doc (to split matched vs leftover FPs)
    _, test_path, _ = resolve_paths(cfg)
    test_docs = parse_ecpe_file(test_path)
    gold_emo = collections.defaultdict(set)
    for di, doc in enumerate(test_docs):
        for e, _c in doc.pairs:
            gold_emo[di].add(e)

    rows = collections.Counter()
    dist_hist = {"fp": collections.Counter(), "tp": collections.Counter()}
    for ex, pred in zip(pipe.test_pairs.examples, preds):
        if pred != 1:
            continue
        kind = "tp" if ex.label == 1 else "fp"
        d = abs(ex.emo_sen_id - ex.cau_sen_id)
        dist_hist[kind][min(d, 5)] += 1
        if kind == "fp":
            src = ("matched_gold_emotion"
                   if ex.emo_sen_id in gold_emo[ex.doc_index]
                   else "leftover_pred_emotion")
            rows[src] += 1
            rows[f"{src}_order_{'c<=e' if ex.temporal_order else 'c>e'}"] += 1
            if ex.emo_sen_id == ex.cau_sen_id:
                rows["self_chain_fp"] += 1

    print(json.dumps({
        "model_id": model_id, "target": target,
        "fp_sources": dict(rows),
        "pred_pos": int(preds.sum()),
        "dist_hist_fp": dict(sorted(dist_hist["fp"].items())),
        "dist_hist_tp": dict(sorted(dist_hist["tp"].items())),
    }))


if __name__ == "__main__":
    main()
