"""Reference-protocol rescoring of a stage-2 checkpoint (CPU, one model).

Two pair-F1 protocols coexist in the reference:
  - forced-miss (drl_classifier_ec_mmd_final_mul.py:861-870): one
    (label=1, pred=0) appended per gold emotion clause stage 1 missed.
    This repo's training evals report THIS (the stricter) number.
  - reference-gate (mmd_wommd_case_analysis.py:688-694): sklearn binary
    F1 over the test pair file as-is — the protocol behind the published
    0.733 (wo-MMD) / 0.8649 (MMD) acceptance gates.

Finance round 5 showed the spread matters: 0.8168 forced-miss == 0.8662
reference-gate (results/finance_mmd_case_summary.json). This script scores
one checkpoint both ways so every domain's gate comparison is
apples-to-apples.

Usage: python scripts/ref_protocol_f1.py <model_id> [target_domain]
           [--preset en_newsplit --cache_dir runs/cache_en]   # en runs
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU by default (safe anywhere); CAREL_EVAL_DEVICE=native keeps the ambient
# backend (the axon TPU) — ONLY for use inside the serial TPU queue, where a
# full-size eval is minutes instead of the ~40 CPU-minutes on this 1-core host
if os.environ.get("CAREL_EVAL_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from carel_tpu.cli.main import PRESETS, _encoder_preset  # noqa: E402
from carel_tpu.infer.pair_inference import score_pairs  # noqa: E402
from carel_tpu.pipeline import build_pipeline, init_state  # noqa: E402
from carel_tpu.train import checkpoint as ckpt  # noqa: E402
from carel_tpu.train.metrics import binary_prf, prf_with_forced_misses  # noqa: E402
from carel_tpu.train.steps import make_eval_step  # noqa: E402


def _resolve_id(prefix: str, ckpt_dir: str = "runs/ckpt") -> str:
    import glob
    hits = glob.glob(os.path.join(ckpt_dir, f"{prefix}*_best"))
    if len(hits) != 1:
        raise SystemExit(f"{len(hits)} checkpoints match {prefix!r}")
    return os.path.basename(hits[0])[: -len("_best")]


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("model_id")
    ap.add_argument("target", nargs="?", default=None,
                    help="zh target domain; omit for en (preset default)")
    ap.add_argument("--preset", default="ec_mmd_final_mul_newsplit_emnlp")
    ap.add_argument("--cache_dir", default="runs/cache")
    ap.add_argument("--test_file", default="",
                    help="explicit test pair file (en in-framework stage-1)")
    args = ap.parse_args()
    model_id, target = _resolve_id(args.model_id), args.target
    cfg = PRESETS[args.preset]
    data = dataclasses.replace(cfg.data, data_root="/root/reference")
    if args.test_file:
        data = dataclasses.replace(data, test_file=args.test_file)
    if target is not None:
        data = dataclasses.replace(data, target_domain=target)
    else:
        target = data.target_domain
    cfg = dataclasses.replace(
        cfg, data=data,
        train=dataclasses.replace(cfg.train, checkpoint_dir="runs/ckpt"))
    enc = _encoder_preset("base", cfg.data.language)
    pipe = build_pipeline(cfg, cache_dir=args.cache_dir, encoder_cfg=enc)
    cfg = pipe.cfg
    state = init_state(pipe)
    params = ckpt.load_best(cfg.train.checkpoint_dir, model_id, state.params)
    ev = make_eval_step(cfg, pipe.model)
    probs, _ = score_pairs(ev, params, pipe.test_arrays, jax.random.key(0),
                           cfg.train.eval_batch_size)
    labels = np.asarray([ex.label for ex in pipe.test_pairs.examples],
                        np.int64)
    preds = np.round(np.asarray(probs[: len(labels)])).astype(np.int64)

    gp, gr, gf1 = binary_prf(labels, preds)
    fp_, fr, ff1 = prf_with_forced_misses(
        labels, probs[: len(labels)], pipe.num_unpred_pairs)
    print(json.dumps({
        "model_id": model_id, "target": target,
        "num_test_pairs": int(len(labels)),
        "num_unpred_pairs": int(pipe.num_unpred_pairs),
        "reference_gate_protocol": {
            "precision": round(gp, 4), "recall": round(gr, 4),
            "f1": round(gf1, 4)},
        "forced_miss_protocol": {
            "precision": round(fp_, 4), "recall": round(fr, 4),
            "f1": round(ff1, 4)},
        "gates": {"wommd": 0.733, "mmd": 0.8649},
    }))


if __name__ == "__main__":
    main()
