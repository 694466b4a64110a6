"""Eval-sampling distribution of a stage-2 checkpoint (CPU, many draws).

The reference's eval is stochastic — latents are re-sampled at prediction
time with unseeded torch RNG (flagship :265-282, :345-351), so its pair-F1
numbers are DISTRIBUTIONS, and its acceptance script literally resamples
until the gates clear (mmd_wommd_case_analysis.py:660-694). SURVEY hard
part #2 asks for interval parity, not point parity.

A full eval per draw is ~20-40 min on this 1-core host, but the
stochasticity enters AFTER the encoder: mu/log_var are deterministic per
checkpoint. So: one expensive encoder pass extracts (e_mu, e_lv, c_mu,
c_lv) for every test pair, then each draw costs only the reparameterized
sample + the 48-dim pair head — thousands of draws for the price of one
eval. Per-512-batch key splitting mirrors score_pairs' deployed eval
structure (one shared-eps vector per batch under the compat quirk).

Outputs one JSON line: per-protocol mean/std/min/max F1 over --draws draws
plus pass rates against the reference's 0.733 / 0.8649 gates.

Usage: python scripts/eval_distribution.py <model_id> [target_domain]
           [--preset en_newsplit --cache_dir runs/cache_en] [--draws 200]
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU by default; CAREL_EVAL_DEVICE=native keeps the ambient axon backend
# (see ref_protocol_f1.py — only for the serial TPU queue)
if os.environ.get("CAREL_EVAL_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ref_protocol_f1 import _resolve_id  # noqa: E402
from carel_tpu.cli.main import PRESETS, _encoder_preset  # noqa: E402
from carel_tpu.data.batching import cut_batch  # noqa: E402
from carel_tpu.models.heads import sample_prior  # noqa: E402
from carel_tpu.pipeline import build_pipeline, init_state  # noqa: E402
from carel_tpu.train import checkpoint as ckpt  # noqa: E402
from carel_tpu.train.metrics import binary_prf, prf_with_forced_misses  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("model_id")
    ap.add_argument("target", nargs="?", default=None)
    ap.add_argument("--preset", default="ec_mmd_final_mul_newsplit_emnlp")
    ap.add_argument("--cache_dir", default="runs/cache")
    ap.add_argument("--draws", type=int, default=200)
    args = ap.parse_args()
    model_id = _resolve_id(args.model_id)
    cfg = PRESETS[args.preset]
    data = dataclasses.replace(cfg.data, data_root="/root/reference")
    if args.target is not None:
        data = dataclasses.replace(data, target_domain=args.target)
    cfg = dataclasses.replace(
        cfg, data=data,
        train=dataclasses.replace(cfg.train, checkpoint_dir="runs/ckpt"))
    enc = _encoder_preset("base", cfg.data.language)
    pipe = build_pipeline(cfg, cache_dir=args.cache_dir, encoder_cfg=enc)
    cfg = pipe.cfg
    model = pipe.model
    state = init_state(pipe)
    params = ckpt.load_best(cfg.train.checkpoint_dir, model_id, state.params)

    # one deterministic encoder pass: latent params for every test pair
    def _extract(mdl, ids, am, tt):
        e, c = mdl.features(ids, am, tt, deterministic=True)
        return mdl.heads.latent_params(
            e.astype(jnp.float32), c.astype(jnp.float32))

    @jax.jit
    def extract(params, batch):
        return model.apply({"params": params}, batch["input_ids"],
                           batch["attention_mask"], batch["token_type_ids"],
                           method=_extract)

    arrays, pair_set = pipe.test_arrays, pipe.test_pairs
    n, bs = len(arrays), cfg.train.eval_batch_size
    mus = []
    for start in range(0, n, bs):
        idx = np.arange(start, min(start + bs, n))
        d = cut_batch(arrays, idx, bs).as_dict()
        out = [np.asarray(x)[: len(idx)] for x in extract(params, d)]
        mus.append(out)
    e_mu, e_lv, c_mu, c_lv = (np.concatenate([m[i] for m in mus])
                              for i in range(4))
    labels = np.asarray([ex.label for ex in pair_set.examples], np.int64)

    # cheap draws: reparameterized sample + pair head, per-512 key splits
    compat = cfg.model.compat_sampling

    def _head(mdl, ze, zc):
        return mdl.heads.pair_logits(
            jnp.concatenate([ze, zc], axis=-1), deterministic=True)

    @jax.jit
    def draw_chunk(params, em, el, cm, cl, key):
        r1, r2 = jax.random.split(key)
        ze = sample_prior(r1, em, el, compat=compat)
        zc = sample_prior(r2, cm, cl, compat=compat)
        logits = model.apply({"params": params}, ze, zc, method=_head)
        return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))

    pad = (-n) % bs
    em, el, cm, cl = (np.concatenate([a, np.zeros((pad,) + a.shape[1:],
                                                  a.dtype)])
                      for a in (e_mu, e_lv, c_mu, c_lv))
    gate_f1, miss_f1 = [], []
    for d in range(args.draws):
        rng = jax.random.key(1000 + d)
        probs = np.zeros(n + pad, np.float32)
        for start in range(0, n + pad, bs):
            rng, sub = jax.random.split(rng)
            sl = slice(start, start + bs)
            probs[sl] = np.asarray(draw_chunk(
                params, em[sl], el[sl], cm[sl], cl[sl], sub))
        preds = np.round(probs[:n]).astype(np.int64)
        gate_f1.append(binary_prf(labels, preds)[2])
        miss_f1.append(prf_with_forced_misses(
            labels, probs[:n], pipe.num_unpred_pairs)[2])
    g, m = np.asarray(gate_f1), np.asarray(miss_f1)

    def stats(a):
        return {"mean": round(float(a.mean()), 4),
                "std": round(float(a.std()), 4),
                "min": round(float(a.min()), 4),
                "max": round(float(a.max()), 4)}

    print(json.dumps({
        "model_id": model_id, "target": cfg.data.target_domain,
        "draws": args.draws, "num_test_pairs": int(n),
        "num_unpred_pairs": int(pipe.num_unpred_pairs),
        "reference_gate_protocol_f1": stats(g),
        "forced_miss_protocol_f1": stats(m),
        "gate_pass_rate": {
            "wommd_0.733": round(float((g > 0.733).mean()), 3),
            "mmd_0.8649": round(float((g > 0.8649).mean()), 3)},
    }))


if __name__ == "__main__":
    main()
