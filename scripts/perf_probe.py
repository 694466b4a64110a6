"""Round-4 step-time probe: measure the candidate MFU levers on the real
chip, one JSON line per variant (value-fetch timed, best of 3 rounds of 10
chained steps — the only trustworthy timing on the axon backend).

Variants (vs the 50.5 ms b64xs96 threefry baseline, scripts/step_breakdown.py):
  b64/threefry      sanity re-measure of the round-2 baseline
  b64/rbg           the round-3 projection to verify (~36 ms expected)
  b64/rbg+bf16mu    + Adam first moment in bf16 (~0.8 GB/step less HBM)
  b64/rbg/nodrop    dropout disabled = RNG+mask-apply upper bound
  b256/rbg          amortize the batch-independent costs (Adam ~5.3 ms)
  b64/rbg+remat     remat encoder layers (HBM-bound? bwd/fwd 1.53 in r3)
  b256/rbg+remat    remat at the amortizing batch
  b256/rbg+bf16mu   the full TPU-tuned stack

Usage: python scripts/perf_probe.py [--variants v1,v2,...]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _build(batch_size: int, rng_impl: str, mu_dtype: str, dropout: float,
           remat: bool = False):
    from __graft_entry__ import _flagship_cfg
    from carel_tpu.models.drl import DrlModel
    from carel_tpu.train.state import create_train_state
    from carel_tpu.train.steps import make_train_step

    cfg = _flagship_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, dropout=dropout,
            encoder=dataclasses.replace(cfg.model.encoder, remat=remat)),
        train=dataclasses.replace(cfg.train, batch_size=batch_size,
                                  optim_mu_dtype=mu_dtype),
        data=dataclasses.replace(cfg.data, max_len=96))
    model = DrlModel(cfg.model)
    B, L = batch_size, 96
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.model.encoder.vocab_size, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "token_type_ids": jnp.zeros((B, L), jnp.int32),
        "pair_labels": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        "emotion_labels": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
        "bow_indices": jnp.asarray(
            rng.integers(0, cfg.model.bow_dim, (B, 32)), jnp.int32),
        "bow_weights": jnp.full((B, 32), 1.0 / 32, jnp.float32),
        "example_mask": jnp.ones(B, jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch["input_ids"], batch["attention_mask"], batch["token_type_ids"])
    key = jax.random.key(2, impl=rng_impl if rng_impl != "threefry" else None)
    state = create_train_state(cfg, variables["params"], key)
    step = make_train_step(cfg, model)
    return cfg, state, step, batch


def _time_step(state, step, batch, n_steps=10, rounds=3):
    for i in range(2):
        state, metrics = step(state, batch, i, 0.0)
    _ = float(metrics["loss"])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch, i, 0.0)
        _ = float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / n_steps


VARIANTS = {
    "b64/threefry": dict(batch_size=64, rng_impl="threefry",
                         mu_dtype="float32", dropout=0.1),
    "b64/rbg": dict(batch_size=64, rng_impl="rbg",
                    mu_dtype="float32", dropout=0.1),
    "b64/rbg+bf16mu": dict(batch_size=64, rng_impl="rbg",
                           mu_dtype="bfloat16", dropout=0.1),
    "b64/rbg/nodrop": dict(batch_size=64, rng_impl="rbg",
                           mu_dtype="float32", dropout=0.0),
    "b256/rbg": dict(batch_size=256, rng_impl="rbg",
                     mu_dtype="float32", dropout=0.1),
    # remat encoder layers: if the step is HBM-bound (bwd/fwd 1.53 measured
    # r3), recompute-over-store can win despite +1/3 fwd FLOPs
    "b64/rbg+remat": dict(batch_size=64, rng_impl="rbg",
                          mu_dtype="float32", dropout=0.1, remat=True),
    "b256/rbg+remat": dict(batch_size=256, rng_impl="rbg",
                           mu_dtype="float32", dropout=0.1, remat=True),
    # the full TPU-tuned stack at the amortizing batch
    "b256/rbg+bf16mu": dict(batch_size=256, rng_impl="rbg",
                            mu_dtype="bfloat16", dropout=0.1),
}


def main():
    import os

    from bench import _train_flops_per_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".carel_cache", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for name in args.variants.split(","):
        spec = VARIANTS[name.strip()]
        t0 = time.perf_counter()
        cfg, state, step, batch = _build(**spec)
        dt = _time_step(state, step, batch)
        B = spec["batch_size"]
        flops = _train_flops_per_step(B, 96)
        tps = flops / dt / 1e12
        print(json.dumps({
            "variant": name, "ms_per_step": round(dt * 1e3, 2),
            "pairs_per_sec": round(B / dt, 1),
            "mfu_pct": round(100 * tps / V5E_BF16_PEAK_TFLOPS, 1),
            "build_plus_compile_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        del state, step, batch


if __name__ == "__main__":
    main()
