"""Benchmark: flagship train-step throughput on the local accelerator.

Measures ECPE pairs/sec/chip for the full CAREL-VAE training step (bert-base
encoder in bf16, VAE heads, MMD regularizer, pos-weighted pair BCE, BoW
reconstruction over a 23.8k vocab) at seq 128. Tracked metric per BASELINE.md:
"ECPE docs/sec/chip (train)".

TIMING METHODOLOGY (important): on the axon remote-TPU backend,
jax.block_until_ready returns before device execution completes (verified: a
known 1.1-TFLOP matmul "measures" >10 PFLOP/s with block_until_ready). The
only trustworthy synchronization is fetching a VALUE computed by the step
(device->host transfer of the final loss), which forces the whole dependency
chain. This bench times N chained steps ending in a float() fetch, and
reports the best of 3 rounds (transient tunnel contention can halve a round).

vs_baseline: the reference (PyTorch BERT-base fwd+bwd, batch 64, seq 128,
single A100, anomaly detection ON — job_group_devin.sh:3-11, flagship :837)
has no published throughput; 800 pairs/s is our recorded envelope estimate
for that setup (BASELINE.md: the build must measure its own baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_PAIRS_PER_SEC = 800.0
BENCH_BATCH = 64


def main() -> None:
    # persistent compile cache so repeat bench invocations skip the
    # multi-minute first compile
    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".carel_cache", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from carel_tpu.models.drl import DrlModel
    from carel_tpu.train.state import create_train_state
    from carel_tpu.train.steps import make_train_step

    cfg = _flagship_cfg()
    # measured (value-fetch timed): XLA attention beats the flash kernel at
    # s128 (66.5 vs 82 ms/step at b64); larger batches scale linearly
    # (compute-bound), so the reference's b64 is also the best operating
    # point per pair
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=BENCH_BATCH))
    model = DrlModel(cfg.model)
    B, L = cfg.train.batch_size, cfg.data.max_len
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
    state = create_train_state(cfg, variables["params"], jax.random.key(2))
    step = make_train_step(cfg, model)

    # warmup / compile; float() forces real completion on this backend
    for i in range(2):
        state, metrics = step(state, batch, i, 0.0)
    _ = float(metrics["loss"])

    n_steps = 10
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch, i, 0.0)
        _ = float(metrics["loss"])  # value fetch = true synchronization
        best_dt = min(best_dt, time.perf_counter() - t0)

    pairs_per_sec = n_steps * B / best_dt
    print(json.dumps({
        "metric": ("ECPE train pairs/sec/chip (flagship MMD step, bf16, "
                   f"b{B}xs{L}, value-fetch timed)"),
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
