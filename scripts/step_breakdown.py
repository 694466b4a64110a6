"""Step-time breakdown by ablation timing (VERDICT r2 weak #5).

jax.profiler device traces are not trustworthy through the axon tunnel (only
value fetches synchronize), so the attribution is built by timing ABLATED
step variants, each chained N deep and ended with a value fetch:

  full_xla        the flagship train step (bench.py operating point)
  full_pallas     same with --ops_impl pallas (fused MMD + fused BoW recon)
  reg_none        regularizer ablated (MMD cost = full_xla - reg_none)
  grads_only      value_and_grad without the optimizer update
                  (Adam cost = full_xla - grads_only)
  fwd_loss        forward + loss, no backward (bwd = grads_only - fwd_loss)
  encoder_fwd     encoder+heads forward only (loss math = fwd_loss - this)
  eval_step       the batched eval path

Prints one JSON dict; run on the real chip via the TPU queue.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, n=10, rounds=3):
    """Best-of-rounds time for n chained invocations ending in a fetch."""
    out = fn()  # warmup/compile
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "shape")]
        np.asarray(leaves[-1])  # value fetch = true sync on axon
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3  # ms


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".carel_cache", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from carel_tpu.config import Regularizer
    from carel_tpu.models.drl import DrlModel
    from carel_tpu.train.state import create_train_state
    from carel_tpu.train.steps import (
        make_eval_step,
        make_train_step,
        vae_and_classifier_loss,
    )

    B, L = 64, 96  # bench.py operating point
    cfg = _flagship_cfg()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, batch_size=B),
        data=dataclasses.replace(cfg.data, max_len=L))
    model = DrlModel(cfg.model)
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
    params = variables["params"]

    results = {}

    # --- full steps (donate off so the state can be reused across variants)
    cfg_nodonate = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, donate=False))
    state = create_train_state(cfg_nodonate, params, jax.random.key(2))
    holders = {}

    def run_step(name, step):
        holders[name] = state

        def go():
            holders[name], metrics = step(holders[name], batch, 3, 0.0)
            return metrics["loss"]

        return _timed(go)

    results["full_xla_ms"] = run_step(
        "xla", make_train_step(cfg_nodonate, model))
    results["full_pallas_ms"] = run_step(
        "pallas", make_train_step(cfg_nodonate, model, ops_impl="pallas"))
    cfg_none = dataclasses.replace(
        cfg_nodonate,
        loss=dataclasses.replace(cfg.loss, regularizer=Regularizer.NONE))
    results["reg_none_ms"] = run_step(
        "none", make_train_step(cfg_none, model))

    # --- grads without update
    def fwd(p, r, deterministic=False):
        s, d = jax.random.split(r)
        return model.apply(
            {"params": p}, batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], deterministic=deterministic,
            rngs={"sample": s, "dropout": d})

    @jax.jit
    def grads_only(p, r):
        def loss_fn(pp):
            out = fwd(pp, r)
            total, _ = vae_and_classifier_loss(cfg, out, batch, 3)
            return total

        return jax.grad(loss_fn)(p)

    key = jax.random.key(3)
    results["grads_only_ms"] = _timed(lambda: grads_only(params, key))

    @jax.jit
    def fwd_loss(p, r):
        out = fwd(p, r)
        total, _ = vae_and_classifier_loss(cfg, out, batch, 3)
        return total

    results["fwd_loss_ms"] = _timed(lambda: fwd_loss(params, key))

    @jax.jit
    def encoder_fwd(p, r):
        out = fwd(p, r)
        return sum(jnp.sum(v.astype(jnp.float32)) for k, v in out.items()
                   if k in ("pair_logits", "recon_logits"))

    results["encoder_fwd_ms"] = _timed(lambda: encoder_fwd(params, key))

    @jax.jit
    def grads_no_dropout(p, r):
        def loss_fn(pp):
            out = fwd(pp, r, deterministic=True)
            total, _ = vae_and_classifier_loss(cfg, out, batch, 3)
            return total

        return jax.grad(loss_fn)(p)

    # dropout-mask RNG (threefry over ~[B,L,3072] x 12 layers) is a known
    # TPU tax; delta vs grads_only isolates it
    results["grads_no_dropout_ms"] = _timed(
        lambda: grads_no_dropout(params, key))

    eval_step = make_eval_step(cfg, model)
    results["eval_step_ms"] = _timed(lambda: eval_step(params, batch, key))

    # derived attribution
    results["derived"] = {
        "mmd_term_ms": round(results["full_xla_ms"] - results["reg_none_ms"], 2),
        "adam_update_ms": round(
            results["full_xla_ms"] - results["grads_only_ms"], 2),
        "backward_ms": round(
            results["grads_only_ms"] - results["fwd_loss_ms"], 2),
        "loss_math_ms": round(
            results["fwd_loss_ms"] - results["encoder_fwd_ms"], 2),
        "pallas_delta_ms": round(
            results["full_pallas_ms"] - results["full_xla_ms"], 2),
        "dropout_rng_ms": round(
            results["grads_only_ms"] - results["grads_no_dropout_ms"], 2),
    }
    results = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in results.items()}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
