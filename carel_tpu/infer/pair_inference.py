"""Batched pair-inference API.

Equivalent of pair_inference.py (:135-200): load a trained checkpoint, score
every candidate pair of a domain file, report binary P/R/F1 (with the
forced-miss padding for emotions stage 1 missed), and persist true/pred
tables (pandas pickles, consumable like the reference's
pair_data/ec_pair/{id}_{true,pred}.pkl by the CIT classifier).

Latency: scoring runs in fixed-size jitted batches; per-batch p50/p95 are
reported (the BASELINE.json "p50 pair_inference latency" metric).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from carel_tpu.data.batching import PairArrays, cut_batch
from carel_tpu.data.pairs import PairSet
from carel_tpu.train.metrics import prf_with_forced_misses


@dataclass
class InferenceResult:
    precision: float
    recall: float
    f1: float
    probs: np.ndarray
    preds: np.ndarray
    p50_batch_ms: float
    p95_batch_ms: float
    pairs_per_sec: float


def score_pairs(
    eval_step: Callable,
    params,
    arrays: PairArrays,
    rng: jax.Array,
    batch_size: int = 512,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Probabilities over all pairs + per-batch wall times (seconds)."""
    n = len(arrays)
    probs = np.zeros(n, np.float32)
    times = []
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        batch = cut_batch(arrays, idx, batch_size)
        d = batch.as_dict()
        if mesh is not None:
            from carel_tpu.parallel.sharding import shard_batch

            d = shard_batch(mesh, d)
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        # np.asarray (a value fetch) is the only true synchronization on the
        # axon remote backend — block_until_ready returns early there
        p = np.asarray(eval_step(params, d, sub))
        times.append(time.perf_counter() - t0)
        probs[idx] = p[: len(idx)]
    return probs, np.asarray(times)


def run_pair_inference(
    eval_step: Callable,
    params,
    pair_set: PairSet,
    arrays: PairArrays,
    rng: Optional[jax.Array] = None,
    batch_size: int = 512,
    output_dir: str = "",
    model_id: str = "model",
    mesh=None,
) -> InferenceResult:
    rng = rng if rng is not None else jax.random.key(0)
    probs, times = score_pairs(eval_step, params, arrays, rng, batch_size, mesh)
    preds = np.round(probs).astype(np.int64)
    p, r, f1 = prf_with_forced_misses(
        arrays.pair_labels, probs, pair_set.num_unpred_emotions)

    if output_dir:
        import pandas as pd

        os.makedirs(output_dir, exist_ok=True)
        base = {
            "pair": pair_set.pairs,
            "emotion": [e.emotion for e in pair_set.examples],
        }
        true_df = pd.DataFrame({**base, "label": pair_set.labels})
        pred_df = pd.DataFrame({**base, "label": preds.tolist()})
        true_df.to_pickle(os.path.join(output_dir, f"{model_id}_true.pkl"))
        pred_df.to_pickle(os.path.join(output_dir, f"{model_id}_pred.pkl"))

    # exclude the first batch (compile) from latency/throughput stats
    lat = times[1:] if len(times) > 1 else times
    steady_pairs = len(arrays) - batch_size if len(times) > 1 else len(arrays)
    return InferenceResult(
        precision=p, recall=r, f1=f1, probs=probs, preds=preds,
        p50_batch_ms=float(np.percentile(lat, 50) * 1e3),
        p95_batch_ms=float(np.percentile(lat, 95) * 1e3),
        pairs_per_sec=float(max(steady_pairs, 1) / max(lat.sum(), 1e-9)),
    )
