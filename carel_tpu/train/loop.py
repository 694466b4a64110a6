"""Training and evaluation loops for the DRL pair classifier.

Host-side orchestration around the jitted steps: epoch/batch iteration with
fixed shapes, per-epoch eval with forced-miss padding, best-F1 checkpointing
and reload (train(), flagship :802-922). Batches are sharded over the 'data'
mesh axis; params replicated (SURVEY.md §2.10 build plan).

Parity note on KL annealing: the reference's annealing counter is the
*within-epoch* batch index (`enumerate(train_loader)`, flagship :822), so with
T=20000 the KL weight effectively stays at its floor — reproduced here by
passing the batch index, not the global step.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from carel_tpu.config import CarelConfig
from carel_tpu.data.batching import Batch, PairArrays, cut_batch, iter_batches
from carel_tpu.train import checkpoint as ckpt
from carel_tpu.train.logging import JsonlLogger
from carel_tpu.train.metrics import prf_with_forced_misses
from carel_tpu.train.state import TrainState


@dataclasses.dataclass
class EvalResult:
    precision: float
    recall: float
    f1: float
    probs: np.ndarray  # [N] probabilities over the real test rows


def _device_batch(batch: Batch, mesh=None):
    d = batch.as_dict()
    if mesh is not None:
        from carel_tpu.parallel.sharding import shard_batch

        return shard_batch(mesh, d)
    return d


def evaluate(
    eval_step: Callable,
    params,
    test_arrays: PairArrays,
    num_unpred_pairs: int,
    rng: jax.Array,
    batch_size: int = 512,
    mesh=None,
) -> EvalResult:
    """Batched full-test-set evaluation (the reference uses one giant batch,
    flagship :957-961; fixed-size batches with masked tails are equivalent
    and keep shapes static)."""
    n = len(test_arrays)
    probs = np.zeros(n, np.float32)
    order = np.arange(n)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        batch = cut_batch(test_arrays, idx, batch_size)
        rng, sub = jax.random.split(rng)
        p = np.asarray(eval_step(params, _device_batch(batch, mesh), sub))
        probs[idx] = p[: len(idx)]
    p, r, f1 = prf_with_forced_misses(
        test_arrays.pair_labels, probs, num_unpred_pairs)
    return EvalResult(p, r, f1, probs)


# Signatures of the axon tunnel's transient TRACE/COMPILE-time failures
# (observed killing otherwise-fine 30-minute runs). Deliberately narrow:
# a broad "INTERNAL" match would also retry execution-phase errors, and
# with donated input buffers (steps.py donate_argnums=(0,)) re-invoking
# after a partially-dispatched step hits deleted buffers and masks the
# root cause (ADVICE r3).
_TRANSIENT_SIGNATURES = ("remote_compile", "response body closed",
                         "socket closed", "connection reset")


def _dispatch_with_retry(fn, *args, retries: int = 2, logger=None):
    """Retry transient remote-compile/transport failures on the axon tunnel.

    Scope: these errors surface at DISPATCH (trace/compile) time, before
    device execution, so re-invoking with the same (still-live) arguments
    recompiles safely. Execution-phase errors on this async backend surface
    later, at the value fetch (np.asarray/float) OUTSIDE this wrapper, and
    are intentionally not retried — by then the donated state is gone. If a
    retry does trip over already-donated buffers, the ORIGINAL transient
    error is re-raised so the root cause is not masked."""
    first_transient = None
    for attempt in range(retries + 1):
        try:
            return fn(*args)
        except Exception as e:  # jax.errors.JaxRuntimeError
            msg = str(e)
            if first_transient is not None and "deleted" in msg.lower():
                # donation consumed the inputs during the failed dispatch;
                # report the root cause, not the retry artifact
                raise first_transient from e
            # lowercase match: transport errors surface with varying
            # capitalization ("Socket closed" / "Connection reset by peer")
            transient = any(s in msg.lower() for s in _TRANSIENT_SIGNATURES)
            if attempt == retries or not transient:
                raise
            first_transient = first_transient or e
            if logger is not None:
                logger.log({"event": "compile_retry", "attempt": attempt + 1,
                            "error": msg[:160]})
            time.sleep(5.0 * (attempt + 1))


def train_epochs(
    cfg: CarelConfig,
    state: TrainState,
    train_step: Callable,
    eval_step: Callable,
    train_arrays: PairArrays,
    test_arrays: PairArrays,
    num_unpred_pairs: int,
    model_id: str,
    epochs: Optional[int] = None,
    logger: Optional[JsonlLogger] = None,
    mesh=None,
    data_rng: Optional[np.random.Generator] = None,
    best_f1_so_far: float = 0.0,
    epoch_offset: int = 0,
    best_cache: Optional[dict] = None,
) -> Tuple[TrainState, Tuple[float, float, float]]:
    """Epoch loop with per-epoch eval and best-F1 checkpointing.

    Returns the state with BEST params reloaded (the reference reloads the
    best checkpoint after training, flagship :916-917).

    best_cache: optional mutable holder (shared across the base call and all
    self-train iterations) keeping a device-memory copy of the best params,
    so the per-iteration restart-from-best reload skips the orbax disk round
    trip (~3-4 s x 100 iterations). Disk remains the source of truth for
    crash recovery; copies guard against buffer donation invalidating the
    cached arrays.
    """
    logger = logger or JsonlLogger(echo=False)
    data_rng = data_rng or np.random.default_rng(cfg.train.seed)
    epochs = epochs if epochs is not None else cfg.train.epochs
    eval_rng = jax.random.key(cfg.train.seed + 7)

    best = (0.0, 0.0, best_f1_so_far)
    saved_any = False
    t_start = time.time()
    examples_seen = 0

    for epoch in range(1, epochs + 1):
        t_epoch = time.time()
        running = 0.0
        n_batches = 0
        # vi beta ramp: (epoch-1)*0.1 capped at 1 (vi_final :772-777)
        vi_beta = min((epoch_offset + epoch - 1) * cfg.loss.vi_beta_step, 1.0)
        if getattr(train_step, "is_epoch_step", False):
            from carel_tpu.train.scan_epoch import stack_epoch

            stacked = stack_epoch(train_arrays, cfg.train.batch_size,
                                  rng=data_rng)
            if mesh is not None:
                from carel_tpu.parallel.sharding import shard_stacked

                stacked = shard_stacked(mesh, stacked)
            state, losses = _dispatch_with_retry(
                train_step, state, stacked, vi_beta, logger=logger)
            losses = np.asarray(losses)  # value fetch = true sync
            n_batches = len(losses)
            examples_seen += len(train_arrays)
            logger.log({"event": "train", "epoch": epoch,
                        "it": n_batches, "loss": float(losses.mean())})
        else:
            from carel_tpu.data.prefetch import prefetch_to_device
            from carel_tpu.parallel.sharding import batch_sharding

            sharding = batch_sharding(mesh) if mesh is not None else None
            batches = prefetch_to_device(
                iter_batches(train_arrays, cfg.train.batch_size, shuffle=True,
                             rng=data_rng),
                size=2, transform=lambda b: b.as_dict(), sharding=sharding)
            pending = []  # device scalars; fetch every 10 steps so the
            # dispatch chain pipelines (a per-step float() costs ~2x wall)
            for it, batch in enumerate(batches):
                state, metrics = _dispatch_with_retry(
                    train_step, state, batch, it, vi_beta, logger=logger)
                pending.append(metrics["loss"])
                n_batches += 1
                examples_seen += int(batch["example_mask"].sum())
                if it % 10 == 9:
                    running = float(sum(pending[-10:]))
                    logger.log({"event": "train", "epoch": epoch,
                                "it": it + 1, "loss": running / 10})
                    pending = []

        eval_rng, sub = jax.random.split(eval_rng)
        res = evaluate(eval_step, state.params, test_arrays,
                       num_unpred_pairs, sub, cfg.train.eval_batch_size, mesh)
        dt = time.time() - t_epoch
        logger.log({
            "event": "eval", "epoch": epoch,
            "precision": res.precision, "recall": res.recall, "f1": res.f1,
            "epoch_seconds": dt,
            "examples_per_sec": examples_seen / max(time.time() - t_start, 1e-9),
        })

        if res.f1 > best[2]:
            best = (res.precision, res.recall, res.f1)
            ckpt.save_best(cfg.train.checkpoint_dir, model_id, state.params)
            saved_any = True
            if best_cache is not None:
                import jax.numpy as jnp

                best_cache["params"] = jax.tree_util.tree_map(
                    jnp.copy, state.params)
            logger.log({"event": "best", "epoch": epoch, "f1": res.f1})

        if (cfg.train.save_state_every
                and epoch % cfg.train.save_state_every == 0):
            ckpt.save_state(cfg.train.checkpoint_dir, model_id, state)
            logger.log({"event": "state_snapshot", "epoch": epoch,
                        "step": int(state.step)})

    # The reference reloads the best checkpoint UNCONDITIONALLY at the end of
    # every train() call (flagship :916-917) — also when this call saved
    # nothing. During self-training this is load-bearing: each iteration's
    # pseudo-labels are generated from the best-so-far model, not from
    # whatever state the last fine-tune drifted to. Without it the loop can
    # collapse and never recover (observed: education f1 0.56 -> 0.11 locked
    # for 60+ iterations, runs b0c04059/ce9a3323).
    import os as _os

    if best_cache is not None and best_cache.get("params") is not None:
        import jax.numpy as jnp

        # hand out a fresh copy: the caller's next donating step would
        # otherwise invalidate the cached buffers
        state = state.replace(params=jax.tree_util.tree_map(
            jnp.copy, best_cache["params"]))
    elif saved_any or _os.path.exists(_os.path.join(
            _os.path.abspath(cfg.train.checkpoint_dir), f"{model_id}_best")):
        best_params = ckpt.load_best(cfg.train.checkpoint_dir, model_id,
                                     state.params)
        state = state.replace(params=best_params)
    return state, best
