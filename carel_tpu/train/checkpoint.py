"""Checkpointing via orbax: best-by-F1 plus full resumable train state.

The reference torch.saves a bare state_dict on every F1 improvement
(flagship :616-628, :874-895) and reloads it post-training. Here:
- save_best / load_best: params-only, "best pair-F1" semantics, named by a
  model id like the reference's uuid scheme;
- save_state / load_state: params + all optimizer states + step + PRNG key
  for deterministic resume (the failure-recovery story the reference lacks,
  SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _path(ckpt_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(ckpt_dir, name))


def save_best(ckpt_dir: str, model_id: str, params: Any) -> str:
    path = _path(ckpt_dir, f"{model_id}_best")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_best(ckpt_dir: str, model_id: str, like: Any) -> Any:
    path = _path(ckpt_dir, f"{model_id}_best")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    return ckptr.restore(path, abstract)


def save_state(ckpt_dir: str, model_id: str, state) -> str:
    """Full train-state snapshot (params, opt states, step, rng)."""
    path = _path(ckpt_dir, f"{model_id}_state")
    payload = {
        "params": state.params,
        "main_opt_state": state.main_opt_state,
        "disc_opt_state": state.disc_opt_state,
        "club_opt_state": state.club_opt_state,
        "step": state.step,
        "rng": jax.random.key_data(state.rng),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_state(ckpt_dir: str, model_id: str, state):
    path = _path(ckpt_dir, f"{model_id}_state")
    payload = {
        "params": state.params,
        "main_opt_state": state.main_opt_state,
        "disc_opt_state": state.disc_opt_state,
        "club_opt_state": state.club_opt_state,
        "step": state.step,
        "rng": jax.random.key_data(state.rng),
    }
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, payload)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, abstract)
    return state.replace(
        params=restored["params"],
        main_opt_state=restored["main_opt_state"],
        disc_opt_state=restored["disc_opt_state"],
        club_opt_state=restored["club_opt_state"],
        step=restored["step"],
        rng=jax.random.wrap_key_data(restored["rng"]),
    )
