"""Legacy helpers from the reference's data_process.py, in JAX/numpy.

- getmask / softmax_by_length: length-masked attention helpers
  (data_process.py:106-133);
- load_w2v: word2vec text-format loader building an embedding matrix over a
  corpus vocabulary with random fallback for misses (data_process.py:54-96).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def getmask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, max_len] 1/0 mask from per-example lengths."""
    idx = jnp.arange(max_len)[None, :]
    return (idx < lengths[:, None]).astype(jnp.float32)


def softmax_by_length(inputs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis restricted to the first `length` positions
    (data_process.py:119-133). inputs [B, 1, L]."""
    mask = getmask(lengths, inputs.shape[-1])[:, None, :]
    exps = jnp.exp(inputs.astype(jnp.float32)) * mask
    return exps / (jnp.sum(exps, axis=-1, keepdims=True) + 1e-9)


def load_w2v(
    embedding_dim: int,
    data_file_path: str,
    embedding_path: str,
    seed: int = 42,
) -> Tuple[Dict[str, int], np.ndarray]:
    """(word -> 1-based index, [V+1, D] embedding matrix) from a text-format
    vector file; row 0 is the padding vector, misses get U(-0.1, 0.1)."""
    words = []
    with open(data_file_path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) >= 4:
                words.extend(parts[-1].split())
    vocab = sorted(set(words))
    word_idx = {w: i + 1 for i, w in enumerate(vocab)}

    w2v = {}
    with open(embedding_path, encoding="utf-8") as f:
        f.readline()  # header
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= embedding_dim + 1:
                w2v[parts[0]] = np.asarray(parts[1 : embedding_dim + 1],
                                           np.float32)

    rng = np.random.default_rng(seed)
    emb = np.zeros((len(vocab) + 1, embedding_dim), np.float32)
    for w, i in word_idx.items():
        if w in w2v:
            emb[i] = w2v[w]
        else:
            emb[i] = rng.uniform(-0.1, 0.1, embedding_dim)
    return word_idx, emb
