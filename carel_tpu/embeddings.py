"""Sentence embeddings: encoder embedder, contrastive domain fine-tuning,
and the clause-keywords loader for clustering experiments.

TPU-native replacement for the reference's sentence-transformers subsystem
(chi/en[_ec]_sentence_transformer.py: fine-tune a downloaded SimCSE / mpnet
model with BatchAll triplet loss on domain labels; ECPE_dataset.py:39-149:
per-emotion cause-clause lists encoded to vectors). The no-egress TPU
environment cannot download those models, so the embedder here is our own
TransformerEncoder (optionally initialized from a local HF checkpoint via
models.hf_port) fine-tuned with the same batch-all triplet objective, jitted
end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carel_tpu.config import EncoderConfig
from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.data.tokenizer import BaseTokenizer
from carel_tpu.models.encoder import TransformerEncoder


class EncoderEmbedder:
    """Callable List[str] -> np.ndarray using the encoder's pooler output."""

    def __init__(self, encoder_cfg: EncoderConfig, params,
                 tokenizer: BaseTokenizer, max_len: int = 128,
                 batch_size: int = 256, normalize: bool = False):
        self.cfg = encoder_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.batch_size = batch_size
        self.normalize = normalize
        model = TransformerEncoder(encoder_cfg)

        @jax.jit
        def fwd(params, ids, mask, types):
            _, pooled = model.apply({"params": params}, ids, mask, types)
            pooled = pooled.astype(jnp.float32)
            if normalize:
                pooled = pooled / jnp.maximum(
                    jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)
            return pooled

        self._fwd = fwd

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        for s in range(0, len(texts), self.batch_size):
            chunk = list(texts[s : s + self.batch_size])
            pad = 0
            if len(chunk) < self.batch_size and s > 0:
                pass  # variable tail batch is fine; jit re-traces once
            enc = self.tokenizer.encode_batch(chunk, self.max_len)
            out = self._fwd(self.params, jnp.asarray(enc.input_ids),
                            jnp.asarray(enc.attention_mask),
                            jnp.asarray(enc.token_type_ids))
            outs.append(np.asarray(out))
        return np.concatenate(outs, 0) if outs else np.zeros((0, 1))


def batch_all_triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                           margin: float = 5.0) -> jnp.ndarray:
    """BatchAll triplet loss (sentence_transformers.losses.BatchAllTripletLoss
    semantics): mean over all valid (a, p, n) triplets of
    max(d(a,p) - d(a,n) + margin, 0), counting only positive-loss triplets."""
    d2 = (jnp.sum(embeddings**2, 1)[:, None]
          + jnp.sum(embeddings**2, 1)[None, :]
          - 2 * embeddings @ embeddings.T)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    eye = jnp.eye(labels.shape[0], dtype=jnp.float32)
    pos_mask = same - eye
    neg_mask = 1.0 - same
    # triplet tensor [a, p, n]
    tl = dist[:, :, None] - dist[:, None, :] + margin
    valid = pos_mask[:, :, None] * neg_mask[:, None, :]
    tl = jnp.maximum(tl * valid, 0.0)
    num_pos = jnp.sum((tl > 1e-16).astype(jnp.float32))
    return jnp.sum(tl) / jnp.maximum(num_pos, 1.0)


@dataclass(frozen=True)
class EmbedderTrainConfig:
    batch_size: int = 32
    epochs: int = 9  # chi_sentence_transformer.py:17
    learning_rate: float = 2e-5
    margin: float = 5.0
    max_len: int = 200  # reference sets max_seq_length=200
    seed: int = 42


def train_domain_embedder(
    cfg: EmbedderTrainConfig,
    encoder_cfg: EncoderConfig,
    tokenizer: BaseTokenizer,
    texts: Sequence[str],
    labels: Sequence[int],
    init_params=None,
    logger=None,
) -> Dict:
    """Fine-tune the encoder with batch-all triplet loss on domain labels."""
    model = TransformerEncoder(encoder_cfg)
    rng = jax.random.key(cfg.seed)
    enc = tokenizer.encode_batch(list(texts), cfg.max_len)
    labels_np = np.asarray(labels, np.int32)

    if init_params is None:
        init_params = model.init(
            {"params": rng},
            jnp.asarray(enc.input_ids[:2]),
            jnp.asarray(enc.attention_mask[:2]),
            jnp.asarray(enc.token_type_ids[:2]))["params"]
    tx = optax.adam(cfg.learning_rate, eps=1e-8)
    opt_state = tx.init(init_params)

    @jax.jit
    def step(params, opt_state, ids, mask, types, y, dr):
        def loss_fn(p):
            _, pooled = model.apply({"params": p}, ids, mask, types,
                                    deterministic=False,
                                    rngs={"dropout": dr})
            return batch_all_triplet_loss(pooled.astype(jnp.float32), y,
                                          cfg.margin)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = init_params
    data_rng = np.random.default_rng(cfg.seed)
    n = len(texts)
    for epoch in range(cfg.epochs):
        order = np.arange(n)
        data_rng.shuffle(order)
        for s in range(0, n - cfg.batch_size + 1, cfg.batch_size):
            idx = order[s : s + cfg.batch_size]
            rng, dr = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(enc.input_ids[idx]),
                jnp.asarray(enc.attention_mask[idx]),
                jnp.asarray(enc.token_type_ids[idx]),
                jnp.asarray(labels_np[idx]), dr)
        if logger:
            logger.log({"event": "embedder_epoch", "epoch": epoch + 1,
                        "loss": float(loss)})
    return params


def load_domain_docs(paths: Dict[str, str]) -> Tuple[List[str], List[int]]:
    """(doc_text, domain_label) pairs from ECPE files, one label per file
    (the chi/en_sentence_transformer corpus construction)."""
    texts, labels = [], []
    for label, (name, path) in enumerate(sorted(paths.items())):
        for doc in parse_ecpe_file(path):
            content = "".join(
                cl.text_field3.strip().replace(" ", "") for cl in doc.clauses)
            texts.append(content)
            labels.append(label)
    return texts, labels


def load_clause_keywords(
    path: str,
    source_doc_ids: Sequence[str],
    target_doc_ids: Sequence[str],
) -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    """Per-emotion cause-clause lists for source/target domains.

    Parses data/clause_keywords_emotion.txt
    ("doc_id,emotion,clause_id,keyword,rel_pos,is_cause,clause",
    ECPE_dataset.py:39-103): clauses with is_cause == "yes" bucket under
    cau_<emotion>, the rest under cau_none.
    """
    s_ids = set(map(str, source_doc_ids))
    t_ids = set(map(str, target_doc_ids))
    emotions = ["happiness", "sadness", "disgust", "surprise", "fear", "anger"]
    s_stat = {f"cau_{e}": [] for e in emotions + ["none"]}
    t_stat = {f"cau_{e}": [] for e in emotions + ["none"]}
    with open(path, encoding="utf8") as f:
        for line in f:
            parts = line.rstrip("\n").split(",")
            if len(parts) < 7:
                continue
            doc_id, emotion, flag = parts[0], parts[1], parts[5]
            clause = parts[-1].replace(" ", "")
            stat = s_stat if doc_id in s_ids else (
                t_stat if doc_id in t_ids else None)
            if stat is None:
                continue
            if flag == "yes" and emotion in emotions:
                stat[f"cau_{emotion}"].append(clause)
            else:
                stat["cau_none"].append(clause)
    return s_stat, t_stat


def save_embeddings(path: str, embeddings: np.ndarray,
                    labels: Optional[np.ndarray] = None) -> str:
    """Cache embeddings (+ optional labels) as .npz — the ECPE_dataset_v1.py
    precomputed-split pattern."""
    if labels is None:
        np.savez(path, embeddings=np.asarray(embeddings))
    else:
        np.savez(path, embeddings=np.asarray(embeddings),
                 labels=np.asarray(labels))
    return path if path.endswith(".npz") else path + ".npz"


def load_embeddings(path: str):
    """(embeddings, labels-or-None) from a save_embeddings .npz."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return data["embeddings"], (data["labels"] if "labels" in data else None)
