"""CIT (conditional-independence triple) data construction.

Reproduces mc_classifier.py's triple building (:95-148): per gold pair, a
positive triple "emotion [SEP] conditioned [SEP] cause" and a negative triple
whose middle element is the 3rd-nearest neighbor of the cause clause under
L2 over sentence embeddings. Self-chain pairs (e == c) condition on the
emotion clause itself.

The reference used faiss + a downloaded SimCSE model; here KNN is exact
numpy (documents have <= 75 clauses — an index is pointless) and the embedder
is pluggable: any callable List[str] -> np.ndarray works, e.g.
carel_tpu.embeddings.EncoderEmbedder (our encoder) or a local
sentence-transformers model when available.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

from carel_tpu.data.ecpe_format import Document
from carel_tpu.data.pairs import PairExample, PairSet


def _knn_index(embeddings: np.ndarray, query_idx: int, k: int) -> int:
    """Index of the k-th nearest neighbor (0-based k; k=2 = faiss's [0][2],
    i.e. 3rd closest including the query itself)."""
    q = embeddings[query_idx]
    d2 = ((embeddings - q[None, :]) ** 2).sum(-1)
    order = np.argsort(d2, kind="stable")
    return int(order[min(k, len(order) - 1)])


def build_cit_triples(
    docs: Sequence[Document],
    embedder: Callable[[List[str]], np.ndarray],
    neighbor_rank: int = 2,
) -> PairSet:
    """Train triples with embedding-KNN negatives (mc_classifier :95-148)."""
    out = PairSet()
    for doc_index, doc in enumerate(docs):
        texts = [cl.text_field3.strip().replace(" ", "")
                 for cl in doc.clauses]
        if not doc.pairs:
            out.docs_pair_size.append(0)
            continue
        emb = np.asarray(embedder(texts))
        n_added = 0
        for e, c in doc.pairs:
            if not (1 <= e <= len(texts) and 1 <= c <= len(texts)):
                continue
            if e == c:
                pos = f"{texts[e-1]}[SEP]{texts[e-1]}[SEP]{texts[e-1]}"
                nn = _knn_index(emb, e - 1, neighbor_rank)
                neg = f"{texts[e-1]}[SEP]{texts[nn]}[SEP]{texts[e-1]}"
            else:
                pos = f"{texts[e-1]}[SEP]{texts[c-1]}[SEP]{texts[c-1]}"
                nn = _knn_index(emb, c - 1, neighbor_rank)
                neg = f"{texts[e-1]}[SEP]{texts[nn]}[SEP]{texts[c-1]}"
            out.examples.append(PairExample(
                pair=pos, label=1, emotion=doc.clause(e).emotion,
                temporal_order=c <= e, doc_index=doc_index,
                emo_sen_id=e, cau_sen_id=c))
            out.examples.append(PairExample(
                pair=neg, label=0, emotion=doc.clause(e).emotion,
                temporal_order=c <= e, doc_index=doc_index,
                emo_sen_id=e, cau_sen_id=c))
            n_added += 2
        out.docs_pair_size.append(n_added)
    return out


def triples_from_predicted_pairs(pred_df) -> PairSet:
    """Test triples from a pair-inference prediction table
    (read_pair_data, mc_classifier :150-165): for each predicted-positive
    pair "e[SEP]c", the triple "e[SEP]c[SEP]c"."""
    out = PairSet()
    pos = pred_df[pred_df["label"] == 1]
    for _, row in pos.iterrows():
        parts = str(row["pair"]).split("[SEP]")
        if len(parts) < 2:
            continue
        triple = "[SEP]".join([parts[0], parts[1], parts[1]])
        out.examples.append(PairExample(
            pair=triple, label=1,
            emotion=int(row["emotion"]) if "emotion" in row else 6,
            temporal_order=True, doc_index=0))
    out.docs_pair_size.append(len(out.examples))
    return out
