"""Self-training pseudo-labelling strategies.

Reproduces generate_self_train_data (flagship :734-799, newsplit :961-1053):
per target-domain document, pick one pseudo-positive and one pseudo-negative
pair from the model's predictions.

- threshold: highest prob > 0.5 as pos, highest prob <= 0.5 as neg;
- random: highest prob as pos, a uniformly random lower-ranked pair as neg;
- extreme: highest as pos, lowest as neg;
- temporal_order: highest-prob pair WITH cause-precedes-emotion order as pos,
  a random pair ranked below it as neg (newsplit :1035-1053);
- temporal_order_modification: iteration 0 uses temporal_order on raw
  probabilities; later iterations fall back to random (newsplit :996-1008).

Quirk preserved: the reference's per-document loop keeps updating pos/neg
from a growing sorted dict, so the final selection equals operating on the
full document ranking; with the `random` strategy the neg draw happens every
iteration and only the last draw survives — equivalent to one draw over the
full ranking, which is what we do (with an explicit seeded generator).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from carel_tpu.config import SelfStrategy
from carel_tpu.data.pairs import PairExample, PairSet


def generate_self_train_pairs(
    test_pairs: PairSet,
    probs: np.ndarray,
    strategy: SelfStrategy,
    iteration: int = 0,
    round_up: bool = True,
    rng: Optional[np.random.Generator] = None,
    conf_margin: float = 0.0,
    conf_keep: float = 1.0,
) -> PairSet:
    """Build the pseudo-labelled pair set from per-pair probabilities.

    `probs` is the model's sigmoid output over test_pairs (rounded 0/1 when
    round_up, except temporal_order_modification iteration 0 which always
    ranks raw probabilities, newsplit :966-976).

    conf_margin > 0 (beyond the reference) drops a document's pseudo-pair
    unless raw P(pos) - P(neg) >= conf_margin: low-separation documents are
    exactly where the deterministic pseudo-label loop locks in wrong labels.
    An absolute margin cannot self-calibrate, though — a weak base model
    separates almost nothing (observed: margin 0.2 leaves 1-2 docs), while a
    strong one passes everything. conf_keep < 1 is the quantile version:
    keep the conf_keep fraction of documents with the LARGEST P(pos)-P(neg)
    separation, whatever its absolute scale. 0.0 / 1.0 = reference-exact.
    """
    rng = rng or np.random.default_rng(0)
    probs = np.asarray(probs, np.float64)

    eff_strategy = strategy
    if strategy == SelfStrategy.TEMPORAL_ORDER_MODIFICATION:
        eff_strategy = (SelfStrategy.TEMPORAL_ORDER if iteration < 1
                        else SelfStrategy.RANDOM)
        use_round = round_up and iteration >= 1
    else:
        use_round = round_up
    scores = np.round(probs) if use_round else probs

    selected = []  # (pos_i, neg_i, raw-prob separation), in document order
    curr = 0
    for size in test_pairs.docs_pair_size:
        if size == 0:
            continue
        idx = np.arange(curr, curr + size)
        curr += size
        doc_scores = scores[idx]
        # stable descending ranking (ties keep document order, like python's
        # sorted() on the reference's dict items)
        order = idx[np.argsort(-doc_scores, kind="stable")]

        pos_i = neg_i = None
        if eff_strategy == SelfStrategy.THRESHOLD:
            above = idx[doc_scores > 0.5]
            below = idx[doc_scores <= 0.5]
            if len(above):
                pos_i = above[np.argmax(scores[above])]
            if len(below):
                neg_i = below[np.argmax(scores[below])]
        elif eff_strategy == SelfStrategy.RANDOM:
            pos_i = order[0]
            if len(order) > 1:
                neg_i = order[int(rng.integers(1, len(order)))]
        elif eff_strategy == SelfStrategy.EXTREME:
            pos_i = order[0]
            neg_i = order[-1]
        elif eff_strategy == SelfStrategy.TEMPORAL_ORDER:
            rank_of_pos = None
            for rank, i in enumerate(order):
                if test_pairs.examples[i].temporal_order:
                    pos_i = i
                    rank_of_pos = rank
                    break
                rank_of_pos = rank
            if rank_of_pos is not None and rank_of_pos < len(order) - 1:
                neg_i = order[int(rng.integers(rank_of_pos + 1, len(order)))]
        else:
            raise ValueError(f"unknown strategy {strategy}")

        if (pos_i is not None and neg_i is not None and conf_margin > 0.0
                and probs[pos_i] - probs[neg_i] < conf_margin):
            pos_i = neg_i = None
        if pos_i is not None and neg_i is not None:
            selected.append((pos_i, neg_i, probs[pos_i] - probs[neg_i]))

    if conf_keep < 1.0 and selected:
        # quantile filter: keep the conf_keep fraction of docs with the
        # largest separation (>= so ties don't empty the set)
        seps = np.asarray([s for _, _, s in selected])
        thresh = np.quantile(seps, 1.0 - conf_keep)
        selected = [t for t in selected if t[2] >= thresh]

    out = PairSet()
    for pos_i, neg_i, _ in selected:
        src_p = test_pairs.examples[pos_i]
        src_n = test_pairs.examples[neg_i]
        out.examples.append(PairExample(
            pair=src_p.pair, label=1, emotion=src_p.emotion,
            temporal_order=src_p.temporal_order,
            doc_index=src_p.doc_index,
            emo_sen_id=src_p.emo_sen_id, cau_sen_id=src_p.cau_sen_id))
        out.examples.append(PairExample(
            pair=src_n.pair, label=0, emotion=src_n.emotion,
            temporal_order=src_n.temporal_order,
            doc_index=src_n.doc_index,
            emo_sen_id=src_n.emo_sen_id, cau_sen_id=src_n.cau_sen_id))
        out.docs_pair_size.append(2)

    return out
