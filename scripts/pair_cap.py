"""Forced-miss protocol cap of a stage-2 test file.

The stage-2 eval reconciles gold pairs against stage-1 *predicted* emotion
clauses; gold pairs whose emotion stage 1 missed become forced misses
(flagship drl_classifier_ec_mmd_final_mul.py:663-708, :861-865). With a
perfect stage-2 model (all surviving positives hit, zero false positives)
that yields precision 1, recall TP/(TP+U), so the best reachable pair-F1 is
2*TP / (2*TP + U) where TP = surviving gold positives and U =
num_unpred_emotions. This is the "protocol cap" column in RESULTS.md.

Usage: python scripts/pair_cap.py <test_file> [<test_file> ...]
"""

import sys

from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.data.pairs import build_pairs


def cap(path: str) -> dict:
    docs = parse_ecpe_file(path)
    ps = build_pairs(docs, test=True)
    tp = sum(e.label for e in ps.examples)
    u = ps.num_unpred_emotions
    gold = tp + u
    return {
        "file": path,
        "gold_pairs": gold,
        "surviving_positives": tp,
        "forced_misses": u,
        "recall_cap": round(tp / gold, 4) if gold else 0.0,
        "f1_cap": round(2 * tp / (2 * tp + u), 4) if tp else 0.0,
    }


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(cap(p))
