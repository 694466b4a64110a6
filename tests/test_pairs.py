"""Pair-construction parity tests.

Hand-computed expectations follow read_ECPE_data exactly
(/root/reference/drl_classifier_ec_mmd_final_mul.py:631-731, newsplit :833-959),
covering: train negative subsampling, test-mode reconciliation with stage-1
predictions (num_unpred_emotions), duplicate gold emotions (e == pre_e), and
leftover predicted emotions generating full cross-product negatives.
"""

import os
import random

from carel_tpu.data.ecpe_format import parse_ecpe_file, parse_ecpe_text
from carel_tpu.data.pairs import build_pairs
from tests.conftest import REFERENCE_ROOT, requires_reference_data

TRAIN_DOC = """\
1 5
 (2,1), (2,3)
1,null,null,c one
2,sadness,null,c two
3,null,null,c three
4,null,null,c four
5,null,null,c five
"""

# test-mode doc: gold pairs (2,1) and (4,3); stage-1 predicted emotions on
# sentences 2 and 5 (sentence 4's emotion was missed -> 1 unpred pair;
# sentence 5 is a spurious prediction -> full cross-product negatives).
TEST_DOC = """\
7 5
 (2,1), (4,3)
1, 6, -1, c one
2, 1, -1, c two
3, 6, -1, c three
4, 6, -1, c four
5, 0, -1, c five
"""

# duplicate gold emotion (same emotion clause, two causes)
DUP_DOC = """\
9 4
 (2,1), (2,3)
1, 6, -1, c one
2, 1, -1, c two
3, 6, -1, c three
4, 6, -1, c four
"""


def test_train_mode_counts_and_texts():
    docs = parse_ecpe_text(TRAIN_DOC)
    ps = build_pairs(docs, test=False, rng=random.Random(42))
    # 2 positives, negatives subsampled to 2 (from emotions {2} x non-causes {2,4,5})
    labels = [e.label for e in ps.examples]
    assert labels.count(1) == 2
    assert labels.count(0) == 2
    assert ps.docs_pair_size == [4]
    assert ps.num_unpred_emotions == 0
    pos = [e for e in ps.examples if e.label == 1]
    assert pos[0].pair == "ctwo[SEP]cone"  # zh path strips spaces
    assert pos[0].emotion == 1  # sadness
    assert pos[0].temporal_order is True  # cause 1 <= emotion 2
    assert pos[1].temporal_order is False  # cause 3 > emotion 2
    # negatives all use the gold emotion sentence and a non-cause sentence
    for e in ps.examples:
        if e.label == 0:
            assert e.emo_sen_id == 2
            assert e.cau_sen_id in (2, 4, 5)


def test_test_mode_reconciliation():
    docs = parse_ecpe_text(TEST_DOC)
    ps = build_pairs(docs, test=True)
    # gold emotion 4 was not predicted -> one unpredicted pair
    assert ps.num_unpred_emotions == 1
    # kept positives: only (2,1)
    pos = [e for e in ps.examples if e.label == 1]
    assert len(pos) == 1
    assert (pos[0].emo_sen_id, pos[0].cau_sen_id) == (2, 1)
    # negatives: emotion 2 x non-causes {2,3,4,5}. The reference computes
    # `causes` AFTER reconciliation (flagship :683), so cause 3 of the dropped
    # pair is not excluded.
    neg = [(e.emo_sen_id, e.cau_sen_id) for e in ps.examples if e.label == 0]
    from_matched = [(2, c) for c in (2, 3, 4, 5)]
    # leftover predicted emotion 5 pairs with every sentence
    from_leftover = [(5, c) for c in (1, 2, 3, 4, 5)]
    assert neg == from_matched + from_leftover
    assert ps.docs_pair_size == [1 + len(neg)]


def test_duplicate_gold_emotion_kept():
    docs = parse_ecpe_text(DUP_DOC)
    ps = build_pairs(docs, test=True)
    # both pairs kept: first match consumes pred emotion 2, second hits e==pre_e
    pos = [(e.emo_sen_id, e.cau_sen_id) for e in ps.examples if e.label == 1]
    assert pos == [(2, 1), (2, 3)]
    assert ps.num_unpred_emotions == 0
    # no leftover predicted emotions -> negatives only from matched emotion
    neg = [(e.emo_sen_id, e.cau_sen_id) for e in ps.examples if e.label == 0]
    assert neg == [(2, 2), (2, 4)]


def test_spaced_sep_en_path():
    docs = parse_ecpe_text(TRAIN_DOC)
    ps = build_pairs(docs, test=False, spaced_sep=True, rng=random.Random(0))
    pos = [e for e in ps.examples if e.label == 1][0]
    assert pos.pair == "c two [SEP] c one"


def test_train_subsample_determinism():
    docs = parse_ecpe_text(TRAIN_DOC)
    a = build_pairs(docs, rng=random.Random(7))
    b = build_pairs(docs, rng=random.Random(7))
    assert [e.pair for e in a.examples] == [e.pair for e in b.examples]


@requires_reference_data
def test_reference_corpus_train_pairs():
    docs = parse_ecpe_file(
        os.path.join(REFERENCE_ROOT, "data/ECPE_new_dataset/home.txt"))
    ps = build_pairs(docs, test=False, rng=random.Random(42))
    labels = [e.label for e in ps.examples]
    # train mode is balanced by construction (neg subsampled to <= pos per doc)
    assert labels.count(0) <= labels.count(1)
    assert len(ps.docs_pair_size) == len(docs)
    assert sum(ps.docs_pair_size) == len(ps.examples)


@requires_reference_data
def test_reference_predicted_emotion_test_pairs():
    path = os.path.join(
        REFERENCE_ROOT, "pair_data/predicted_emotion/source_home/education.txt")
    docs = parse_ecpe_file(path)
    ps = build_pairs(docs, test=True)
    assert len(ps.examples) > 100
    assert ps.num_unpred_emotions >= 0
    assert sum(ps.docs_pair_size) == len(ps.examples)


def test_resolve_paths_one_sided_override():
    """--test_file alone must override the convention (the stage-1 ->
    stage-2 chain tests on self-generated files while training on the
    conventional corpus)."""
    import dataclasses

    from carel_tpu.config import PRESETS
    from carel_tpu.pipeline import resolve_paths

    cfg = PRESETS["ec_mmd_final_mul_newsplit_emnlp"]
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_root="/r",
                                      test_file="/mine/education.txt"))
    tr, te, bow = resolve_paths(cfg)
    assert te == "/mine/education.txt"
    assert tr == "/r/data/ECPE_new_dataset/home.txt"

    base = PRESETS["ec_mmd_final_mul_newsplit_emnlp"]
    cfg2 = dataclasses.replace(
        base, data=dataclasses.replace(base.data, data_root="/r",
                                       train_file="/mine/home.txt"))
    tr2, te2, _ = resolve_paths(cfg2)
    assert tr2 == "/mine/home.txt"
    assert te2.endswith("pair_data/predicted_emotion/source_home/education.txt")
