"""Self-training strategy tests against hand-computed selections."""

import numpy as np

from carel_tpu.config import SelfStrategy
from carel_tpu.data.pairs import PairExample, PairSet


def _pairs(doc_sizes, temporal=None):
    ps = PairSet()
    k = 0
    for d, size in enumerate(doc_sizes):
        for i in range(size):
            ps.examples.append(PairExample(
                pair=f"p{d}_{i}", label=0, emotion=0,
                temporal_order=bool(temporal[k]) if temporal is not None else True,
                doc_index=d))
            k += 1
        ps.docs_pair_size.append(size)
    return ps


from carel_tpu.selftrain.strategies import generate_self_train_pairs


def test_threshold_strategy():
    ps = _pairs([4])
    probs = np.array([0.9, 0.6, 0.4, 0.2])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.THRESHOLD,
                                    round_up=False)
    assert [e.pair for e in out.examples] == ["p0_0", "p0_2"]
    assert [e.label for e in out.examples] == [1, 0]


def test_extreme_strategy():
    ps = _pairs([3, 2])
    probs = np.array([0.2, 0.8, 0.5, 0.1, 0.9])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.EXTREME,
                                    round_up=False)
    # doc0: top p0_1, bottom p0_0; doc1: top p1_1, bottom p1_0
    assert [e.pair for e in out.examples] == ["p0_1", "p0_0", "p1_1", "p1_0"]


def test_random_strategy_top_pos_and_lower_neg():
    ps = _pairs([5])
    probs = np.array([0.1, 0.9, 0.3, 0.7, 0.5])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                    round_up=False,
                                    rng=np.random.default_rng(0))
    assert out.examples[0].pair == "p0_1"  # highest prob is positive
    assert out.examples[0].label == 1
    assert out.examples[1].pair != "p0_1"  # negative ranked below


def test_temporal_order_strategy():
    # top-ranked pair violates temporal order -> skipped
    ps = _pairs([4], temporal=[False, True, False, True])
    probs = np.array([0.95, 0.8, 0.6, 0.4])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.TEMPORAL_ORDER,
                                    round_up=False,
                                    rng=np.random.default_rng(1))
    assert out.examples[0].pair == "p0_1"  # best temporally-consistent pair
    assert out.examples[0].label == 1
    # negative drawn from ranks strictly below the positive's rank
    assert out.examples[1].pair in ("p0_2", "p0_3")


def test_temporal_order_modification_switches():
    ps = _pairs([3], temporal=[True, True, True])
    probs = np.array([0.9, 0.5, 0.1])
    # iteration 0 behaves like temporal_order on RAW probabilities even when
    # round_up=True (newsplit :966-976)
    out0 = generate_self_train_pairs(
        ps, probs, SelfStrategy.TEMPORAL_ORDER_MODIFICATION, iteration=0,
        round_up=True, rng=np.random.default_rng(2))
    assert out0.examples[0].pair == "p0_0"
    # iteration >= 1 falls back to random
    out1 = generate_self_train_pairs(
        ps, probs, SelfStrategy.TEMPORAL_ORDER_MODIFICATION, iteration=1,
        round_up=True, rng=np.random.default_rng(2))
    assert out1.examples[0].label == 1


def test_zero_size_docs_skipped():
    ps = _pairs([0, 2])
    probs = np.array([0.3, 0.6])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.EXTREME,
                                    round_up=False)
    assert len(out) == 2
    assert out.docs_pair_size == [2]


def test_conf_margin_filters_low_separation_docs():
    """conf_margin drops documents whose top ranking barely separates from
    the sampled negative; 0.0 preserves reference-exact behavior."""
    import numpy as np

    from carel_tpu.config import SelfStrategy
    from carel_tpu.selftrain.strategies import generate_self_train_pairs

    pairs = _pairs([4, 4])  # two docs, 4 candidate pairs each
    # doc 0: clean separation; doc 1: all probabilities nearly equal
    probs = np.array([0.95, 0.2, 0.1, 0.05, 0.51, 0.50, 0.50, 0.49])
    base = generate_self_train_pairs(
        pairs, probs, SelfStrategy.EXTREME, round_up=False,
        rng=np.random.default_rng(0))
    assert len(base.docs_pair_size) == 2  # both docs emit (pos, neg)

    filt = generate_self_train_pairs(
        pairs, probs, SelfStrategy.EXTREME, round_up=False,
        rng=np.random.default_rng(0), conf_margin=0.3)
    assert len(filt.docs_pair_size) == 1  # doc 1 dropped
    assert filt.examples[0].pair == pairs.examples[0].pair  # doc 0's top


def test_conf_keep_quantile_filter():
    """--self_conf_keep keeps the most-separated fraction of docs and is
    byte-identical to the reference path at keep=1.0."""
    import numpy as np

    from carel_tpu.config import SelfStrategy
    from carel_tpu.data.pairs import PairExample, PairSet
    from carel_tpu.selftrain.strategies import generate_self_train_pairs

    ps = PairSet()
    probs = []
    for d in range(10):
        for k in range(4):
            ps.examples.append(PairExample(
                pair=f"d{d}p{k}", label=0, emotion=0, temporal_order=True,
                doc_index=d, emo_sen_id=1, cau_sen_id=k + 1))
        ps.docs_pair_size.append(4)
        sep = 0.05 * d
        probs += [0.5 + sep, 0.5 - sep, 0.4, 0.3]
    probs = np.asarray(probs)

    full = generate_self_train_pairs(
        ps, probs, SelfStrategy.RANDOM, round_up=False,
        rng=np.random.default_rng(0))
    half = generate_self_train_pairs(
        ps, probs, SelfStrategy.RANDOM, round_up=False,
        rng=np.random.default_rng(0), conf_keep=0.5)
    assert len(full) == 20
    assert {e.doc_index for e in half.examples} == {5, 6, 7, 8, 9}
    same = generate_self_train_pairs(
        ps, probs, SelfStrategy.RANDOM, round_up=False,
        rng=np.random.default_rng(0), conf_keep=1.0)
    assert [e.pair for e in same.examples] == [e.pair for e in full.examples]


def test_pairs_per_doc_topk_random():
    """--self_pairs_per_doc k: top-k positives + k negatives drawn strictly
    below all positives (k=1 is the reference's 1+1 selection)."""
    ps = _pairs([6])
    probs = np.array([0.1, 0.9, 0.3, 0.7, 0.5, 0.2])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                    round_up=False,
                                    rng=np.random.default_rng(0),
                                    pairs_per_doc=2)
    pos = [e.pair for e in out.examples if e.label == 1]
    neg = [e.pair for e in out.examples if e.label == 0]
    assert pos == ["p0_1", "p0_3"]  # the two highest-prob pairs
    assert len(neg) == 2
    # negatives come from the ranks below both positives
    assert set(neg) <= {"p0_4", "p0_2", "p0_5", "p0_0"}


def test_pairs_per_doc_topk_extreme_and_threshold():
    ps = _pairs([6])
    probs = np.array([0.9, 0.8, 0.6, 0.4, 0.2, 0.1])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.EXTREME,
                                    round_up=False, pairs_per_doc=2)
    assert [e.pair for e in out.examples] == [
        "p0_0", "p0_5", "p0_1", "p0_4"]
    thr = generate_self_train_pairs(ps, probs, SelfStrategy.THRESHOLD,
                                    round_up=False, pairs_per_doc=2)
    assert [e.pair for e in thr.examples] == [
        "p0_0", "p0_3", "p0_1", "p0_4"]


def test_pairs_per_doc_small_doc_clamps():
    # a 2-pair doc can only yield one (pos, neg) pair however large k is
    ps = _pairs([2])
    probs = np.array([0.8, 0.3])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                    round_up=False,
                                    rng=np.random.default_rng(0),
                                    pairs_per_doc=4)
    assert [e.pair for e in out.examples] == ["p0_0", "p0_1"]


def test_pairs_per_doc_one_matches_reference_path():
    # identical selection AND identical RNG consumption at k=1
    ps = _pairs([5, 4])
    probs = np.array([0.1, 0.9, 0.3, 0.7, 0.5, 0.6, 0.2, 0.8, 0.4])
    a = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                  round_up=False,
                                  rng=np.random.default_rng(7))
    b = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                  round_up=False,
                                  rng=np.random.default_rng(7),
                                  pairs_per_doc=1)
    assert [e.pair for e in a.examples] == [e.pair for e in b.examples]


def test_self_lr_override_wiring():
    """--self_lr / --self_pairs_per_doc flow into TrainConfig via the real
    argument parser; defaults keep the reference-exact path."""
    from carel_tpu.cli.main import _apply_overrides, build_parser
    from carel_tpu.config import PRESETS

    ns = build_parser().parse_args(
        ["train", "--self_lr", "3e-5", "--self_pairs_per_doc", "3"])
    cfg = _apply_overrides(PRESETS["ec_mmd_final_mul_newsplit_emnlp"], ns)
    assert cfg.train.self_lr == 3e-5
    assert cfg.train.self_pairs_per_doc == 3

    default = _apply_overrides(PRESETS["ec_mmd_final_mul_newsplit_emnlp"],
                               build_parser().parse_args(["train"]))
    assert default.train.self_lr == 0.0
    assert default.train.self_pairs_per_doc == 1


def _dist_pairs(specs):
    """specs: list of docs, each a list of (emo, cau, prob). Returns ps, probs."""
    ps = PairSet()
    probs = []
    for d, doc in enumerate(specs):
        for e, c, p in doc:
            ps.examples.append(PairExample(
                pair=f"p{d}_{e}_{c}", label=0, emotion=0,
                temporal_order=c <= e, doc_index=d,
                emo_sen_id=e, cau_sen_id=c))
            probs.append(p)
        ps.docs_pair_size.append(len(doc))
    return ps, np.array(probs)


def test_max_dist_masks_distant_positives():
    # doc0: the top-prob pair is distance 6 — with max_dist=2 the positive
    # must fall to the best in-window pair, and the distant predicted-
    # positive becomes a hard pseudo-negative
    ps, probs = _dist_pairs([[(7, 1, 0.9), (3, 2, 0.7), (3, 3, 0.4)]])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                    round_up=False,
                                    rng=np.random.default_rng(0),
                                    max_dist=2)
    pos = [e for e in out.examples if e.label == 1]
    assert [e.pair for e in pos] == ["p0_3_2"]
    # the distant predicted-positive appears exactly once as a negative
    # (hard negative, deduped if the sampled negative already drew it)
    hard = [e for e in out.examples if e.label == 0 and e.pair == "p0_7_1"]
    assert len(hard) == 1
    assert sum(out.docs_pair_size) == len(out.examples)


def test_max_dist_doc_with_no_eligible_pairs():
    # every pair beyond the window: no pos/neg selection, only the hard
    # negative for the >0.5 distant pair
    ps, probs = _dist_pairs([[(9, 1, 0.8), (8, 1, 0.3)]])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                    round_up=False, max_dist=2)
    assert [e.label for e in out.examples] == [0]
    assert out.examples[0].pair == "p0_9_1"


def test_max_dist_zero_is_reference_exact():
    ps, probs = _dist_pairs([[(7, 1, 0.9), (3, 2, 0.7), (3, 3, 0.4)]])
    a = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                  round_up=False,
                                  rng=np.random.default_rng(3))
    b = generate_self_train_pairs(ps, probs, SelfStrategy.RANDOM,
                                  round_up=False,
                                  rng=np.random.default_rng(3), max_dist=0)
    assert [e.pair for e in a.examples] == [e.pair for e in b.examples]
    assert [e.label for e in a.examples] == [e.label for e in b.examples]


def test_max_dist_temporal_order_respects_window():
    # temporal-order positive must come from the window even though a
    # distant temporal pair ranks higher
    ps, probs = _dist_pairs([[(9, 2, 0.95), (4, 3, 0.6), (2, 5, 0.5)]])
    out = generate_self_train_pairs(ps, probs, SelfStrategy.TEMPORAL_ORDER,
                                    round_up=False,
                                    rng=np.random.default_rng(0), max_dist=2)
    pos = [e for e in out.examples if e.label == 1]
    assert [e.pair for e in pos] == ["p0_4_3"]
