"""Golden tests for self-training strategies (VERDICT r1 item 7).

Runs the reference's `generate_self_train_data` (newsplit :961-1066),
extracted via AST with its prediction step bypassed (labels pre-set on the
DataFrame, empty loader), as a live oracle against
carel_tpu.selftrain.strategies.generate_self_train_pairs on fixed prob
vectors. Randomness is pinned on BOTH sides to the range boundaries (first /
last admissible index), so the negative-draw ranges are compared exactly.

Corner cases covered: ties (stable doc-order ranking), a document with NO
temporal-order pair (skipped), the temporal-order positive at the LAST rank
(no negative below -> skipped), a single-pair document (random strategy
skips), doc_pair_size == 0, all-below-threshold documents, and the
temporal_order_modification iteration switch.
"""

import ast
import contextlib
import types

import numpy as np
import pandas as pd
import pytest

from carel_tpu.config import SelfStrategy
from carel_tpu.data.pairs import PairExample, PairSet
from carel_tpu.selftrain.strategies import generate_self_train_pairs

NEWSPLIT = ("/root/reference/"
            "drl_classifier_ec_mmd_final_mul_newsplit_emnlp.py")


def _extract_oracle(randint_fn):
    with open(NEWSPLIT, encoding="utf8") as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "generate_self_train_data")
    mod = ast.Module(body=[fn], type_ignores=[])
    ast.fix_missing_locations(mod)
    ns = {
        "pd": pd,
        "torch": types.SimpleNamespace(no_grad=contextlib.nullcontext,
                                       long=None),
        "device": None,
        "randint": randint_fn,
        "float": float,
        "print": lambda *a, **k: None,
    }
    import warnings

    with warnings.catch_warnings():
        # the reference's own regex strings raise SyntaxWarning on 3.12
        warnings.simplefilter("ignore", SyntaxWarning)
        exec(compile(mod, NEWSPLIT, "exec"), ns)
    return ns["generate_self_train_data"]


class _StubModel:
    def eval(self):
        pass


class _LoRng:
    """np-Generator stand-in returning the low end of the range —
    matches randint(a, b) -> a."""

    def integers(self, a, b):
        return a


class _HiRng:
    """Returns the high end — matches randint(a, b) -> b (inclusive)."""

    def integers(self, a, b):
        return b - 1


# fixed scenario: 7 documents exercising every corner case.
# Each tuple: (probs, temporal_order flags)
DOCS = [
    # plain doc, distinct probs
    ([0.9, 0.2, 0.6], [True, False, True]),
    # ties everywhere (stable ranking must pick doc order)
    ([0.5, 0.5, 0.5, 0.5], [False, True, True, False]),
    # NO temporal-order pair at all -> temporal_order skips this doc
    ([0.8, 0.7], [False, False]),
    # temporal-order positive lands at the LAST rank -> no negative below
    ([0.9, 0.3], [False, True]),
    # single-pair doc -> random/extreme degenerate
    ([0.99], [True]),
    # empty doc (doc_pair_size == 0)
    ([], []),
    # all below threshold -> threshold strategy finds no positive
    ([0.1, 0.4, 0.2], [True, True, False]),
]


def _build_inputs():
    rows = []
    sizes = []
    k = 0
    for probs, orders in DOCS:
        sizes.append(len(probs))
        for p, t in zip(probs, orders):
            rows.append({"pair": f"p{k}", "label": p, "emotion": k % 6,
                         "temporal_order": bool(t)})
            k += 1
    df = pd.DataFrame(rows, columns=["pair", "label", "emotion",
                                     "temporal_order"])
    ps = PairSet(docs_pair_size=list(sizes))
    for i, r in df.iterrows():
        ps.examples.append(PairExample(
            pair=r["pair"], label=0, emotion=int(r["emotion"]),
            temporal_order=bool(r["temporal_order"]), doc_index=0))
    probs = df["label"].to_numpy(np.float64)
    return df, ps, probs


def _oracle_rows(strategy, iteration, probs_for_oracle, randint_fn,
                 r_flag="false"):
    df, _, _ = _build_inputs()
    df = df.copy()
    df["label"] = list(probs_for_oracle)
    oracle = _extract_oracle(randint_fn)
    sizes = [len(p) for p, _ in DOCS]
    out = oracle(sizes, df, [], _StubModel(), strategy, iteration, r_flag)
    return [(r["pair"], r["label"]) for _, r in out.iterrows()]


def _ours_rows(strategy, iteration, probs, rng, round_up=False):
    _, ps, _ = _build_inputs()
    out = generate_self_train_pairs(ps, probs, strategy,
                                    iteration=iteration,
                                    round_up=round_up, rng=rng)
    return [(e.pair, e.label) for e in out.examples]


@pytest.mark.parametrize("rng_pair", [("lo", _LoRng()), ("hi", _HiRng())])
@pytest.mark.parametrize("strategy", ["random", "extreme",
                                      "temporal_order"])
def test_strategy_golden(strategy, rng_pair):
    name, rng = rng_pair
    randint_fn = ((lambda a, b: a) if name == "lo" else (lambda a, b: b))
    _, _, probs = _build_inputs()
    want = _oracle_rows(strategy, 5, probs, randint_fn)
    got = _ours_rows(SelfStrategy(strategy), 5, probs, rng)
    assert got == want, (strategy, name)


def test_threshold_golden():
    _, _, probs = _build_inputs()
    want = _oracle_rows("threshold", 5, probs, lambda a, b: a)
    got = _ours_rows(SelfStrategy.THRESHOLD, 5, probs, _LoRng())
    assert got == want


@pytest.mark.parametrize("iteration", [0, 1, 3])
def test_temporal_order_modification_switch(iteration):
    """iteration 0 -> temporal_order on RAW probs; >=1 -> random
    (newsplit :967-969, :996-1001)."""
    _, _, probs = _build_inputs()
    want = _oracle_rows("temporal_order_modification", iteration, probs,
                        lambda a, b: a, r_flag="false")
    got = _ours_rows(SelfStrategy.TEMPORAL_ORDER_MODIFICATION, iteration,
                     probs, _LoRng())
    assert got == want


def test_corner_docs_are_skipped():
    """No-temporal-order doc and pos-at-last-rank doc contribute nothing."""
    _, _, probs = _build_inputs()
    rows = _ours_rows(SelfStrategy.TEMPORAL_ORDER, 0, probs, _LoRng())
    picked = {p for p, _ in rows}
    # doc 2 ("no temporal order": pairs p7, p8) must be absent
    assert not picked & {"p7", "p8"}
    # doc 3 (pos at last rank: pairs p9, p10) must be absent
    assert not picked & {"p9", "p10"}
