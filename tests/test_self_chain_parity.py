"""Self-chain ingest parity (VERDICT r2 item 5).

Runs the REFERENCE's own `get_self_chain_docs` / `read_ECPE_self_chain_data`
(drl_classifier_ec_mmd_self_chain.py:902-1010) — AST-extracted at test time,
nothing vendored — as a live oracle over real THUCTC_multiple domain files,
and asserts `carel_tpu.data.self_chain.build_pairs_self_chain` produces the
same pair texts, labels, per-document sizes, and (train-mode) sampled
negative sets under the same Mersenne seed.
"""

import ast
import random
import types

import pytest

from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.data.self_chain import build_pairs_self_chain, self_chain_doc_ids

REF = "/root/reference"
SELF_CHAIN = f"{REF}/drl_classifier_ec_mmd_self_chain.py"

DOMAINS = ["society", "entertainment", "home", "education", "finance"]


class _DF:
    def __init__(self, data=None, columns=None, rows=None):
        self.rows = list(rows or [])

    def append(self, row, ignore_index=False):
        return _DF(rows=self.rows + [dict(row)])


class _PD:
    DataFrame = _DF


def _extract(names):
    import re as _re

    with open(SELF_CHAIN, encoding="utf8") as f:
        tree = ast.parse(f.read())
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name in names]
    assert len(fns) == len(names)
    mod = ast.Module(body=fns, type_ignores=[])
    ast.fix_missing_locations(mod)
    ns = {"pd": _PD, "re": _re, "random": random,
          "opt": types.SimpleNamespace()}
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        exec(compile(mod, SELF_CHAIN, "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def oracle():
    return _extract(["get_self_chain_docs", "read_ECPE_self_chain_data"])


@pytest.mark.parametrize("domain", DOMAINS)
def test_self_chain_doc_detection_parity(oracle, domain):
    path = f"{REF}/domains/THUCTC_multiple/{domain}.txt"
    ref_ids = oracle["get_self_chain_docs"](path)
    ours = self_chain_doc_ids(parse_ecpe_file(path))
    assert [int(x) for x in ours] == ref_ids, domain


@pytest.mark.parametrize("domain", DOMAINS)
@pytest.mark.parametrize("test_mode", [False, True])
def test_self_chain_reader_parity(oracle, domain, test_mode):
    path = f"{REF}/domains/THUCTC_multiple/{domain}.txt"
    random.seed(42)
    df, docs_pair_size = oracle["read_ECPE_self_chain_data"](
        path, test=test_mode)
    ps = build_pairs_self_chain(parse_ecpe_file(path), test=test_mode,
                                rng=random.Random(42))
    assert ps.docs_pair_size == docs_pair_size, (domain, test_mode)
    assert ps.num_unpred_emotions == 0
    assert len(ps.examples) == len(df.rows), (domain, test_mode)
    for i, (ex, row) in enumerate(zip(ps.examples, df.rows)):
        assert ex.label == row["label"], (domain, test_mode, i)
        assert ex.pair == row["pair"], (domain, test_mode, i)
