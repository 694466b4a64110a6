"""Differential ingest-parity harness (VERDICT r1 item 5).

Runs the REFERENCE's own `read_ECPE_data` — extracted from
/root/reference at test time via AST (nothing is copied into this repo) and
executed against a minimal pandas shim — as a live oracle over ~20 real
corpus files, and asserts that `carel_tpu.data.pairs.build_pairs` produces
the exact same pair texts, labels, emotions, per-document pair counts, and
`num_unpred_emotions`. Train-mode negative sampling is compared exactly too:
both sides draw one `random.sample(neg_pairs, k)` per document from the same
candidate ordering, so seeding both Mersenne generators with 42 must yield
identical negative sets (flagship :696-701 vs data/pairs.py).

Oracles: flagship `drl_classifier_ec_mmd_final_mul.py:631-731` (zh) and
newsplit `…_newsplit_emnlp.py:833-959` (adds temporal_order and the
en/bow_optimize spaced " [SEP] " join).
"""

import ast
import glob
import random
import types

import pytest

from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.data.pairs import build_pairs

REF = "/root/reference"


# ---- minimal pandas stand-in (the oracle only builds row lists) ----
class _Col:
    def astype(self, *_):
        return self


class _DF:
    def __init__(self, data=None, columns=None, rows=None):
        if isinstance(data, list):
            self.rows = [dict(r) for r in data]
        else:
            self.rows = list(rows or [])

    def append(self, row, ignore_index=False):
        return _DF(rows=self.rows + [dict(row)])

    def __getitem__(self, k):
        return _Col()

    def __setitem__(self, k, v):
        pass


class _PD:
    DataFrame = _DF

    @staticmethod
    def concat(dfs, ignore_index=False):
        rows = []
        for d in dfs:
            rows.extend(d.rows)
        return _DF(rows=rows)


def _extract_oracle(src_path: str, language: str, bow_optimize: str = "false"):
    """Compile the reference's read_ECPE_data in an isolated namespace."""
    import re as _re

    with open(src_path, encoding="utf8") as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "read_ECPE_data")
    mod = ast.Module(body=[fn], type_ignores=[])
    ast.fix_missing_locations(mod)
    ns = {
        "pd": _PD, "re": _re, "random": random,
        "opt": types.SimpleNamespace(language=language,
                                     bow_optimize=bow_optimize),
    }
    import warnings

    with warnings.catch_warnings():
        # the reference's own regex strings raise SyntaxWarning on 3.12
        warnings.simplefilter("ignore", SyntaxWarning)
        exec(compile(mod, src_path, "exec"), ns)
    return ns["read_ECPE_data"]


FLAGSHIP = f"{REF}/drl_classifier_ec_mmd_final_mul.py"
NEWSPLIT = f"{REF}/drl_classifier_ec_mmd_final_mul_newsplit_emnlp.py"

ZH_TEST_FILES = sorted(
    glob.glob(f"{REF}/pair_data/predicted_emotion/source_home/*.txt")
    + glob.glob(f"{REF}/pair_data/predicted_emotion/source_society/*.txt")
    + [f"{REF}/pair_data/emotion/{d}.txt"
       for d in ("education", "entertainment", "finance", "home")]
)

ZH_TRAIN_FILES = sorted(
    [f"{REF}/data/ECPE_new_dataset/{d}.txt"
     for d in ("home", "education", "entertainment", "finance", "society")]
    # THUCTC_multiple's only numeric-emotion file — the flagship reader
    # requires int emotion codes (:659); the word-emotion variants are read
    # by emotion_classifier.py's own parser (covered by test_dann)
    + [f"{REF}/domains/THUCTC_multiple/society_num.txt"]
)


def _compare(oracle_fn, path, test_mode, ps, check_texts=True):
    random.seed(42)
    df, docs_pair_size, num_unpred = oracle_fn(path, test=test_mode)
    assert ps.docs_pair_size == docs_pair_size, path
    assert ps.num_unpred_emotions == num_unpred, path
    assert len(ps.examples) == len(df.rows), path
    for i, (ex, row) in enumerate(zip(ps.examples, df.rows)):
        assert ex.label == row["label"], (path, i)
        assert ex.emotion == row["emotion"], (path, i)
        if check_texts:
            assert ex.pair == row["pair"], (path, i)
        if "temporal_order" in row:
            assert ex.temporal_order == row["temporal_order"], (path, i)


@pytest.mark.parametrize("path", ZH_TEST_FILES)
def test_zh_test_mode_parity(path):
    """Test-mode candidate enumeration + num_unpred accounting, exact."""
    oracle = _extract_oracle(FLAGSHIP, "zh")
    ps = build_pairs(parse_ecpe_file(path), test=True)
    _compare(oracle, path, True, ps)


@pytest.mark.parametrize("path", ZH_TRAIN_FILES)
def test_zh_train_mode_parity(path):
    """Train-mode pos/neg construction incl. the sampled negatives, exact."""
    oracle = _extract_oracle(FLAGSHIP, "zh")
    ps = build_pairs(parse_ecpe_file(path), test=False,
                     rng=random.Random(42))
    _compare(oracle, path, False, ps)


@pytest.mark.parametrize("path,test_mode", [
    (f"{REF}/domains/Englishnovel_multiple/enecpe_num.txt", False),
    (f"{REF}/domains/Englishnovel_multiple/reccon_num.txt", False),
    (f"{REF}/pair_data/predicted_emotion/source_enecpe_num/reccon_test.txt",
     True),
    (f"{REF}/pair_data/predicted_emotion/source_reccon_num/enecpe_num.txt",
     True),
])
def test_en_newsplit_parity(path, test_mode):
    """en files through the newsplit oracle with bow_optimize (spaced
    ' [SEP] ' join) — matches the en_newsplit preset's spaced_sep path."""
    oracle = _extract_oracle(NEWSPLIT, "en", bow_optimize="true")
    ps = build_pairs(parse_ecpe_file(path), test=test_mode,
                     spaced_sep=True, rng=random.Random(42))
    _compare(oracle, path, test_mode, ps)


def test_newsplit_zh_temporal_order_parity():
    """zh through the newsplit oracle: temporal_order column parity."""
    oracle = _extract_oracle(NEWSPLIT, "zh")
    path = f"{REF}/pair_data/predicted_emotion/source_home/education.txt"
    ps = build_pairs(parse_ecpe_file(path), test=True)
    _compare(oracle, path, True, ps)


ORIGINAL = f"{REF}/drl_classifier.py"


@pytest.mark.parametrize("path,test_mode", [
    (f"{REF}/domains/THUCTC_multiple/society.txt", False),
    (f"{REF}/pair_data/emotion/finance.txt", True),
])
def test_original_reader_parity(path, test_mode):
    """drl_classifier.py's own read_ECPE_data (:651-749) over the exact
    train/test files its driver uses (:995-999). Its df has no emotion
    column (the 3-latent trainer uses all-ones emotion labels), so only
    pair/label/doc sizes/num_unpred are compared."""
    oracle = _extract_oracle(ORIGINAL, "zh")
    random.seed(42)
    df, docs_pair_size, num_unpred = oracle(path, test=test_mode)
    ps = build_pairs(parse_ecpe_file(path), test=test_mode,
                     rng=random.Random(42))
    assert ps.docs_pair_size == docs_pair_size, path
    assert ps.num_unpred_emotions == num_unpred, path
    assert len(ps.examples) == len(df.rows), path
    for i, (ex, row) in enumerate(zip(ps.examples, df.rows)):
        assert ex.label == row["label"], (path, i)
        assert ex.pair == row["pair"], (path, i)
