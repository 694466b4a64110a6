"""BoW vocabulary and featurization tests against the reference semantics."""

import os

import numpy as np
import pytest

from carel_tpu.data.bow import (
    BowVocab,
    bow_tokenize_en,
    build_bow_vocab_en,
    build_bow_vocab_zh,
    tokenize_zh,
)
from tests.conftest import REFERENCE_ROOT, requires_reference_data


def test_bow_tokenize_en_matches_reference():
    # bow_util.py:42-48: lowercase, strip punctuation, split on spaces,
    # remove GPT-2 'Ġ' markers, drop empties. Note the reference lowercases
    # BEFORE the replace('Ġ', ''), so a lowercased 'ġ' survives — reproduced
    # here for bit-parity.
    s = "That day, Jobs walked into  the lobby [SEP] Ġhello!"
    toks = bow_tokenize_en(s)
    assert toks == ["that", "day", "jobs", "walked", "into", "the",
                    "lobby", "sep", "ġhello"]


def test_tokenize_zh_filters_non_cjk():
    toks = tokenize_zh("他很难过123abc[SEP]天气变冷")
    assert all(all(u"一" <= ch <= u"龥" for ch in t) for t in toks)
    assert "".join(toks) == "他很难过天气变冷"


def test_sparse_counts_and_normalization():
    vocab = BowVocab.from_words(["apple", "pear", "plum"], "en")
    idx, cnt = vocab.counts("apple apple plum kiwi")
    dense = np.zeros(3)
    dense[idx] = cnt
    # counts before normalization; kiwi (OOV) ignored
    assert dense.tolist() == [2.0, 0.0, 1.0]

    bi, bw = vocab.batch_sparse(["apple apple plum kiwi", ""], max_terms=4)
    d = vocab.densify(bi, bw)
    # normalized by total in-vocab count (3), matching flagship :115-117
    np.testing.assert_allclose(d[0], [2 / 3, 0, 1 / 3], rtol=1e-6)
    np.testing.assert_allclose(d[1], [0, 0, 0])


def test_zh_counts_on_pair_string():
    # pair strings are space-stripped with a literal [SEP); the zh path filters
    # non-CJK before jieba (flagship :100-105)
    vocab = BowVocab.from_words(["难过", "天气"], "zh")
    idx, cnt = vocab.counts("他很难过[SEP]天气变冷")
    dense = np.zeros(2)
    dense[idx] = cnt
    assert dense[0] >= 1  # 难过 found despite [SEP] glue
    assert dense[1] >= 1


@requires_reference_data
def test_build_reference_zh_vocab():
    vocab = build_bow_vocab_zh(
        os.path.join(REFERENCE_ROOT, "data/all_data_pair_zh.txt"))
    assert len(vocab) > 5000
    # sklearn vocab is sorted
    assert vocab.words == sorted(vocab.words)
    # spot-check a common word exists
    assert "我们" in vocab.index or "知道" in vocab.index


@requires_reference_data
def test_build_reference_en_vocab_optimized():
    vocab = build_bow_vocab_en(
        os.path.join(REFERENCE_ROOT, "data/all_data_pair_en.txt"),
        bow_optimize=True)
    assert "sep" in vocab.index
    assert len(vocab) > 2000
    # CountVectorizer's token_pattern drops 1-char tokens
    assert all(len(w) >= 2 for w in vocab.words)
