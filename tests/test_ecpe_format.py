"""Parser tests: synthetic golden blocks + real reference corpora."""

import os

import pytest

from carel_tpu.data.ecpe_format import (
    parse_ecpe_file,
    parse_ecpe_text,
    write_ecpe_file,
    NULL_EMOTION,
)
from tests.conftest import REFERENCE_ROOT, requires_reference_data

ZH_SAMPLE = """\
1 4
 (2,1), (2,3)
1,null,null,天气 突然 变冷
2,sadness,null,他 很 难过
3,null,null,考试 没有 通过
4,null,null,于是 回家 了
2 3
 (1,2)
1,happiness,null,她 笑 了
2,null,null,因为 收到 了 礼物
3,null,null,那天 下午
"""

EN_SAMPLE = """\
1 3
 (2, 2),
1,null,null,That day Jobs walked into the lobby
2,surprise,was startled by,who was startled by his unkempt hair
3,null,null,that he would n't leave until they gave him a job .
"""

NUM_SAMPLE = """\
104 5
(3,2)
1, 6, -1, Long bao school
2, 6, -1, people often cross
3, 1, -1, he worried about kids
4, 6, -1, no class time
5, 6, -1, he guards the gate
"""


def test_parse_zh_sample():
    docs = parse_ecpe_text(ZH_SAMPLE)
    assert len(docs) == 2
    d0 = docs[0]
    assert d0.doc_id == "1"
    assert d0.doc_len == 4
    assert d0.pairs == [(2, 1), (2, 3)]
    assert d0.clause(2).emotion == 1  # sadness
    assert d0.clause(1).emotion == NULL_EMOTION
    assert d0.clause(2).text_field3 == "他 很 难过"
    assert docs[1].pairs == [(1, 2)]
    assert docs[1].clause(1).emotion == 0  # happiness


def test_parse_en_sample():
    docs = parse_ecpe_text(EN_SAMPLE)
    assert len(docs) == 1
    assert docs[0].pairs == [(2, 2)]
    assert docs[0].clause(2).emotion == 3  # surprise
    # cause field is a text snippet, maps to null code
    assert docs[0].clause(2).cause == NULL_EMOTION
    assert docs[0].clause(3).text.startswith("that he would")


def test_parse_numeric_codes():
    docs = parse_ecpe_text(NUM_SAMPLE)
    assert docs[0].doc_id == "104"
    assert docs[0].clause(3).emotion == 1
    assert docs[0].clause(1).cause == -1
    # text_field3 keeps the reference's split(',')[3] content
    assert docs[0].clause(1).text_field3 == " Long bao school"


def test_roundtrip(tmp_path):
    docs = parse_ecpe_text(ZH_SAMPLE)
    path = str(tmp_path / "out.txt")
    write_ecpe_file(path, docs, pair_style="zh")
    docs2 = parse_ecpe_file(path)
    assert len(docs2) == len(docs)
    assert docs2[0].pairs == docs[0].pairs
    assert [c.text.strip() for c in docs2[0].clauses] == [
        c.text.strip() for c in docs[0].clauses
    ]


@requires_reference_data
def test_parse_reference_zh_corpus():
    docs = parse_ecpe_file(os.path.join(REFERENCE_ROOT, "data/all_data_pair_zh.txt"))
    assert len(docs) > 1000
    for d in docs[:200]:
        assert d.doc_len == len(d.clauses)
        assert all(1 <= e <= d.doc_len and 1 <= c <= d.doc_len
                   for e, c in d.pairs)
        for e, _ in d.pairs:
            assert d.clause(e).emotion != NULL_EMOTION


@requires_reference_data
def test_parse_reference_en_corpus():
    docs = parse_ecpe_file(os.path.join(REFERENCE_ROOT, "data/all_data_pair_en.txt"))
    assert len(docs) > 500
    for d in docs[:100]:
        assert d.doc_len == len(d.clauses)


@requires_reference_data
def test_parse_predicted_emotion_file():
    path = os.path.join(REFERENCE_ROOT, "pair_data/emotion/education.txt")
    docs = parse_ecpe_file(path)
    assert len(docs) > 10
    # stage-1 outputs carry numeric emotions and -1 causes
    assert any(c.cause == -1 for c in docs[0].clauses)


def test_split_raw_corpus_en(tmp_path):
    from carel_tpu.data.ecpe_format import split_raw_corpus
    p = tmp_path / "raw.txt"
    p.write_text(" A very good book. Loved it!  Would read again and again. "
                 "No.\nSecond line here; with two segments.\n")
    segs = split_raw_corpus(str(p), "en")
    assert "A very good book" in segs
    assert "Would read again and again" in segs
    assert "Second line here" in segs
    # fragments under 3 words are dropped ("Loved it!", "No.")
    assert all(len(s.split()) >= 3 for s in segs)


def test_split_raw_corpus_zh(tmp_path):
    from carel_tpu.data.ecpe_format import split_raw_corpus
    p = tmp_path / "raw.txt"
    p.write_text("今天 天气 很好。我们 去 公园 散步！短。\n")
    segs = split_raw_corpus(str(p), "zh")
    assert "今天天气很好" in segs          # spaces stripped (zh convention)
    assert "我们去公园散步" in segs
    assert all(len(s) >= 4 for s in segs)  # "短" dropped
