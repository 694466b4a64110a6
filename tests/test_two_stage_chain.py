"""Two-stage chain test: stage-1 predictions -> pair file -> stage-2 ingest.

The product pipeline (SURVEY.md §3.2 feeding §3.1): stage 1 writes
pair_data/predicted_emotion/source_{src}/{tgt}.txt with tokenizer-decoded
clauses and predicted emotion codes; stage 2's test reader reconciles gold
pairs against those predictions. This exercises the full chain on a tiny
corpus, including the num_unpred_emotions accounting across the boundary.
"""

import os

import numpy as np

from carel_tpu.data.ecpe_format import parse_ecpe_file, parse_ecpe_text
from carel_tpu.data.pairs import build_pairs
from carel_tpu.data.tokenizer import ZhCharTokenizer
from carel_tpu.stage1 import build_doc_arrays, write_pair_data

DOCS = """\
1 3
 (2,1)
1,null,null,天 气 变 冷
2,sadness,null,他 很 难 过
3,null,null,回 家 了
2 3
 (3,2)
1,null,null,那 天 下 午
2,null,null,收 到 礼 物
3,happiness,null,她 笑 了
"""


def test_stage1_to_stage2_chain(tmp_path):
    docs = parse_ecpe_text(DOCS)
    tok = ZhCharTokenizer.from_corpus(
        [c.text for d in docs for c in d.clauses])
    arr = build_doc_arrays(docs, tok, max_doc_len=4, max_sen_len=10)

    # simulated stage-1 predictions: doc 1 finds the emotion clause (2),
    # doc 2 misses clause 3 but spuriously predicts clause 1
    pred = np.full((2, 4), 6)
    pred[0, 1] = 1  # doc 1 clause 2 = sadness (correct)
    pred[1, 0] = 0  # doc 2 clause 1 = happiness (spurious; clause 3 missed)
    pair_file = str(tmp_path / "source_home" / "education.txt")
    write_pair_data(pair_file, arr, pred, tok)

    # stage 2 consumes the file in test mode
    docs2 = parse_ecpe_file(pair_file)
    ps = build_pairs(docs2, test=True)
    # doc 1: gold (2,1) matched -> 1 positive
    pos = [(e.emo_sen_id, e.cau_sen_id, e.doc_index)
           for e in ps.examples if e.label == 1]
    assert pos == [(2, 1, 0)]
    # doc 2: gold emotion 3 unpredicted -> forced-miss accounting
    assert ps.num_unpred_emotions == 1
    # doc 2's spurious prediction (clause 1) generates full cross-product
    neg_doc2 = [(e.emo_sen_id, e.cau_sen_id)
                for e in ps.examples if e.label == 0 and e.doc_index == 1]
    assert neg_doc2 == [(1, 1), (1, 2), (1, 3)]
    # decoded clause text round-tripped through the tokenizer
    assert "难" in docs2[0].clause(2).text
