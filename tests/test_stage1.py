"""Stage-1 tests: doc arrays, trainer smoke, pair-file writer round-trip."""

import os

import numpy as np
import pytest

from carel_tpu.data.ecpe_format import parse_ecpe_file, parse_ecpe_text
from carel_tpu.data.tokenizer import ZhCharTokenizer
from carel_tpu.models.encoder import tiny_encoder_config
from carel_tpu.stage1 import build_doc_arrays, write_pair_data
from carel_tpu.models.stage1 import DocEmotionModel
from carel_tpu.stage1.trainer import Stage1Config, train_stage1
from tests.conftest import REFERENCE_ROOT, requires_reference_data

SAMPLE = """\
1 3
 (2,1)
1,null,null,天 气 变 冷
2,sadness,null,他 很 难 过
3,null,null,回 家 了
2 2
 (1,2)
1,happiness,null,她 笑 了
2,null,null,收 到 礼 物
"""


@pytest.fixture()
def tok():
    docs = parse_ecpe_text(SAMPLE)
    texts = [c.text for d in docs for c in d.clauses]
    return ZhCharTokenizer.from_corpus(texts)


def test_doc_arrays_shapes(tok):
    docs = parse_ecpe_text(SAMPLE)
    arr = build_doc_arrays(docs, tok, max_doc_len=5, max_sen_len=8)
    assert arr.x_ids.shape == (2, 5, 8)
    assert arr.doc_len.tolist() == [3, 2]
    # clause 2 of doc 1 is sadness (code 1)
    assert arr.y_emotion[0, 1, 1] == 1.0
    assert arr.y_emotion[0, 0, 6] == 1.0  # null
    # padded clause rows all-zero one-hot
    assert arr.y_emotion[0, 3].sum() == 0
    assert arr.y_pairs[0] == ["(2,1)"]


def test_stage1_trainer_smoke(tok, tmp_path):
    docs = parse_ecpe_text(SAMPLE)
    arr = build_doc_arrays(docs, tok, max_doc_len=4, max_sen_len=8)
    cfg = Stage1Config(training_epoch=2, self_epoch=1, batch_size=2,
                       learning_rate=1e-3, threshold=0.0,
                       save_dir=str(tmp_path / "pairs"))
    enc = tiny_encoder_config(vocab_size=tok.vocab_size)
    params, best, pair_file = train_stage1(cfg, enc, arr, arr, tok)
    assert 0.0 <= best[2] <= 1.0
    assert pair_file is None or os.path.exists(pair_file)


def test_stage1_fresh_vs_carried_adam(tok):
    docs = parse_ecpe_text(SAMPLE)
    arr = build_doc_arrays(docs, tok, max_doc_len=4, max_sen_len=8)
    enc = tiny_encoder_config(vocab_size=tok.vocab_size)
    outs = {}
    for fresh in (True, False):
        cfg = Stage1Config(training_epoch=1, self_epoch=0, batch_size=2,
                           fresh_adam=fresh, threshold=2.0)  # no self-train
        params, best, _ = train_stage1(cfg, enc, arr, arr, tok,
                                       write_pairs=False)
        outs[fresh] = params
    # the two optimizer modes produce different parameters
    a = outs[True]["senlayer"]["kernel"]
    b = outs[False]["senlayer"]["kernel"]
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0


def test_pair_writer_roundtrip(tok, tmp_path):
    docs = parse_ecpe_text(SAMPLE)
    arr = build_doc_arrays(docs, tok, max_doc_len=4, max_sen_len=8)
    pred_emotion = np.full((2, 4), 6)
    pred_emotion[0, 1] = 1
    path = str(tmp_path / "out" / "education.txt")
    write_pair_data(path, arr, pred_emotion, tok)
    docs2 = parse_ecpe_file(path)
    assert len(docs2) == 2
    assert docs2[0].pairs == [(2, 1)]
    assert docs2[0].clause(2).emotion == 1
    assert docs2[0].clause(1).cause == -1
    # decoded clause text preserves the characters
    assert "难" in docs2[0].clause(2).text


@requires_reference_data
def test_doc_arrays_on_reference_corpus():
    docs = parse_ecpe_file(
        os.path.join(REFERENCE_ROOT, "data/ECPE_new_dataset/home.txt"))[:20]
    texts = [c.text for d in docs for c in d.clauses]
    tok = ZhCharTokenizer.from_corpus(texts)
    arr = build_doc_arrays(docs, tok)
    assert arr.x_ids.shape == (20, 75, 60)
    assert (arr.doc_len > 0).all()
    # every document has at least one labeled clause within doc_len
    for i in range(20):
        assert arr.y_emotion[i, : arr.doc_len[i]].sum() > 0


def test_stage1_first_step_finite(tok):
    """Regression: flax inits the final-layer bias to exactly zero, and the
    L2-norm regularizer's gradient at 0 is NaN unless eps-guarded — this
    NaN'd every stage-1 run on the first backward pass (models/stage1.py
    safe_norm)."""
    import jax
    import numpy as np
    import optax

    from carel_tpu.stage1.trainer import _batch_dict, make_stage1_step

    docs = parse_ecpe_text(SAMPLE)
    arr = build_doc_arrays(docs, tok, max_doc_len=4, max_sen_len=8)
    cfg = Stage1Config(fresh_adam=False, batch_size=2)
    enc = tiny_encoder_config(vocab_size=tok.vocab_size)
    model = DocEmotionModel(enc, cfg.n_hidden, cfg.n_class,
                            cfg.keep_softmax, cfg.clause_mixer)
    rng = jax.random.key(0)
    b = _batch_dict(arr, np.arange(2))
    params = model.init({"params": rng, "dropout": rng}, b["x_ids"],
                        b["x_masks"], b["x_types"],
                        deterministic=False)["params"]
    tx = optax.adam(cfg.learning_rate)
    step = make_stage1_step(cfg, model, tx)
    params, _, loss = step(params, tx.init(params), b, rng)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(params))
