"""Tests for conversion, ordering, vis, clustering, HPO, case analysis."""

import json
import os

import numpy as np
import pytest

from carel_tpu.data.ecpe_format import parse_ecpe_file, parse_ecpe_text


def test_reccon_conversion(tmp_path):
    from carel_tpu.tools.convert import reccon_to_ecpe

    src = tmp_path / "reccon.txt"
    src.write_text(
        "1 2\n"
        "(2, 1),\n"
        "1\thappy\thappiness\tI got the job, finally\n"
        "2\tneutral\t-1\tthat is great news\n",
        encoding="utf8")
    out = tmp_path / "out.txt"
    reccon_to_ecpe(str(src), str(out))
    docs = parse_ecpe_file(str(out))
    assert docs[0].pairs == [(2, 1)]
    assert docs[0].clause(1).emotion == 0  # happy -> 0
    assert docs[0].clause(2).emotion == 6  # neutral -> 6
    # comma stripped from utterance in the default path
    assert "," not in docs[0].clause(1).text


def test_convert_train_to_test(tmp_path):
    from carel_tpu.tools.convert import convert_train_to_test

    src = tmp_path / "train.txt"
    src.write_text(
        "1 2\n (2,1)\n"
        "1,null,null,clause one text\n"
        "2,sadness,sad words,clause two text\n",
        encoding="utf8")
    out = tmp_path / "test.txt"
    convert_train_to_test(str(src), str(out))
    docs = parse_ecpe_file(str(out))
    assert docs[0].clause(1).cause == -1
    assert docs[0].clause(2).cause == -1
    assert docs[0].clause(2).emotion == 1  # sadness word -> code


def test_json_to_ecpe_split(tmp_path):
    from carel_tpu.tools.convert import json_to_ecpe_split

    data = {
        "1": {"class": "finance", "len": 2, "content": [
            " (2,1)\n",
            "1,null,null,a b\n",
            "2,sadness,难过,c d\n",
        ]},
    }
    src = tmp_path / "new.json"
    src.write_text(json.dumps(data, ensure_ascii=False), encoding="utf8")
    written = json_to_ecpe_split(str(src), str(tmp_path / "out"))
    train_docs = parse_ecpe_file(written["finance"][0])
    test_docs = parse_ecpe_file(written["finance"][1])
    assert train_docs[0].pairs == [(2, 1)]
    assert test_docs[0].clause(2).cause == -1  # test blanks causes
    assert train_docs[0].clause(2).cause == 6  # '难过' word -> null-coded


def test_ordering_probe():
    from carel_tpu.tools.ordering import ordering_probe

    docs = parse_ecpe_text(
        "1 3\n (2,1), (3,3)\n"
        "1,null,null,a\n2,sadness,null,b\n3,anger,null,c\n")
    stats = ordering_probe(docs)
    assert stats.total_pairs == 2
    assert stats.cause_before == 1
    assert stats.cause_equal == 1
    assert stats.temporal_order_rate == 1.0

    # with a directional scorer
    scorer = lambda prem, hyp: 1.0 if prem < hyp else 0.0
    stats2 = ordering_probe(docs, scorer)
    assert stats2.scored_pairs == 1  # self-chain pair skipped


def test_vis_pipeline(tmp_path):
    from carel_tpu.tools.vis import visualize_domain_shift

    texts = ["apple banana fruit"] * 10 + ["car engine wheel road"] * 10
    labels = ["food"] * 10 + ["auto"] * 10
    out = str(tmp_path / "domains.png")
    path = visualize_domain_shift(texts, labels, out, method="pca")
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000


def test_idec_clustering_and_chi2():
    from carel_tpu.tools.clustering import (
        IdecConfig,
        emotion_cluster_chi2,
        train_idec,
    )

    rng = np.random.default_rng(0)
    # two separated gaussian blobs
    a = rng.normal(0, 0.3, (40, 16))
    b = rng.normal(4, 0.3, (40, 16))
    data = np.concatenate([a, b]).astype(np.float32)
    cfg = IdecConfig(z_dim=4, n_clusters=2, pretrain_epochs=20,
                     refine_steps=20, batch_size=32, lr=1e-3)
    assign, art = train_idec(data, cfg)
    # the two blobs land in different clusters
    assert len(np.unique(assign[:40])) >= 1
    purity = max((assign[:40] == c).mean() for c in np.unique(assign))
    assert purity > 0.8

    emotions = np.asarray([0] * 40 + [1] * 40)
    res = emotion_cluster_chi2(assign, emotions)
    assert res["p_value"] < 0.05  # clusters align with labels


def test_hpo_random_search_with_pruning():
    from carel_tpu.config import PRESETS
    from carel_tpu.tools.hpo import DEFAULT_SPACE, TrialPruned, search

    calls = []

    def objective(cfg, report):
        # deterministic objective rewarding high mmd weight
        v = min(cfg.loss.mmd_loss_weight / 100.0, 1.0)
        for step in range(3):
            report(step, v)
        calls.append(v)
        return v

    best, trials = search(objective, PRESETS["ec_mmd_final_mul"],
                          n_trials=20, seed=0)
    assert best is not None and best.value == max(
        t.value for t in trials if t.value is not None)
    assert any(t.pruned for t in trials)  # median pruner fired
    # pruned trials have intermediate reports but no final value
    pruned = [t for t in trials if t.pruned]
    assert all(t.value is None and t.intermediate for t in pruned)


def test_case_analysis(tmp_path):
    import random

    import jax

    from carel_tpu.config import (
        CarelConfig, DataConfig, LossConfig, ModelConfig, Regularizer,
        TrainConfig,
    )
    from carel_tpu.data.batching import encode_pairs
    from carel_tpu.data.bow import BowVocab
    from carel_tpu.data.pairs import build_pairs
    from carel_tpu.data.tokenizer import ZhCharTokenizer
    from carel_tpu.models.drl import DrlModel
    from carel_tpu.models.encoder import tiny_encoder_config
    from carel_tpu.tools.case_analysis import compare_checkpoints
    from carel_tpu.train.steps import make_eval_step

    docs = parse_ecpe_text(
        "1 3\n (2,2)\n1,null,null,a b\n2,sadness,null,c d\n3,null,null,e f\n"
        "2 3\n (1,2)\n1,happiness,null,g h\n2,null,null,i j\n3,null,null,k l\n")
    pairs = build_pairs(docs, test=True)
    tok = ZhCharTokenizer.from_corpus(["abcdefghijkl"])
    bow = BowVocab.from_words(["ab"], "zh")
    arrays = encode_pairs(pairs, tok, bow, max_len=16)

    cfg = CarelConfig(
        model=ModelConfig(encoder=tiny_encoder_config(vocab_size=tok.vocab_size),
                          ec_dim=8, bow_dim=1),
        loss=LossConfig(regularizer=Regularizer.MMD),
        data=DataConfig(max_len=16), train=TrainConfig(donate=False))
    model = DrlModel(cfg.model)
    dummy = (arrays.input_ids[:2], arrays.attention_mask[:2],
             arrays.token_type_ids[:2])
    pa = model.init({"params": jax.random.key(0),
                     "sample": jax.random.key(1)}, *dummy)["params"]
    pb = model.init({"params": jax.random.key(2),
                     "sample": jax.random.key(3)}, *dummy)["params"]
    ev = make_eval_step(cfg, model)
    out_csv = str(tmp_path / "cmp.csv")
    res = compare_checkpoints(ev, pa, pb, pairs, arrays, docs, out_csv,
                              batch_size=8)
    assert os.path.exists(out_csv)
    assert res.self_chain_counts["total"] >= 1
    assert res.normal_counts["total"] >= 1
    with open(out_csv, encoding="utf8") as f:
        header = f.readline().strip().split(",")
    assert header == ["pair", "label", "mmd_pred", "wommd_pred", "self_chain"]
    # split F1s use the reference's gate protocol (no forced-miss penalty,
    # mmd_wommd_case_analysis.py:688-694) and must be consistent with the
    # CSV: recompute overall F1 from the written rows
    import csv as _csv

    rows = list(_csv.DictReader(open(out_csv, encoding="utf8")))
    def f1(key):
        tp = sum(r["label"] == "1" and r[key] == "1" for r in rows)
        fp = sum(r["label"] == "0" and r[key] == "1" for r in rows)
        fn = sum(r["label"] == "1" and r[key] == "0" for r in rows)
        return 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    assert res.split_f1["overall"]["mmd_f1"] == round(f1("mmd_pred"), 4)
    assert res.split_f1["overall"]["wommd_f1"] == round(f1("wommd_pred"), 4)
    assert set(res.split_f1) == {"overall", "self_chain", "normal"}


def test_prf_2nd_step():
    from carel_tpu.train.metrics import prf_2nd_step

    # doc 1: gold pairs (1,2); candidates (1,2) kept, (1,3) filtered out
    pair_id_all = [10102]
    pair_id = [10102, 10103]
    pred_y = [1, 0]
    p, r, f1, o_p, o_r, o_f1, keep = prf_2nd_step(pair_id_all, pair_id, pred_y)
    assert abs(p - 1.0) < 1e-6
    assert abs(r - 1.0) < 1e-6
    assert abs(o_p - 0.5) < 1e-6
    assert abs(keep - 0.5) < 1e-6


def test_utils_text_helpers():
    import jax.numpy as jnp

    from carel_tpu.utils.text import getmask, softmax_by_length

    m = getmask(jnp.asarray([2, 4]), 4)
    np.testing.assert_array_equal(np.asarray(m),
                                  [[1, 1, 0, 0], [1, 1, 1, 1]])
    x = jnp.ones((2, 1, 4))
    sm = np.asarray(softmax_by_length(x, jnp.asarray([2, 4])))
    np.testing.assert_allclose(sm[0, 0], [0.5, 0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sm[1, 0], [0.25] * 4, atol=1e-6)


def test_event_analysis():
    from carel_tpu.tools.event_analysis import analyze_cause_clauses

    docs = parse_ecpe_text(
        "1 2\n (2,1)\n1,null,null,他 跑 了\n2,sadness,null,很 难 过\n")
    res = analyze_cause_clauses(docs)
    assert res.clause_count == 1
    assert res.pos_counts  # jieba produced tags


def test_memorization_plot(tmp_path):
    import json as _json

    from carel_tpu.tools.memorization_plot import plot_memorization

    log = tmp_path / "log.jsonl"
    recs = [
        {"event": "memorization", "iteration": 1, "pos_pairs": 10,
         "pos_change_rate": 1.0},
        {"event": "memorization", "iteration": 2, "pos_pairs": 10,
         "pos_change_rate": 0.3},
        {"event": "selftrain_best", "iteration": 1, "f1": 0.5},
        {"event": "selftrain_best", "iteration": 2, "f1": 0.6},
    ]
    log.write_text("\n".join(_json.dumps(r) for r in recs), encoding="utf8")
    out = plot_memorization(str(log), str(tmp_path / "mem.png"))
    assert out and os.path.exists(out)


def test_checkpoint_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from carel_tpu.config import CarelConfig, ModelConfig, TrainConfig, DataConfig, LossConfig, Regularizer
    from carel_tpu.models.drl import DrlModel
    from carel_tpu.models.encoder import tiny_encoder_config
    from carel_tpu.train import checkpoint as ck
    from carel_tpu.train.state import create_train_state

    cfg = CarelConfig(
        model=ModelConfig(encoder=tiny_encoder_config(vocab_size=64),
                          ec_dim=4, bow_dim=8),
        loss=LossConfig(regularizer=Regularizer.MMD),
        data=DataConfig(max_len=8),
        train=TrainConfig(checkpoint_dir=str(tmp_path), donate=False))
    model = DrlModel(cfg.model)
    ids = jnp.zeros((2, 8), jnp.int32)
    v = model.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                   ids, jnp.ones((2, 8), jnp.int32), ids)
    state = create_train_state(cfg, v["params"], jax.random.key(2))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    ck.save_state(str(tmp_path), "m1", state)

    fresh = create_train_state(cfg, v["params"], jax.random.key(99))
    restored = ck.load_state(str(tmp_path), "m1", fresh)
    assert int(restored.step) == 7
    # rng restored exactly
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(state.rng)))


def test_step_timer_and_trace(tmp_path):
    import time

    from carel_tpu.utils.profiling import StepTimer, trace

    t = StepTimer(window=3)
    for _ in range(5):
        with t:
            time.sleep(0.001)
    s = t.summary()
    assert s["steps"] == 3  # window bound
    assert s["p50_ms"] >= 1.0
    # no-op trace context
    with trace(""):
        pass


def test_vis_lda_supervised(tmp_path):
    """LDA (LinearDiscriminant) domain projection, incl. the 2-domain
    1-component padding case (en/chi_doc_cluster_vis.py:103-110)."""
    from carel_tpu.tools.vis import visualize_domain_shift

    texts = ["cat sat mat", "dogs bark cats", "stock market rally",
             "bond yields fall", "goal scored late", "striker shot wide"]
    labels = ["pets", "pets", "fin", "fin", "sport", "sport"]
    out = str(tmp_path / "lda.png")
    assert visualize_domain_shift(texts, labels, out, method="lda") == out
    out2 = str(tmp_path / "lda2.png")
    assert visualize_domain_shift(texts[:4], labels[:4], out2,
                                  method="lda") == out2
