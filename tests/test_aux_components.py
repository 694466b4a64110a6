"""Tests for self-chain handling, plain pair trainer, CIT triples, and the
embeddings subsystem."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.data.ecpe_format import parse_ecpe_text
from carel_tpu.data.self_chain import build_pairs_self_chain, self_chain_doc_ids
from carel_tpu.data.tokenizer import ZhCharTokenizer
from carel_tpu.data.triples import build_cit_triples, triples_from_predicted_pairs
from carel_tpu.models.encoder import tiny_encoder_config

DOCS = """\
1 3
 (2,2)
1,null,null,天 气 变 冷
2,sadness,null,他 很 难 过
3,null,null,回 家 了
2 3
 (1,2)
1,happiness,null,她 笑 了
2,null,null,收 到 礼 物
3,null,null,那 天 下 午
"""


def test_self_chain_detection():
    docs = parse_ecpe_text(DOCS)
    assert self_chain_doc_ids(docs) == ["1"]


def test_self_chain_pairs_test_mode_filters():
    docs = parse_ecpe_text(DOCS)
    ps = build_pairs_self_chain(docs, test=True)
    # only doc 1 (self-chain) kept
    assert all(e.doc_index == 0 for e in ps.examples)
    pos = [(e.emo_sen_id, e.cau_sen_id) for e in ps.examples if e.label == 1]
    assert pos == [(2, 2)]
    # negatives unsampled: emotion 2 x non-causes {1, 3}
    neg = [(e.emo_sen_id, e.cau_sen_id) for e in ps.examples if e.label == 0]
    assert neg == [(2, 1), (2, 3)]


def test_self_chain_pairs_train_mode_balanced():
    import random

    docs = parse_ecpe_text(DOCS)
    ps = build_pairs_self_chain(docs, test=False, rng=random.Random(0))
    labels = [e.label for e in ps.examples]
    assert labels.count(0) == labels.count(1)


def test_sentence_pair_encoding():
    tok = ZhCharTokenizer.from_corpus(["他很难过天气变冷"])
    enc = tok.encode_sentence_pair_batch(["他很难过"], ["天气变冷"], 16)
    ids = enc.input_ids[0]
    types = enc.token_type_ids[0]
    assert ids[0] == tok.cls_id
    sep_positions = np.where(ids == tok.sep_id)[0]
    assert len(sep_positions) == 2
    # second segment has token_type 1
    assert types[sep_positions[0] + 1] == 1
    assert types[sep_positions[0]] == 0
    assert enc.attention_mask[0][: sep_positions[1] + 1].all()


def test_cit_triples_knn_negative():
    docs = parse_ecpe_text(DOCS)

    def embedder(texts):
        # deterministic fake embeddings: index-based so the 3rd NN is known
        return np.asarray([[float(i), 0.0] for i in range(len(texts))])

    ps = build_cit_triples(docs, embedder)
    # doc 1 self-chain pair (2,2): positive = e[SEP]e[SEP]e
    pos0 = ps.examples[0]
    assert pos0.label == 1
    parts = pos0.pair.split("[SEP]")
    assert parts[0] == parts[1] == parts[2]
    # negative middle element is the 3rd-nearest clause (rank 2)
    neg0 = ps.examples[1]
    assert neg0.label == 0
    nparts = neg0.pair.split("[SEP]")
    assert nparts[0] == parts[0] and nparts[2] == parts[2]
    assert nparts[1] != parts[1]
    # doc 2 chain pair (1,2): positive = e[SEP]c[SEP]c
    pos1 = ps.examples[2]
    p1 = pos1.pair.split("[SEP]")
    assert p1[1] == p1[2]


def test_triples_from_predicted_pairs():
    import pandas as pd

    df = pd.DataFrame({
        "pair": ["甲[SEP]乙", "丙[SEP]丁"],
        "label": [1, 0],
        "emotion": [1, 2],
    })
    ps = triples_from_predicted_pairs(df)
    assert len(ps) == 1
    assert ps.examples[0].pair == "甲[SEP]乙[SEP]乙"


def test_pair_trainer_smoke():
    import random

    from carel_tpu.data.batching import encode_pairs
    from carel_tpu.data.bow import BowVocab
    from carel_tpu.data.pairs import build_pairs
    from carel_tpu.train.pair_trainer import (
        PairTrainerConfig,
        train_pair_classifier,
    )

    docs = parse_ecpe_text(DOCS)
    pairs = build_pairs(docs, test=False, rng=random.Random(0))
    tok = ZhCharTokenizer.from_corpus(
        [c.text for d in docs for c in d.clauses])
    bow = BowVocab.from_words(["难过", "天气"], "zh")
    arrays = encode_pairs(pairs, tok, bow, max_len=16)
    cfg = PairTrainerConfig(max_len=16, batch_size=4, epochs=2,
                            self_iteration=0, learning_rate=1e-3,
                            eval_batch_size=8)
    params, best = train_pair_classifier(
        cfg, tiny_encoder_config(vocab_size=tok.vocab_size),
        arrays, arrays)
    assert 0.0 <= best[2] <= 1.0


def test_embedder_and_triplet_loss():
    from carel_tpu.embeddings import (
        EncoderEmbedder,
        batch_all_triplet_loss,
    )

    tok = ZhCharTokenizer.from_corpus(["他很难过天气变冷她笑了"])
    cfg = tiny_encoder_config(vocab_size=tok.vocab_size)
    from carel_tpu.models.encoder import TransformerEncoder

    model = TransformerEncoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids, jnp.ones((2, 8), jnp.int32),
                        jnp.zeros((2, 8), jnp.int32))["params"]
    emb = EncoderEmbedder(cfg, params, tok, max_len=8, batch_size=2)
    out = emb(["他很难过", "天气变冷", "她笑了"])
    assert out.shape == (3, cfg.hidden_dim)

    # triplet loss: well-separated clusters -> 0; mixed labels -> > 0
    e = jnp.asarray([[0.0, 0], [0.1, 0], [10, 0], [10.1, 0]])
    y = jnp.asarray([0, 0, 1, 1])
    assert float(batch_all_triplet_loss(e, y, margin=1.0)) == 0.0
    y2 = jnp.asarray([0, 1, 0, 1])
    assert float(batch_all_triplet_loss(e, y2, margin=1.0)) > 0


def test_train_domain_embedder_smoke():
    from carel_tpu.embeddings import EmbedderTrainConfig, train_domain_embedder

    tok = ZhCharTokenizer.from_corpus(["他很难过天气变冷她笑了收到礼物"])
    cfg = tiny_encoder_config(vocab_size=tok.vocab_size)
    texts = ["他很难过", "天气变冷", "她笑了", "收到礼物"] * 2
    labels = [0, 0, 1, 1] * 2
    params = train_domain_embedder(
        EmbedderTrainConfig(batch_size=4, epochs=1, max_len=8,
                            learning_rate=1e-3),
        cfg, tok, texts, labels)
    assert "layer_0" in params


def test_original_drl_one_step():
    from carel_tpu.models.drl_original import (
        DrlOriginalModel,
        OriginalModelConfig,
    )
    from carel_tpu.train.steps_original import (
        OriginalLossConfig,
        make_original_train_step,
    )

    enc = tiny_encoder_config(vocab_size=128)
    mcfg = OriginalModelConfig(encoder=enc, ec_dim=8, con_dim=16, bow_dim=32,
                               dropout=0.1)
    model = DrlOriginalModel(mcfg)
    rng = np.random.default_rng(0)
    B, L = 8, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "token_type_ids": jnp.zeros((B, L), jnp.int32),
        "pair_labels": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        "emotion_labels": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
        "bow_indices": jnp.asarray(rng.integers(0, 32, (B, 4)), jnp.int32),
        "bow_weights": jnp.full((B, 4), 0.25, jnp.float32),
        "example_mask": jnp.ones(B, jnp.float32),
    }
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1),
         "dropout": jax.random.key(2)},
        batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"], deterministic=False)["params"]
    for learned in (False, True):
        lcfg = OriginalLossConfig(learned_bow_weights=learned, vae_lr=1e-3)
        build = make_original_train_step(lcfg, model)
        state, step = build(params, jax.random.key(3))
        state2, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["vae_loss"]))
        assert np.isfinite(float(metrics["disc_loss"]))
        # latent projections frozen; discs move via RMSprop
        np.testing.assert_array_equal(
            np.asarray(state["params"]["content_mu"]["kernel"]),
            np.asarray(state2["params"]["content_mu"]["kernel"]))
        d0 = state["params"]["ec_disc"]["kernel"]
        d1 = state2["params"]["ec_disc"]["kernel"]
        assert float(jnp.abs(jnp.asarray(d1) - jnp.asarray(d0)).max()) > 0


def test_pair_scorer_serving_api():
    import dataclasses

    from carel_tpu.config import (
        CarelConfig, DataConfig, LossConfig, ModelConfig, Regularizer,
        TrainConfig,
    )
    from carel_tpu.infer import PairScorer
    from carel_tpu.models.drl import DrlModel

    tok = ZhCharTokenizer.from_corpus(["他很难过天气变冷她笑了收到礼物"])
    cfg = CarelConfig(
        model=ModelConfig(encoder=tiny_encoder_config(vocab_size=tok.vocab_size),
                          ec_dim=8, bow_dim=16),
        loss=LossConfig(regularizer=Regularizer.MMD),
        data=DataConfig(max_len=16, language="zh"),
        train=TrainConfig(donate=False))
    model = DrlModel(cfg.model)
    ids = jnp.zeros((2, 16), jnp.int32)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        ids, jnp.ones((2, 16), jnp.int32), ids)["params"]
    scorer = PairScorer(cfg, model, params, tok, batch_size=4)
    probs = scorer.score_texts([("他很难过", "天气变冷"), ("她笑了", "收到礼物"),
                                ("她笑了", "天气变冷")])
    assert probs.shape == (3,)
    assert np.all((probs >= 0) & (probs <= 1))
    # deterministic scorer is reproducible
    probs2 = scorer.score_texts([("他很难过", "天气变冷"), ("她笑了", "收到礼物"),
                                 ("她笑了", "天气变冷")])
    np.testing.assert_allclose(probs, probs2, atol=1e-6)

    hits = scorer.extract_document(
        ["天气变冷", "他很难过", "收到礼物"], emotion_clause_ids=[2],
        threshold=0.0)
    assert len(hits) == 3
    assert all(h[0] == 2 for h in hits)
    # sorted by probability descending
    assert hits[0][2] >= hits[-1][2]


def test_mlm_pretrain_smoke(tmp_path):
    from carel_tpu.pretrain import (
        MlmConfig,
        load_encoder,
        pretrain_mlm,
        save_encoder,
    )

    tok = ZhCharTokenizer.from_corpus(["他很难过因为天气变冷她笑了收到礼物"])
    enc = tiny_encoder_config(vocab_size=tok.vocab_size, type_vocab_size=0)
    texts = ["他很难过", "因为天气变冷", "她笑了", "收到礼物"] * 8
    cfg = MlmConfig(batch_size=8, seq_len=12, steps=6, warmup_steps=2,
                    learning_rate=1e-3)
    params = pretrain_mlm(enc, tok, texts, cfg)
    assert "layer_0" in params and "word_embeddings" in params
    path = save_encoder(str(tmp_path / "enc"), params)
    restored = load_encoder(path, params)
    np.testing.assert_array_equal(
        np.asarray(restored["word_embeddings"]["embedding"]),
        np.asarray(params["word_embeddings"]["embedding"]))


def test_mlm_scorer_ordering(tmp_path):
    """pretrain --save_mlm -> MlmScorer -> ordering_probe: the in-framework
    ordering_chatyuan analog (directional masked-LM pseudo-log-likelihood,
    ordering_chatyuan.py calc_prob :38-66)."""
    from carel_tpu.pretrain import MlmConfig, pretrain_mlm
    from carel_tpu.tools.mlm_scorer import MlmScorer
    from carel_tpu.tools.ordering import ordering_probe

    tok = ZhCharTokenizer.from_corpus(["他很难过因为天气变冷她笑了收到礼物回家了那天下午"])
    enc = tiny_encoder_config(vocab_size=tok.vocab_size, type_vocab_size=0)
    texts = ["他很难过", "因为天气变冷", "她笑了", "收到礼物"] * 8
    full_dir = str(tmp_path / "mlm_full")
    cfg = MlmConfig(batch_size=8, seq_len=12, steps=6, warmup_steps=2,
                    learning_rate=1e-3, save_full_path=full_dir)
    pretrain_mlm(enc, tok, texts, cfg)

    scorer = MlmScorer(full_dir, tok, enc, max_len=16, hyp_cap=8)
    fwd = scorer("天气变冷", "他很难过")
    bwd = scorer("他很难过", "天气变冷")
    assert np.isfinite(fwd) and np.isfinite(bwd)
    # log-probs of real tokens are <= 0
    assert fwd <= 0.0 and bwd <= 0.0
    # an unscorable direction (premise fills the window) is -inf, not a crash
    assert scorer("他很难过因为天气变冷她笑了收到礼物", "回家") == float("-inf")

    docs = parse_ecpe_text(DOCS)
    stats = ordering_probe(docs, entailment_scorer=scorer)
    # doc 1's pair is a self-chain (e == c): counted but never scored
    assert stats.scored_pairs == 1
    assert stats.forward_wins + stats.backward_wins <= stats.scored_pairs
    assert stats.total_pairs == 2
