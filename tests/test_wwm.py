"""Whole-word masking map tests (pretrain.mlm.make_word_starts)."""

import numpy as np

from carel_tpu.data.tokenizer import WordPieceTokenizer, ZhCharTokenizer
from carel_tpu.pretrain.mlm import make_word_starts


def test_zh_word_starts_follow_jieba():
    texts = ["我非常高兴地看到了他"]
    tok = ZhCharTokenizer.from_corpus(texts)
    ws = make_word_starts(texts, tok, 16, "zh")
    import jieba

    words = list(jieba.cut(texts[0]))
    pos = 1
    for w in words:
        start = pos
        for _ in w:
            assert ws[0, pos] == start
            pos += 1
    # specials/pad point at themselves
    assert ws[0, 0] == 0
    assert ws[0, pos] == pos


def test_en_word_starts_group_subwords():
    corpus = ["the unbelievable performance", "a believable performer"] * 50
    # vocab too small for whole words -> forced subword splits
    tok = WordPieceTokenizer.train_from_corpus(corpus, vocab_size=30)
    text = "unbelievable performance"
    ids = tok.tokenize_to_ids(text)
    id_to_tok = {v: k for k, v in tok._tok.get_vocab().items()}
    pieces = [id_to_tok[i] for i in ids]
    assert any(p.startswith("##") for p in pieces)  # subwords exist

    ws = make_word_starts([text], tok, 32, "en")
    pos, start = 1, 1
    for p in pieces:
        if not p.startswith("##"):
            start = pos
        assert ws[0, pos] == start
        pos += 1


def test_wwm_masks_whole_words():
    """All tokens of a selected word share one mask decision."""
    import jax
    import jax.numpy as jnp

    # 3 words of 3 tokens each at positions 1-9
    ws = np.asarray([[0, 1, 1, 1, 4, 4, 4, 7, 7, 7, 10, 11]], np.int32)
    u = jax.random.uniform(jax.random.key(0), (1, 12))
    u_eff = jnp.take_along_axis(u, jnp.asarray(ws), axis=1)
    m = np.asarray(u_eff < 0.5)
    for s, e in [(1, 4), (4, 7), (7, 10)]:
        assert len(set(m[0, s:e].tolist())) == 1
