"""Native C ingest extension: build, parity with the Python path, speed."""

import time

import numpy as np
import pytest

from carel_tpu.data.tokenizer import BaseTokenizer, ZhCharTokenizer
from carel_tpu.native.build import load_fastingest
from carel_tpu.native.fast_tokenizer import native_encode_batch


@pytest.fixture(scope="module")
def mod():
    m = load_fastingest()
    if m is None:
        pytest.skip("no C compiler available")
    return m


@pytest.fixture(scope="module")
def tok():
    corpus = ["他很难过因为天气变冷", "她笑了收到礼物 abc 123"]
    return ZhCharTokenizer.from_corpus(corpus)


def _python_encode(tok, texts, max_len):
    return BaseTokenizer.encode_batch(tok, texts, max_len)


def test_native_matches_python(mod, tok):
    texts = [
        "他很难过[SEP]天气变冷",
        "她笑了[SEP]收到礼物",
        "",
        "未知字符测试xyz",
        "a[SEP]b[SEP]c",
        "  空白  处理 [SEP] 正常 ",
    ]
    got = native_encode_batch(tok, texts, 16)
    want = _python_encode(tok, texts, 16)
    np.testing.assert_array_equal(got[0], want.input_ids)
    np.testing.assert_array_equal(got[1], want.attention_mask)
    np.testing.assert_array_equal(got[2], want.token_type_ids)


def test_native_truncation_matches(mod, tok):
    texts = ["他很难过因为天气变冷" * 10 + "[SEP]" + "她笑了" * 20]
    got = native_encode_batch(tok, texts, 24)
    want = _python_encode(tok, texts, 24)
    np.testing.assert_array_equal(got[0], want.input_ids)
    np.testing.assert_array_equal(got[1], want.attention_mask)


def test_native_is_faster(mod, tok):
    # best-of-3 each side: a single timing pair is flaky when the host is
    # loaded (e.g. a concurrent pretraining job's jieba/tokenizer prep)
    texts = ["他很难过因为天气变冷了[SEP]她笑了收到礼物了"] * 2000

    t_native = min(
        _timed(lambda: native_encode_batch(tok, texts, 128))
        for _ in range(3))
    t_python = min(
        _timed(lambda: _python_encode(tok, texts, 128)) for _ in range(3))

    assert t_native < t_python, (t_native, t_python)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_tokenizer_dispatches_to_native(mod, tok):
    # ZhCharTokenizer.encode_batch should transparently use the C path and
    # produce identical results
    texts = ["他很难过[SEP]天气变冷"] * 3
    enc = tok.encode_batch(texts, 16)
    want = _python_encode(tok, texts, 16)
    np.testing.assert_array_equal(enc.input_ids, want.input_ids)
