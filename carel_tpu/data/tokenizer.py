"""Tokenizers for the ECPE pipelines.

The reference downloads pretrained HF tokenizers (BertTokenizer for
`hfl/chinese-roberta-wwm-ext`, RobertaTokenizer for `roberta-base`, flagship
:63-71) and encodes each pair string to a fixed 128-token window
(ECPEDataset.__getitem__, flagship :120-146). This module provides the same
fixed-shape encoding with three interchangeable backends:

- ZhCharTokenizer: deterministic character-level vocabulary built from the
  corpus (Chinese BERT tokenization is effectively per-character for CJK);
- trained WordPiece via the `tokenizers` library (offline, cached to disk) for
  English;
- an HF tokenizer directory, when real pretrained vocab files are available
  locally (the TPU environment has no network egress).

All backends understand the literal "[SEP]" embedded in pair strings (the
reference relies on HF special-token splitting for this) and emit
(input_ids, attention_mask, token_type_ids) numpy batches of static shape.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

_SEP_SPLIT = re.compile(r"\s*\[SEP\]\s*")
_CJK = re.compile(u"[一-龥]")


@dataclass
class Encoded:
    input_ids: np.ndarray  # [N, L] int32
    attention_mask: np.ndarray  # [N, L] int32
    token_type_ids: np.ndarray  # [N, L] int32


class BaseTokenizer:
    """Fixed-shape tokenizer interface."""

    pad_id: int
    unk_id: int
    cls_id: int
    sep_id: int
    vocab_size: int

    def tokenize_to_ids(self, text: str) -> List[int]:
        raise NotImplementedError

    def encode(self, text: str, max_len: int) -> Dict[str, np.ndarray]:
        segments = _SEP_SPLIT.split(text)
        ids: List[int] = [self.cls_id]
        for seg in segments:
            ids.extend(self.tokenize_to_ids(seg))
            ids.append(self.sep_id)
        if len(segments) == 0 or (len(segments) == 1 and segments[0] == ""):
            ids = [self.cls_id, self.sep_id]
        # truncate, always keeping a trailing [SEP] like HF truncation does
        if len(ids) > max_len:
            ids = ids[: max_len - 1] + [self.sep_id]
        n = len(ids)
        input_ids = np.full(max_len, self.pad_id, np.int32)
        input_ids[:n] = ids
        mask = np.zeros(max_len, np.int32)
        mask[:n] = 1
        types = np.zeros(max_len, np.int32)
        return {
            "input_ids": input_ids,
            "attention_mask": mask,
            "token_type_ids": types,
        }

    def encode_batch(self, texts: Sequence[str], max_len: int) -> Encoded:
        n = len(texts)
        ids = np.full((n, max_len), self.pad_id, np.int32)
        mask = np.zeros((n, max_len), np.int32)
        types = np.zeros((n, max_len), np.int32)
        for i, t in enumerate(texts):
            e = self.encode(str(t), max_len)
            ids[i] = e["input_ids"]
            mask[i] = e["attention_mask"]
            types[i] = e["token_type_ids"]
        return Encoded(ids, mask, types)

    def encode_sentence_pair_batch(
        self, texts_a: Sequence[str], texts_b: Sequence[str], max_len: int
    ) -> Encoded:
        """Two-segment encoding: [CLS] a [SEP] b [SEP] with token_type_ids
        1 on the second segment — the reference's tokenizer(emo, cau) path
        (pair_classifier_self_chain.py's sentence-pair encoding)."""
        n = len(texts_a)
        ids = np.full((n, max_len), self.pad_id, np.int32)
        mask = np.zeros((n, max_len), np.int32)
        types = np.zeros((n, max_len), np.int32)
        for i, (a, b) in enumerate(zip(texts_a, texts_b)):
            a_ids = self.tokenize_to_ids(str(a))
            b_ids = self.tokenize_to_ids(str(b))
            row = [self.cls_id] + a_ids + [self.sep_id]
            seg = [0] * len(row)
            row += b_ids + [self.sep_id]
            seg += [1] * (len(b_ids) + 1)
            if len(row) > max_len:
                row = row[: max_len - 1] + [self.sep_id]
                seg = seg[: max_len]
            k = len(row)
            ids[i, :k] = row
            types[i, :k] = seg[:k]
            mask[i, :k] = 1
        return Encoded(ids, mask, types)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        raise NotImplementedError


class ZhCharTokenizer(BaseTokenizer):
    """Character-level tokenizer with a deterministic corpus-built vocab.

    Special ids follow the BERT convention ([PAD]=0, [UNK]=1, [CLS]=2,
    [SEP]=3, [MASK]=4) followed by characters in sorted order, padded up to a
    multiple of 128 for MXU-friendly embedding shapes.
    """

    SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]

    def __init__(self, chars: Sequence[str]):
        vocab = list(self.SPECIALS) + sorted(set(chars) - set(self.SPECIALS))
        # round up to a multiple of 128 with reserved slots
        pad_to = (-len(vocab)) % 128
        vocab += [f"[unused{i}]" for i in range(pad_to)]
        self.vocab = vocab
        self.token_to_id = {t: i for i, t in enumerate(vocab)}
        self.pad_id, self.unk_id, self.cls_id, self.sep_id = 0, 1, 2, 3
        self.vocab_size = len(vocab)

    @classmethod
    def from_corpus(cls, texts: Sequence[str]) -> "ZhCharTokenizer":
        chars = set()
        for t in texts:
            for ch in t:
                if not ch.isspace():
                    chars.add(ch)
        return cls(sorted(chars))

    @classmethod
    def load(cls, path: str) -> "ZhCharTokenizer":
        with open(path, encoding="utf8") as f:
            data = json.load(f)
        tok = cls.__new__(cls)
        tok.vocab = data["vocab"]
        tok.token_to_id = {t: i for i, t in enumerate(tok.vocab)}
        tok.pad_id, tok.unk_id, tok.cls_id, tok.sep_id = 0, 1, 2, 3
        tok.vocab_size = len(tok.vocab)
        return tok

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf8") as f:
            json.dump({"kind": "zh_char", "vocab": self.vocab}, f,
                      ensure_ascii=False)

    def tokenize_to_ids(self, text: str) -> List[int]:
        get = self.token_to_id.get
        unk = self.unk_id
        return [get(ch, unk) for ch in text if not ch.isspace()]

    def encode_batch(self, texts: Sequence[str], max_len: int) -> Encoded:
        # native C fast path (carel_tpu.native); falls back to the Python
        # loop when no compiler is available
        try:
            from carel_tpu.native.fast_tokenizer import native_encode_batch

            out = native_encode_batch(self, [str(t) for t in texts], max_len)
            if out is not None:
                return Encoded(*out)
        except Exception:
            pass
        return super().encode_batch(texts, max_len)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        toks = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i < len(self.SPECIALS):
                continue
            if 0 <= i < self.vocab_size:
                t = self.vocab[i]
                if not (t.startswith("[unused")):
                    toks.append(t)
        # space-separated to match the reference's tokenizer.decode output style
        return " ".join(toks)


class WordPieceTokenizer(BaseTokenizer):
    """English WordPiece trained offline from the corpus via `tokenizers`."""

    def __init__(self, tok, vocab_size: int):
        self._tok = tok  # tokenizers.Tokenizer
        self.vocab_size = vocab_size
        v = tok.get_vocab()
        self.pad_id = v.get("[PAD]", 0)
        self.unk_id = v.get("[UNK]", 1)
        self.cls_id = v.get("[CLS]", 2)
        self.sep_id = v.get("[SEP]", 3)

    @classmethod
    def train_from_corpus(
        cls, texts: Sequence[str], vocab_size: int = 8192
    ) -> "WordPieceTokenizer":
        from tokenizers import (
            Tokenizer, decoders, models, normalizers, pre_tokenizers, trainers,
        )

        tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
        tok.decoder = decoders.WordPiece(prefix="##")
        tok.normalizer = normalizers.Sequence(
            [normalizers.NFD(), normalizers.Lowercase(), normalizers.StripAccents()]
        )
        tok.pre_tokenizer = pre_tokenizers.Sequence(
            [pre_tokenizers.WhitespaceSplit(), pre_tokenizers.Punctuation()]
        )
        trainer = trainers.WordPieceTrainer(
            vocab_size=vocab_size,
            special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"],
            continuing_subword_prefix="##",
        )
        tok.train_from_iterator(iter(texts), trainer=trainer)
        return cls(tok, tok.get_vocab_size())

    @classmethod
    def load(cls, path: str) -> "WordPieceTokenizer":
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(path)
        return cls(tok, tok.get_vocab_size())

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._tok.save(path)

    def tokenize_to_ids(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def encode_batch(self, texts: Sequence[str], max_len: int) -> Encoded:
        # fast path through the Rust batch encoder
        n = len(texts)
        ids = np.full((n, max_len), self.pad_id, np.int32)
        mask = np.zeros((n, max_len), np.int32)
        types = np.zeros((n, max_len), np.int32)
        split_texts = [_SEP_SPLIT.split(str(t)) for t in texts]
        flat = [seg for segs in split_texts for seg in segs]
        encodings = self._tok.encode_batch(flat, add_special_tokens=False)
        pos = 0
        for i, segs in enumerate(split_texts):
            row: List[int] = [self.cls_id]
            for _ in segs:
                row.extend(encodings[pos].ids)
                row.append(self.sep_id)
                pos += 1
            if len(row) > max_len:
                row = row[: max_len - 1] + [self.sep_id]
            k = len(row)
            ids[i, :k] = row
            mask[i, :k] = 1
        return Encoded(ids, mask, types)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode([int(i) for i in ids],
                                skip_special_tokens=skip_special_tokens)


class HFTokenizerAdapter(BaseTokenizer):
    """Wraps a locally available HuggingFace tokenizer directory."""

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer
        self.pad_id = hf_tokenizer.pad_token_id or 0
        self.unk_id = hf_tokenizer.unk_token_id or 0
        self.cls_id = hf_tokenizer.cls_token_id \
            if hf_tokenizer.cls_token_id is not None else hf_tokenizer.bos_token_id
        self.sep_id = hf_tokenizer.sep_token_id \
            if hf_tokenizer.sep_token_id is not None else hf_tokenizer.eos_token_id
        self.vocab_size = len(hf_tokenizer)

    @classmethod
    def load(cls, path: str) -> "HFTokenizerAdapter":
        from transformers import AutoTokenizer

        return cls(AutoTokenizer.from_pretrained(path))

    def encode_batch(self, texts: Sequence[str], max_len: int) -> Encoded:
        out = self._tok(
            [str(t) for t in texts],
            add_special_tokens=True,
            max_length=max_len,
            padding="max_length",
            truncation=True,
            return_token_type_ids=True,
            return_attention_mask=True,
            return_tensors="np",
        )
        return Encoded(
            out["input_ids"].astype(np.int32),
            out["attention_mask"].astype(np.int32),
            out.get("token_type_ids",
                    np.zeros_like(out["input_ids"])).astype(np.int32),
        )

    def tokenize_to_ids(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(ids, skip_special_tokens=skip_special_tokens)


def build_tokenizer(
    language: str,
    corpus_texts: Optional[Sequence[str]] = None,
    cache_path: Optional[str] = None,
    hf_path: Optional[str] = None,
    vocab_size: int = 8192,
) -> BaseTokenizer:
    """Resolve a tokenizer: HF dir > disk cache > corpus-built (then cached)."""
    if hf_path and os.path.isdir(hf_path):
        return HFTokenizerAdapter.load(hf_path)
    if cache_path and os.path.exists(cache_path):
        if language == "zh":
            return ZhCharTokenizer.load(cache_path)
        return WordPieceTokenizer.load(cache_path)
    if corpus_texts is None:
        raise ValueError("no cached tokenizer and no corpus to build one from")
    if language == "zh":
        tok: BaseTokenizer = ZhCharTokenizer.from_corpus(corpus_texts)
    else:
        tok = WordPieceTokenizer.train_from_corpus(corpus_texts, vocab_size)
    if cache_path:
        tok.save(cache_path)
    return tok
