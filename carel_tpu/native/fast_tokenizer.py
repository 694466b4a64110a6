"""Native batch encoding for the character-level tokenizer."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from carel_tpu.native.build import load_fastingest

_TABLE_CACHE: dict = {}


def _codepoint_table(tok) -> Optional[np.ndarray]:
    """int32 codepoint->id table for single-character vocab entries."""
    key = id(tok)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    max_cp = 0
    entries = []
    for t, i in tok.token_to_id.items():
        if len(t) == 1:
            cp = ord(t)
            entries.append((cp, i))
            max_cp = max(max_cp, cp)
    table = np.full(max_cp + 1, -1, np.int32)
    for cp, i in entries:
        table[cp] = i
    _TABLE_CACHE[key] = table
    return table


def native_encode_batch(tok, texts: Sequence[str], max_len: int):
    """(ids, mask, types) via the C extension, or None if unavailable."""
    mod = load_fastingest()
    if mod is None:
        return None
    table = _codepoint_table(tok)
    n = len(texts)
    ids = np.empty((n, max_len), np.int32)
    mask = np.empty((n, max_len), np.int32)
    mod.encode_chars(list(texts), table.tobytes(), memoryview(ids),
                     memoryview(mask), max_len, tok.cls_id, tok.sep_id,
                     tok.unk_id, tok.pad_id)
    types = np.zeros((n, max_len), np.int32)
    return ids, mask, types
