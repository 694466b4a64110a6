from carel_tpu.data.ecpe_format import Clause, Document, parse_ecpe_file, parse_ecpe_text, write_ecpe_file  # noqa: F401
from carel_tpu.data.pairs import PairExample, build_pairs, PairSet  # noqa: F401
from carel_tpu.data.bow import BowVocab, build_bow_vocab_zh, build_bow_vocab_en, bow_tokenize_en, tokenize_zh  # noqa: F401
