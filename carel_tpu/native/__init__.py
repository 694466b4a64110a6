"""Native host-side ingest acceleration (C extension, built on demand).

Compiles csrc/fastingest.c with the system compiler into a cached shared
object on first use; everything degrades gracefully to the pure-Python path
when no compiler is available.
"""

from carel_tpu.native.build import load_fastingest  # noqa: F401
from carel_tpu.native.fast_tokenizer import native_encode_batch  # noqa: F401
