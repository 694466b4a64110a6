"""Background host->device batch prefetching.

The reference's DataLoader runs with num_workers=0 (flagship :955) — every
batch is built synchronously between steps. Here a daemon thread stays
`size` batches ahead, overlapping tokenized-array slicing and the
host->device transfer (device_put releases the GIL) with the device step.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax

_SENTINEL = object()


def prefetch_to_device(
    iterator: Iterator[Any],
    size: int = 2,
    transform: Optional[Callable[[Any], Any]] = None,
    sharding=None,
) -> Iterator[Any]:
    """Yield items from `iterator`, prepared ahead on a background thread.

    transform maps each item (e.g. Batch -> dict) before device placement;
    sharding, when given, device_puts every array leaf with it.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list = []

    def put(item):
        if transform is not None:
            item = transform(item)
        if sharding is not None:
            item = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), item)
        else:
            item = jax.tree_util.tree_map(jax.device_put, item)
        q.put(item)

    def worker():
        try:
            for item in iterator:
                put(item)
        except Exception as e:  # surface in the consumer thread
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    if err:
        raise err[0]
