"""Host→device input pipeline: prefetched, double-buffered batch production.

The reference overlaps host work with accelerator compute via DataLoader
worker processes (`/root/reference/probing/train/multitask_trainer.py:165-175`).
The JAX-native equivalent here is a bounded-queue prefetcher: a producer
thread runs the (native C++ or PIL) decode for batch *i+1* while the TPU
executes batch *i*; JAX's async dispatch provides the second level of
overlap (device_put + compute enqueue return immediately).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Sequence, TypeVar

T = TypeVar("T")
_SENTINEL = object()


def prefetch_batches(items: Sequence[Any],
                     make_batch: Callable[[Any], T],
                     depth: int = 2) -> Iterator[T]:
    """Yield ``make_batch(item)`` for each item, produced ``depth`` ahead on
    a background thread. Exceptions propagate to the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def producer():
        try:
            for it in items:
                q.put(make_batch(it))
        except BaseException as e:       # noqa: BLE001 — re-raised below
            err.append(e)
        finally:
            q.put(_SENTINEL)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    while True:
        out = q.get()
        if out is _SENTINEL:
            break
        yield out
    th.join()
    if err:
        raise err[0]
