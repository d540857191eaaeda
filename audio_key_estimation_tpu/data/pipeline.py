"""Async input pipeline: background-thread batch prefetch.

Replaces the reference's DataLoader(num_workers=12) process pool
(train_model.py:83-84) with a bounded producer thread: host-side collation
overlaps device compute, which is all that is needed since features are
precomputed in RAM.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Yield items from `iterable`, produced ahead of time on a thread."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if err:
        raise err[0]
