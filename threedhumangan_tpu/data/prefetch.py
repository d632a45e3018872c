"""Background-thread batch prefetcher.

The reference overlaps host data work with GPU compute through torch
DataLoader worker processes; here a single daemon thread keeps a bounded
queue of ready batches ahead of the device (the numpy/PIL/native-C work in
the dataset releases the GIL, so one thread suffices to hide host latency
behind a TPU training step).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class PrefetchIterator:
    """Wrap a batch iterator; always `depth` batches ahead."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error = None

        def worker():
            try:
                for item in iterator:
                    self._queue.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._error = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch(iterator: Iterator, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterator, depth)
