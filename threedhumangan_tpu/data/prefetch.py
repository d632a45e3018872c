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
from typing import Callable, Iterator, Optional


class PrefetchIterator:
    """Wrap a batch iterator; always `depth` batches ahead.

    ``transform`` (optional) runs on each item INSIDE the worker thread —
    the trainer passes its host->device placement here so the H2D transfer
    (~90 ms/batch over the remote-TPU tunnel) overlaps the previous step
    instead of serializing with it (jax dispatch is thread-safe)."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2,
                 transform: Optional[Callable] = None):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error = None

        def worker():
            try:
                for item in iterator:
                    if transform is not None:
                        item = transform(item)
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


def prefetch(iterator: Iterator, depth: int = 2,
             transform: Optional[Callable] = None) -> PrefetchIterator:
    return PrefetchIterator(iterator, depth, transform=transform)
