"""Host-side batch prefetching.

The reference hides LMDB decode latency behind 3-4 DataLoader workers
(dagger_trainer.py:568-576, iterative_dagger_trainer.py:210-216). The
TPU-side equivalent: one producer thread decodes/collates the next
batches into a bounded queue while the current train step runs on the
accelerator, so store reads, msgpack decode, and padding never serialize
with device compute. A thread (not a process) suffices — the decode work
is numpy/C and releases the GIL, and batches stay in shared memory.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchIterator:
    """Wrap an iterator with a depth-bounded background producer."""

    def __init__(self, iterable: Iterable[T], depth: int = 3):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err = None
        self._done = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(iterable),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator[T]) -> None:
        try:
            for item in it:
                if self._done.is_set():
                    return
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            self._thread.join(timeout=5)
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the producer early (e.g. on epoch break)."""
        self._done.set()
        # drain so a blocked put() can observe the flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def prefetch(iterable: Iterable[T], depth: int = 3) -> Iterator[T]:
    """Background-prefetch ``iterable`` with a queue of ``depth``."""
    return PrefetchIterator(iterable, depth=depth)
