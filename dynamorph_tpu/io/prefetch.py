"""Background prefetching of host inputs.

The per-well encode loop is device-bound while the NEXT well's pickles sit
unread on disk; `Prefetcher` overlaps that host IO with device compute using
one worker thread (the reference instead forked a process per well,
run_VAE.py:73-85).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Tuple, TypeVar

T = TypeVar("T")
R = TypeVar("R")


class Prefetcher:
    """Iterate ``loader(item)`` results with the next load running ahead in a
    background thread. Exceptions surface at the failing item's turn."""

    def __init__(self, items: Iterable[T], loader: Callable[[T], R],
                 depth: int = 1):
        self._items = list(items)
        self._loader = loader
        self._pool = ThreadPoolExecutor(max_workers=max(depth, 1))

    def __iter__(self) -> Iterator[Tuple[T, R]]:
        futures = [(item, self._pool.submit(self._loader, item))
                   for item in self._items]
        try:
            for item, fut in futures:
                yield item, fut.result()
        finally:
            self._pool.shutdown(wait=False)

    def __len__(self):
        return len(self._items)
