"""Async host-side input pipeline.

The reference's training loop blocks on synchronous BGZF reads between
optimizer steps (reference: include/mmvae_alg.hh:268-311).  On TPU the
step runs asynchronously under jit dispatch, so the host can decode the
next minibatches while the device computes.  :class:`PrefetchLoader`
runs the data/covariate block reads on a background thread pool and
hands out ready (x, c) batch pairs a configurable depth ahead.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np


def sequential_batches(ntot: int, batch_size: int) -> list[np.ndarray]:
    """The reference's deterministic batch schedule: sequential,
    non-shuffled, wrap-around — batch[j] = (b*B + j) % ntot
    (reference: include/mmvae_alg.hh:261-266)."""
    nbatch = ntot // batch_size
    if nbatch * batch_size < ntot:
        nbatch += 1
    return [
        (np.arange(batch_size, dtype=np.int64) + b * batch_size) % ntot
        for b in range(nbatch)
    ]


class PrefetchLoader:
    """Iterate (batch_indices, x, c) with background prefetch.

    ``data_block`` and ``covar_block`` follow the DATA_BLOCK contract.
    Because blocks own a single reusable buffer, the loader keeps
    ``depth`` private (B, D) copies in flight.
    """

    def __init__(self, data_block, covar_block, batches: Sequence[np.ndarray],
                 depth: int = 2):
        self.data_block = data_block
        self.covar_block = covar_block
        self.batches = list(batches)
        self.depth = max(1, depth)

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def producer():
            try:
                for batch in self.batches:
                    if stop.is_set():
                        return
                    self.data_block.clear()
                    x = self.data_block.read(batch).copy()
                    self.covar_block.clear()
                    c = self.covar_block.read(batch).copy()
                    q.put((batch, x, c))
                q.put(None)
            except BaseException as e:  # surface errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
