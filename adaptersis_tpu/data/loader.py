"""Host-side batching with background prefetch, feeding the on-device pipeline.

The reference uses torch DataLoader with num_workers CPU processes running PIL +
albumentations (train.py:168-174). TPU-first design: the host only decodes and
collates uint8 arrays; augmentation/normalization are fused into the jitted train
step (data/augment.py). A double-buffered thread pool keeps the host ahead of the
device without multiprocessing.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    """Iterable over (images uint8 (B,H,W,3), masks int32 (B,H,W), idx int32 (B,))."""

    def __init__(self, dataset, sampler=None, batch_size: int = 16,
                 num_workers: int = 4, drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        # stream from the sampler: infinite samplers (ShardedInfiniteSampler)
        # never terminate, so indices must not be materialized up front
        source = iter(self.sampler) if self.sampler is not None else iter(range(len(self.dataset)))
        b = []
        for i in source:
            b.append(i)
            if len(b) == self.batch_size:
                yield b
                b = []
        if b and not self.drop_last:
            yield b

    def _collate(self, pool: ThreadPoolExecutor, batch_idx) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        items = list(pool.map(self.dataset.__getitem__, batch_idx))
        imgs = np.stack([it[0] for it in items])
        masks = np.stack([it[1] for it in items])
        idx = np.asarray([it[2] for it in items], np.int32)
        return imgs, masks, idx

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for bidx in self._index_batches():
                        if stop.is_set():
                            return
                        q.put(self._collate(pool, bidx))
                q.put(None)
            except BaseException as e:  # propagate worker errors, never deadlock
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
