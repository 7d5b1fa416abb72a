"""Resumable sharded samplers (reference: /root/reference/dinov2/data/samplers.py).

  * EpochSampler (:17-52) — deterministic per-epoch permutation, shard by rank
  * InfiniteSampler (:78-120) — endless shuffled stream
  * ShardedInfiniteSampler (:165-229) — resumable: per-epoch reseed with
    _make_seed(seed, start, iter_count << 24) and `advance` for mid-epoch resume

These are host-side index generators feeding the device pipeline; the reference's
torch DistributedSampler (train.py:167) maps to EpochSampler with
(rank, world_size) = (process_index, process_count).
"""

from __future__ import annotations

import itertools
from typing import Iterator

import numpy as np


def _make_seed(seed: int, start: int, iter_count: int) -> int:
    # reference dinov2/data/samplers.py:160-162
    return seed + start + (iter_count << 24)


class EpochSampler:
    """Deterministic shuffled epoch permutation, sharded across ranks."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1, drop_last: bool = True):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self.size // self.world_size
        return -(-self.size // self.world_size)

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.size)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if not self.drop_last:
            pad = (-len(order)) % self.world_size
            order = np.concatenate([order, order[:pad]])
        shard = order[self.rank :: self.world_size]
        if self.drop_last:
            shard = shard[: len(self)]
        return iter(shard.tolist())


class InfiniteSampler:
    """Endless shuffled index stream (samplers.py:78-120)."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1, advance: int = 0):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.advance = advance

    def _stream(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        while True:
            order = np.arange(self.size)
            if self.shuffle:
                rng.shuffle(order)
            yield from order.tolist()

    def __iter__(self) -> Iterator[int]:
        it = itertools.islice(self._stream(), self.rank, None, self.world_size)
        return itertools.islice(it, self.advance // max(self.world_size, 1), None)


class ShardedInfiniteSampler:
    """Resumable infinite sampler (samplers.py:165-229 semantics):

      * ONE global permutation seeded with `seed`; each rank takes the POSITIONAL
        slice perm[rank::world_size] (truncated to size // world_size — the
        reference's _shuffle_tensor_slice drops the remainder, :129-131)
      * per window, the rank's slice is reshuffled with a fresh seed
        _make_seed(seed, rank, iter_count) so whole windows can be skipped
      * `advance` resume: whole windows are skipped by GLOBAL sample count
        (advance // size), the remainder skips PER-RANK yields — exactly the
        reference's islice(iterator, advance % size, None) (:197-200)
    """

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1, advance: int = 0):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.advance = advance

    def _windows(self, iter_count: int) -> Iterator[int]:
        rng0 = np.random.default_rng(self.seed)
        perm = rng0.permutation(self.size) if self.shuffle else np.arange(self.size)
        count = self.size // self.world_size
        shard = perm[self.rank + np.arange(count) * self.world_size]
        while True:
            if self.shuffle:
                rng = np.random.default_rng(_make_seed(self.seed, self.rank, iter_count))
                yield from rng.permutation(shard).tolist()
            else:
                yield from shard.tolist()
            iter_count += 1

    def __iter__(self) -> Iterator[int]:
        iter_count = self.advance // self.size
        remainder = self.advance - iter_count * self.size
        return itertools.islice(self._windows(iter_count), remainder, None)
