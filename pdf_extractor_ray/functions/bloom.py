"""Bloom filter — broadcastable key-set membership for semi/anti joins.

ray_guide joins section: "Semi / anti join: broadcast the key set (or a
Bloom filter of it) and filter inside map_batches". The exact key set works
until it doesn't fit in worker memory; a Bloom filter is the constant-size
stand-in with a bounded false-positive rate. Deterministic (splitmix64-based
double hashing, no PYTHONHASHSEED dependence); numpy bit array so it ships
cheaply through ``ray.put``.
"""

from __future__ import annotations

import math

import numpy as np

from .sketches import _splitmix64


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / max(1, capacity) * math.log(2)))
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    def _positions(self, key: int) -> list[int]:
        h1 = _splitmix64(key)
        h2 = _splitmix64(h1) | 1
        return [(h1 + i * h2) % self.m for i in range(self.k)]

    def add(self, key: int) -> None:
        for p in self._positions(int(key)):
            self.bits[p >> 6] |= np.uint64(1 << (p & 63))

    def add_many(self, keys) -> None:
        for key in keys:
            self.add(int(key))

    def __contains__(self, key: int) -> bool:
        for p in self._positions(int(key)):
            if not (int(self.bits[p >> 6]) >> (p & 63)) & 1:
                return False
        return True

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        return np.fromiter((k in self for k in keys), dtype=bool, count=len(keys))
