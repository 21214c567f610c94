"""Vectorized bloom filter over 64-bit hashes (numpy bit array).

Used as the fast-negative path inside seen-set shards and as the per-wave
broadcastable pre-check snapshot (SURVEY.md §2.3 T5: "bloom pre-check in the
map task, authoritative check+insert in shard actor"). No false negatives;
false-positive rate ~ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _mix(h: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style avalanche; h is uint64 array."""
    x = h + np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    def __init__(self, capacity: int, bits_per_item: int = 12, n_hashes: int = 6):
        self.m = int(max(64, capacity * bits_per_item))
        self.k = n_hashes
        self.words = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_added = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        return np.stack([_mix(h, s) % np.uint64(self.m) for s in range(self.k)])

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n_added += len(hashes)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)  # (k, n)
        bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    # --- serialization (per-wave snapshot / broadcast) ---
    def to_state(self) -> dict:
        return {"m": self.m, "k": self.k, "n_added": self.n_added, "words": self.words}

    @classmethod
    def from_state(cls, st: dict) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.m, bf.k, bf.n_added = int(st["m"]), int(st["k"]), int(st["n_added"])
        bf.words = np.asarray(st["words"], dtype=np.uint64).copy()
        return bf

    def merge(self, other: "BloomFilter") -> None:
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("bloom shape mismatch")
        self.words |= other.words
        self.n_added += other.n_added
