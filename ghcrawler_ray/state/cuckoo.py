"""Partial-key cuckoo filter over 64-bit hashes — compact seen-set with
delete support.

Why cuckoo (SURVEY.md §2.3 T5): the reference's Redis request tracker
supports *untrack* (`providers/queuing/redisRequestTracker.js:43-53`), i.e.
deletion from the "already enqueued" set — blooms can't delete, cuckoo
filters can (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014). 16-bit fingerprints, 4-slot buckets → fp rate ≈ 2·4/2^16
≈ 1.2e-4, ~2.25 bytes/item at 95% load.

The engine's default seen-set mode is 'exact64' (no false positives — the
parity-tested configuration); 'cuckoo' is the compact 10^10-scale option
(set `CrawlConfig.seen_mode='cuckoo'`).
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_BUCKET_SIZE = 4
_MAX_KICKS = 500
_FP_SEED = np.uint64(0x9E3779B97F4A7C15)


def _fp_hash(fp: np.ndarray) -> np.ndarray:
    """hash of fingerprint for the partner-bucket xor trick."""
    x = fp.astype(np.uint64) * _FP_SEED
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    return x


class CuckooFilter:
    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * _BUCKET_SIZE < capacity / 0.95:
            n_buckets <<= 1
        self.n_buckets = max(8, n_buckets)
        self.mask = np.uint64(self.n_buckets - 1)
        self.table = np.zeros((self.n_buckets, _BUCKET_SIZE), dtype=np.uint16)
        self.n_items = 0

    def _fp_and_index(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = np.asarray(hashes, dtype=np.uint64)
        fp = ((h >> np.uint64(45)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slots
        i1 = (h & self.mask).astype(np.int64)
        return fp, i1

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return ((i.astype(np.uint64) ^ _fp_hash(fp)) & self.mask).astype(np.int64)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(hashes)
        i2 = self._alt_index(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def _insert_one(self, i1: int, fp: int) -> bool:
        rng_state = (i1 * 2654435761 + fp) & 0xFFFFFFFFFFFFFFFF
        i = i1
        cur = int(fp)
        for _ in range(_MAX_KICKS):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                return True
            # evict a deterministic slot (LCG-driven, replayable)
            rng_state = (rng_state * 6364136223846793005 + 1) & 0xFFFFFFFFFFFFFFFF
            slot = (rng_state >> 61) % _BUCKET_SIZE
            cur, row[slot] = int(row[slot]), cur
            i = int(self._alt_index(np.array([i]), np.array([cur], dtype=np.uint16))[0])
        return False  # table full

    def add_many(self, hashes: np.ndarray) -> np.ndarray:
        """Insert each hash (no dedup check); returns success mask."""
        fp, i1 = self._fp_and_index(hashes)
        ok = np.zeros(len(hashes), dtype=bool)
        for j in range(len(hashes)):
            ok[j] = self._insert_one(int(i1[j]), int(fp[j]))
            if ok[j]:
                self.n_items += 1
        return ok

    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one copy of each present hash (untrack semantics)."""
        fp, i1 = self._fp_and_index(hashes)
        i2 = self._alt_index(i1, fp)
        out = np.zeros(len(hashes), dtype=bool)
        for j in range(len(hashes)):
            for i in (int(i1[j]), int(i2[j])):
                row = self.table[i]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    row[hit[0]] = 0
                    self.n_items -= 1
                    out[j] = True
                    break
        return out

    def to_state(self) -> dict:
        return {"kind": "cuckoo", "n_buckets": self.n_buckets,
                "n_items": self.n_items, "table": self.table}

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = int(st["n_buckets"])
        cf.mask = np.uint64(cf.n_buckets - 1)
        cf.table = np.asarray(st["table"], dtype=np.uint16).copy()
        cf.n_items = int(st["n_items"])
        return cf
