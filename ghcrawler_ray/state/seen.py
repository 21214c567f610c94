"""Sharded URL-seen set: the Ray-native replacement for the reference's
global enqueue-dedup and etag index.

Reference parity (file:line into /root/reference):
- tracker tags (global "already enqueued" set, 1 h TTL Redis):
  `providers/queuing/redisRequestTracker.js:17-53,95-138` → shard actors,
  shard = hash64(url) % n_shards; `claim` = tag, `delete` = untrack;
- etag index (url → content-hash, the 304/content-dedup primitive):
  `providers/storage/storageDocStore.js:81-93`,
  `providers/fetcher/githubFetcher.js:26-84` → a second namespace in the
  same shards keyed by hash64(etag);
- per-URL redlock (`lib/crawler.js:161-187`) is *eliminated*: in-wave
  global dedup (groupby url) guarantees each url reaches exactly one claim
  call per wave, so shard ops never race on the same key (SURVEY.md §1.3).

Design: each shard holds either an exact 64-bit hash set (default; zero
false positives → exact parity with the sequential oracle) or a cuckoo
filter (compact 10^10-scale mode, ~2.25 B/url, fp ≈ 1.2e-4), plus a bloom
sidecar serialized per wave for batch-side pre-checks. All shard calls are
batched and vectorized (numpy in / numpy out) — one RPC per shard per map
task, never per row.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import ray

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


class _Exact64:
    """Exact membership over 64-bit hashes.

    Fully vectorized: a sorted base array (searchsorted probes, O(log n)
    per query in C) plus a small unsorted tail of recent inserts, merged
    when it grows. A Python-set implementation cost ~1 µs/element and made
    shard actors the contended resource at millions of claims per wave."""

    _MERGE_AT = 1 << 16

    def __init__(self, capacity: int):
        self._base = np.empty(0, dtype=np.int64)          # sorted, unique
        self._tail = np.empty(0, dtype=np.int64)          # recent, unique
        self._deleted = np.empty(0, dtype=np.int64)       # sorted, rare

    def _compact(self) -> None:
        merged = np.union1d(self._base, self._tail)
        if len(self._deleted):
            keep = ~np.isin(merged, self._deleted, assume_unique=False)
            merged = merged[keep]
            self._deleted = np.empty(0, dtype=np.int64)
        self._base = merged
        self._tail = np.empty(0, dtype=np.int64)

    @staticmethod
    def _in_sorted(arr: np.ndarray, h: np.ndarray) -> np.ndarray:
        if not len(arr):
            return np.zeros(len(h), dtype=bool)
        idx = np.minimum(np.searchsorted(arr, h), len(arr) - 1)
        return arr[idx] == h

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64)
        out = self._in_sorted(self._base, h) | np.isin(h, self._tail)
        if len(self._deleted):
            out &= ~np.isin(h, self._deleted)
        return out

    def add_many(self, hashes: np.ndarray) -> np.ndarray:
        """Insert hashes; already-present hashes (e.g. re-adds after an
        untrack, or retried idempotent claims) are filtered so ``n_items``
        cannot drift."""
        h = np.unique(np.asarray(hashes, dtype=np.int64))
        if len(self._deleted):
            self._deleted = self._deleted[~np.isin(self._deleted, h)]
        h = h[~(self._in_sorted(self._base, h) | np.isin(h, self._tail))]
        self._tail = np.concatenate([self._tail, h])
        if len(self._tail) > self._MERGE_AT:
            self._compact()
        return np.ones(len(hashes), dtype=bool)

    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64)
        present = self.contains_many(h)
        if present.any():
            dels = np.unique(h[present])
            self._tail = self._tail[~np.isin(self._tail, dels)]
            in_base = self._in_sorted(self._base, dels)
            self._deleted = np.union1d(self._deleted, dels[in_base])
        return present

    @property
    def n_items(self) -> int:
        return len(self._base) + len(self._tail) - len(self._deleted)

    def to_state(self) -> dict:
        self._compact()
        return {"kind": "exact64", "hashes": self._base.copy()}

    @classmethod
    def from_state(cls, st: dict) -> "_Exact64":
        obj = cls(0)
        obj._base = np.unique(np.asarray(st["hashes"], dtype=np.int64))
        return obj


def _make_filter(mode: str, capacity: int):
    # resolved through the plugin registry (ghcrawler_ray.plugins), the
    # reference's dynamic provider loading analogue — third-party
    # backends register_seen_filter() and pass their name as seen_mode
    from ..plugins import make_seen_filter
    return make_seen_filter(mode, capacity)


class SeenShard:
    """One shard of the seen set. Instantiate via ``ray.remote(SeenShard)``."""

    def __init__(self, shard_id: int, mode: str = "exact64", capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.mode = mode
        self.capacity = capacity
        self.urls = _make_filter(mode, capacity)
        self.etags = _make_filter(mode, capacity)
        self.bloom = BloomFilter(capacity)
        self.n_claims = 0
        self.n_bounces = 0
        #: hashes first-claimed during the CURRENT wave — makes claims
        #: wave-idempotent: a Ray task retried after its claim RPC already
        #: succeeded re-claims the same hashes and still gets True, instead
        #: of silently bouncing its whole partition (in-wave url dedup
        #: guarantees each hash legitimately reaches claim at most once per
        #: wave, so an in-wave re-claim can only be a retry). Memory is
        #: O(claims this wave), cleared by begin_wave. Tracking is OFF
        #: (None) until the first begin_wave: raw-pool users get the
        #: reference's strict tag semantics (re-claim always bounces).
        self._wave: int | None = None
        self._wave_urls: set[int] = set()
        self._wave_etags: set[int] = set()

    def begin_wave(self, wave: int) -> int:
        self._wave = wave
        self._wave_urls = set()
        self._wave_etags = set()
        return wave

    @staticmethod
    def _retry_mask(hashes: np.ndarray, wave_set: set[int]) -> np.ndarray:
        if not wave_set:
            return np.zeros(len(hashes), dtype=bool)
        return np.fromiter((int(h) in wave_set for h in hashes),
                           dtype=bool, count=len(hashes))

    # --- url namespace (tracker-tag semantics) ---
    def claim(self, hashes: np.ndarray) -> np.ndarray:
        """Insert-if-absent; True where newly claimed (False = bounce).
        Wave-idempotent: re-claims of this wave's own claims return True."""
        seen = self.urls.contains_many(hashes)
        new = ~seen | self._retry_mask(hashes, self._wave_urls)
        if new.any():
            h = hashes[new]
            self.urls.add_many(h)
            self.bloom.add_many(h.astype(np.uint64))
            if self._wave is not None:
                self._wave_urls.update(int(x) for x in h)
        self.n_claims += int(new.sum())
        self.n_bounces += int((~new).sum())
        return new

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.urls.contains_many(hashes)

    def contains_before_wave(self, hashes: np.ndarray) -> np.ndarray:
        """Membership in the seen set AS OF THE START of the current wave
        (claims made during this wave excluded) — the frozen view the
        discovery-time link filter needs: stable while the wave's claim
        RPCs race with its link sinks, so the drop decision is
        deterministic and a retried sink task re-decides identically."""
        seen = self.urls.contains_many(hashes)
        this_wave = self._retry_mask(hashes, self._wave_urls)
        return seen & ~this_wave

    def untrack(self, hashes: np.ndarray) -> np.ndarray:
        """Reference untrack (`redisRequestTracker.js:43-53`). Note: the
        bloom sidecar cannot delete; it over-approximates until next rebuild."""
        return self.urls.delete_many(hashes)

    # --- etag namespace (content-dedup / 304 analogue) ---
    def claim_etags(self, hashes: np.ndarray) -> np.ndarray:
        seen = self.etags.contains_many(hashes)
        new = ~seen | self._retry_mask(hashes, self._wave_etags)
        if new.any():
            h = hashes[new]
            self.etags.add_many(h)
            if self._wave is not None:
                self._wave_etags.update(int(x) for x in h)
        return new

    # --- snapshots (per-wave checkpoint) ---
    def bloom_state(self) -> dict:
        return self.bloom.to_state()

    def save_snapshot(self, path: str) -> str:
        """Write this shard's snapshot itself (scale path: snapshot bytes
        never transit the driver — at the 10^10-URL design point
        ``snapshot_all`` through the driver would be ~80 GB per wave)."""
        import pickle
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(self.snapshot(), f)
        tmp.rename(p)
        return str(p)

    def load_snapshot(self, path: str) -> int:
        import pickle
        with open(path, "rb") as f:
            self.restore(pickle.load(f))
        return self.shard_id

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id, "mode": self.mode, "capacity": self.capacity,
            "urls": self.urls.to_state(), "etags": self.etags.to_state(),
            "n_claims": self.n_claims, "n_bounces": self.n_bounces,
            # the bloom sidecar is persisted so cuckoo-mode resumes keep a
            # correct OVER-approximation (fingerprints can't rebuild it)
            "bloom": self.bloom.to_state(),
        }

    def restore(self, snap: dict) -> None:
        self.mode = snap["mode"]
        self.capacity = int(snap["capacity"])
        from ..plugins import load_seen_filter
        self.urls = load_seen_filter(snap["urls"])
        self.etags = load_seen_filter(snap["etags"])
        self.n_claims = int(snap["n_claims"])
        self.n_bounces = int(snap["n_bounces"])
        if "bloom" in snap:
            self.bloom = BloomFilter.from_state(snap["bloom"])
        else:
            self.bloom = BloomFilter(self.capacity)
            if isinstance(self.urls, _Exact64):
                self.bloom.add_many(snap["urls"]["hashes"].astype(np.uint64))

    def stats(self) -> dict:
        return {"shard_id": self.shard_id, "n_urls": self.urls.n_items,
                "n_etags": self.etags.n_items, "n_claims": self.n_claims,
                "n_bounces": self.n_bounces}


class SeenSetPool:
    """Driver/task-side handle bundle for the shard actors.

    Serializable (holds only actor handles + counts) so map_batches closures
    can carry it; every method splits a hash batch by ``hash % n_shards``
    and issues ONE vectorized RPC per touched shard.
    """

    def __init__(self, n_shards: int, mode: str = "exact64",
                 capacity_per_shard: int = 1 << 20, namespace: str = "seen"):
        self.n_shards = n_shards
        # num_cpus=0: shards are RPC-serving state holders (vectorized numpy
        # ops, mostly idle) — reserving CPU slots for them can deadlock small
        # clusters where actors would otherwise starve Ray Data tasks.
        # SPREAD distributes shards across nodes on a real cluster.
        actor_cls = ray.remote(num_cpus=0)(SeenShard)
        self.shards = [
            actor_cls.options(name=f"{namespace}-shard-{i}", get_if_exists=True,
                              scheduling_strategy="SPREAD")
            .remote(i, mode, capacity_per_shard)
            for i in range(n_shards)
        ]

    def _scatter(self, hashes: np.ndarray):
        shard_of = (hashes % self.n_shards).astype(np.int64)
        parts = {}
        for s in np.unique(shard_of):
            idx = np.flatnonzero(shard_of == s)
            parts[int(s)] = idx
        return parts

    def _call(self, method: str, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        parts = self._scatter(hashes)
        refs = {s: getattr(self.shards[s], method).remote(hashes[idx])
                for s, idx in parts.items()}
        for s, idx in parts.items():
            out[idx] = ray.get(refs[s])
        return out

    def claim(self, hashes: np.ndarray) -> np.ndarray:
        return self._call("claim", hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self._call("contains", hashes)

    def contains_before_wave(self, hashes: np.ndarray) -> np.ndarray:
        return self._call("contains_before_wave", hashes)

    def untrack(self, hashes: np.ndarray) -> np.ndarray:
        return self._call("untrack", hashes)

    def claim_etags(self, hashes: np.ndarray) -> np.ndarray:
        return self._call("claim_etags", hashes)

    # --- wave lifecycle ---
    def begin_wave(self, wave: int) -> None:
        """Reset per-wave claim-idempotency sets on every shard."""
        ray.get([s.begin_wave.remote(wave) for s in self.shards])

    def bloom_refs(self) -> list:
        """ObjectRefs to each shard's bloom state (broadcast per wave)."""
        return [s.bloom_state.remote() for s in self.shards]

    def snapshot_all(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore_all(self, snaps: list[dict]) -> None:
        ray.get([self.shards[int(s["shard_id"])].restore.remote(s) for s in snaps])

    # --- shard-side snapshot files (driver sees only paths) ---
    def save_snapshots(self, snap_dir: str) -> list[str]:
        return ray.get([
            s.save_snapshot.remote(str(Path(snap_dir) / f"shard={i}.pkl"))
            for i, s in enumerate(self.shards)])

    def load_snapshots(self, snap_dir: str) -> None:
        d = Path(snap_dir)
        refs = []
        for i, s in enumerate(self.shards):
            p = d / f"shard={i}.pkl"
            if p.exists():
                refs.append(s.load_snapshot.remote(str(p)))
        ray.get(refs)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])
