"""Second concrete doc-store backend: bucket-partitioned dir-of-JSONL.

The reference ships several interchangeable storage providers behind one
interface — `providers/storage/mongodocstore.js:1-104` (document store
keyed by url) and `googleCloudStorage.js` alongside the Azure-blob
default — resolved by name through the provider factory
(`lib/crawlerFactory.js:479-506`). This is the analogue second backend:
the same 7-method surface as ``state.store.PagesDocStore`` (get / etag /
list / count / delete / upsert, `storageDocStore.js:33-189`) over
append-only JSON-lines files, registered in the ``plugins`` doc-store
registry so deployments pick a backend by name (or ``"module:Class"``).

Layout: ``{root}/docs/bucket={B}.jsonl`` — one append-only file per
url-hash bucket (``hash64(url) % n_buckets``, the same J4 deterministic
url→blob mapping as the parquet store), one JSON object per line with
the full envelope (url, lang, etag, text, wave, version). Upsert
APPENDS superseding rows (wave from ``{root}/meta.json``'s counter,
version bumped past the url's live version); the latest (wave, version)
row per url is the live document — identical visible semantics to the
parquet store, so ``tests/test_store.py`` runs the same suite over both.

Point operations prune to ONE bucket file; ``delete`` rewrites only that
file. This backend trades the parquet store's columnar scans for O(1)
appends — the profile of a metadata/ops store, not the crawl hot path
(the engine's extract stage keeps writing parquet either way).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

from ..urls import hash64_array

PAGE_COLS = ["url", "lang", "etag", "text", "wave", "version"]


class JsonlDocStore:
    def __init__(self, out_dir: str | Path, n_buckets: int = 64):
        self.root = Path(out_dir)
        self.docs = self.root / "docs"
        self.n_buckets = n_buckets

    # -- internals ---------------------------------------------------
    def _bucket_of(self, url: str) -> int:
        return int(hash64_array(pd.Series([url]))[0] % self.n_buckets)

    def _bucket_path(self, bucket: int) -> Path:
        return self.docs / f"bucket={bucket}.jsonl"

    def _bucket_rows(self, bucket: int) -> pd.DataFrame:
        p = self._bucket_path(bucket)
        if not p.exists():
            return pd.DataFrame({c: pd.Series(
                [], dtype=np.int64 if c in ("wave", "version") else object)
                for c in PAGE_COLS})
        recs = [json.loads(line) for line in
                p.read_text().splitlines() if line]
        return pd.DataFrame(recs, columns=PAGE_COLS)

    @staticmethod
    def _latest(df: pd.DataFrame) -> pd.DataFrame:
        """One live row per url: max (wave, version) wins — the shared
        upsert-by-append contract with the parquet store."""
        if not len(df):
            return df
        df = df.sort_values(["url", "wave", "version"], kind="stable")
        return df[~df["url"].duplicated(keep="last")]

    def _next_wave(self) -> int:
        m = self.root / "meta.json"
        return int(json.loads(m.read_text())["next_wave"]) if m.exists() \
            else 0

    def _bump_wave(self, used: int) -> None:
        m = self.root / "meta.json"
        m.parent.mkdir(parents=True, exist_ok=True)
        m.write_text(json.dumps({"next_wave": used + 1}))

    # -- the 7-method interface ---------------------------------------
    def get(self, url: str) -> dict | None:
        rows = self._bucket_rows(self._bucket_of(url))
        rows = self._latest(rows[rows["url"] == url])
        return None if not len(rows) else rows.iloc[0].to_dict()

    def etag(self, url: str) -> str | None:
        doc = self.get(url)
        return None if doc is None else str(doc["etag"])

    def list(self, prefix: str = "", limit: int | None = None) -> pd.DataFrame:
        out = []
        budget = limit
        for b in range(self.n_buckets):
            rows = self._bucket_rows(b)[["url", "etag", "wave", "version"]]
            if prefix:
                rows = rows[rows["url"].str.startswith(prefix)]
            rows = self._latest(rows)
            if len(rows):
                out.append(rows)
                if budget is not None:
                    budget -= len(rows)
                    if budget <= 0:
                        break
        if not out:
            return pd.DataFrame({c: [] for c in
                                 ["url", "etag", "wave", "version"]})
        df = pd.concat(out, ignore_index=True).sort_values("url") \
            .reset_index(drop=True)
        return df.head(limit) if limit is not None else df

    def count(self, live_only: bool = True) -> int:
        n = 0
        for b in range(self.n_buckets):
            p = self._bucket_path(b)
            if not p.exists():
                continue
            if live_only:
                n += self._latest(self._bucket_rows(b))["url"].nunique()
            else:
                n += sum(1 for line in p.read_text().splitlines() if line)
        return n

    def delete(self, url: str) -> int:
        p = self._bucket_path(self._bucket_of(url))
        if not p.exists():
            return 0
        kept, removed = [], 0
        for line in p.read_text().splitlines():
            if not line:
                continue
            if json.loads(line)["url"] == url:
                removed += 1
            else:
                kept.append(line)
        if removed:
            if kept:
                p.write_text("\n".join(kept) + "\n")
            else:
                p.unlink()
        return removed

    def upsert(self, docs: pd.DataFrame) -> int:
        wave = self._next_wave()
        d = docs.copy()
        d["wave"] = np.int64(wave)
        versions = []
        for u in d["url"]:
            cur = self.get(str(u))
            versions.append(int(cur["version"]) + 1 if cur else 1)
        d["version"] = np.array(versions, dtype=np.int64)
        bucket = (hash64_array(d["url"].astype(str))
                  % self.n_buckets).astype(np.int64)
        self.docs.mkdir(parents=True, exist_ok=True)
        for b in np.unique(bucket):
            sub = d[bucket == b][PAGE_COLS]
            with self._bucket_path(int(b)).open("a") as f:
                for rec in sub.to_dict(orient="records"):
                    rec = {k: (int(v) if isinstance(v, np.integer) else v)
                           for k, v in rec.items()}
                    f.write(json.dumps(rec) + "\n")
        self._bump_wave(wave)
        return wave
