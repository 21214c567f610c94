"""Doc-store admin surface over the engine's bucket-partitioned pages
store — the reference's 7-method storage-provider interface
(`providers/storage/storageDocStore.js:33-189`: upsert/get/etag/
list/delete/count) re-expressed over Parquet.

Layout (written by the extract stage): ``pages/wave=K/bucket=B.parquet``
with columns (url, lang, etag, text, wave, version); bucket =
``hash64(url) % n_buckets``. Upsert-by-URL semantics come from the
layout itself: the LATEST (wave, version) row for a url is the live
document (the reference overwrites the blob in place,
`storageDocStore.js:33-58`; we append a superseding row — same visible
semantics, plus history, like its delta store `deltaStore.js:26-31`).

Every point operation prunes to ONE bucket (`hash64(url) % n_buckets`
names the only files that can hold the url — the J4 deterministic
url→blob mapping, `urlToUrnMappingStore.js:64-68` analogue), so get/etag
read n_waves small files, never the store. ``delete`` rewrites only that
bucket's files. ``count``/``list`` stream footers / single columns.

This is deliberately a driver-side admin utility (the reference's REST
admin surface), not a crawl-path stage: the engine's hot path uses the
vectorized ``pages_meta`` sidecars instead.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..urls import hash64_array

PAGE_COLS = ["url", "lang", "etag", "text", "wave", "version"]


class PagesDocStore:
    def __init__(self, out_dir: str | Path, n_buckets: int = 64):
        self.root = Path(out_dir) / "pages"
        self.n_buckets = n_buckets

    # -- internals ---------------------------------------------------
    def _bucket_of(self, url: str) -> int:
        return int(hash64_array(pd.Series([url])) [0] % self.n_buckets)

    def _bucket_files(self, bucket: int) -> list[Path]:
        return sorted(self.root.glob(f"wave=*/bucket={bucket}.parquet"))

    def _all_files(self) -> list[Path]:
        return sorted(self.root.glob("wave=*/bucket=*.parquet"))

    def _bucket_rows(self, bucket: int, columns: list[str]) -> pd.DataFrame:
        files = self._bucket_files(bucket)
        if not files:
            return pd.DataFrame({c: pd.Series(
                [], dtype=np.int64 if c in ("wave", "version") else object)
                for c in columns})
        return pq.read_table([str(f) for f in files], columns=columns,
                             partitioning=None).to_pandas()

    @staticmethod
    def _latest(df: pd.DataFrame) -> pd.DataFrame:
        """One live row per url: max (wave, version) wins."""
        if not len(df):
            return df
        df = df.sort_values(["url", "wave", "version"], kind="stable")
        return df[~df["url"].duplicated(keep="last")]

    # -- the 7-method interface ---------------------------------------
    def get(self, url: str) -> dict | None:
        """`storageDocStore.js:61-77` — live document row or None."""
        rows = self._bucket_rows(self._bucket_of(url), PAGE_COLS)
        rows = self._latest(rows[rows["url"] == url])
        return None if not len(rows) else rows.iloc[0].to_dict()

    def etag(self, url: str) -> str | None:
        """`storageDocStore.js:81-93` — the URL-seen/changed primitive."""
        rows = self._bucket_rows(self._bucket_of(url),
                                 ["url", "etag", "wave", "version"])
        rows = self._latest(rows[rows["url"] == url])
        return None if not len(rows) else str(rows.iloc[0]["etag"])

    def list(self, prefix: str = "", limit: int | None = None) -> pd.DataFrame:
        """(url, etag, wave, version) of live docs with url prefix
        (`storageDocStore.js:155-170` list-by-type analogue)."""
        out = []
        budget = limit
        for b in range(self.n_buckets):
            rows = self._bucket_rows(b, ["url", "etag", "wave", "version"])
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
        """Row count; live_only counts distinct urls (the visible store
        size), else raw rows from footers only (`storageDocStore.js:
        173-189`)."""
        if not live_only:
            return sum(pq.ParquetFile(str(f)).metadata.num_rows
                       for f in self._all_files())
        n = 0
        for b in range(self.n_buckets):
            rows = self._bucket_rows(b, ["url"])
            n += rows["url"].nunique()
        return n

    def delete(self, url: str) -> int:
        """Drop ALL rows of a url (live + history) by rewriting only its
        bucket's files; empty files are removed. Returns rows removed."""
        removed = 0
        for f in self._bucket_files(self._bucket_of(url)):
            t = pq.read_table(str(f), partitioning=None)
            mask = pa.compute.not_equal(t["url"], pa.scalar(url))
            kept = t.filter(mask)
            if kept.num_rows == t.num_rows:
                continue
            removed += t.num_rows - kept.num_rows
            if kept.num_rows:
                pq.write_table(kept, str(f))
            else:
                f.unlink()
        return removed

    def upsert(self, docs: pd.DataFrame) -> int:
        """Append superseding rows: docs (url, lang, etag, text) land in
        a new wave dir one past the store's max with version bumped past
        the url's live version (`storageDocStore.js:33-58`; the append-
        not-overwrite choice doubles as the delta log `deltaStore.js:
        26-31`). Returns the wave number used."""
        waves = [int(p.name.split("=")[1])
                 for p in self.root.glob("wave=*") if p.is_dir()]
        wave = (max(waves) + 1) if waves else 0
        d = docs.copy()
        d["wave"] = np.int64(wave)
        versions = []
        for u in d["url"]:
            cur = self.get(str(u))
            versions.append(int(cur["version"]) + 1 if cur else 1)
        d["version"] = np.array(versions, dtype=np.int64)
        bucket = (hash64_array(d["url"].astype(str))
                  % self.n_buckets).astype(np.int64)
        out_dir = self.root / f"wave={wave}"
        out_dir.mkdir(parents=True, exist_ok=True)
        for b in np.unique(bucket):
            sub = d[bucket == b][PAGE_COLS]
            pq.write_table(pa.Table.from_pandas(sub, preserve_index=False),
                           str(out_dir / f"bucket={int(b)}.parquet"))
        return wave
