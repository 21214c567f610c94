"""CDX-style capture index over the crawled pages table.

The Common-Crawl/Wayback retrieval primitive the reference's doc store
lookups approximate (`providers/storage/storageDocStore.js:33-74` get-by-
url): a globally SORTED index of (surt_key, ts_ms, digest, n_bytes, url)
rows, binary-searchable by canonicalized URL key. SURT (Sort-friendly URI
Reordering Transform) reverses the host labels so every capture of one
registered domain is contiguous: ``http://news.a.example/x?q=1`` →
``example,a,news)/x?q=1``.

Scale shape: one vectorized ``map_batches`` pass builds the slim index
rows (html never leaves the scan — only its md5 + length do), then ONE
global range-partitioned sort on (surt_key, ts_ms). The sort is the
point of the artifact — a CDX index IS its ordering (lookups are binary
searches over sorted shards) — so this is the one op where an
all-to-all sort is the correct primitive, and Ray Data's sample-based
range sort keeps every shard bounded.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


def surt_series(urls: pd.Series) -> pd.Series:
    """Vectorized SURT key: lowercase host labels reversed and
    comma-joined + ``)`` + path-and-query (empty path → ``/``)."""
    host = urls.str.extract(r"^https?://([^/?#]+)", expand=False) \
        .fillna("").str.lower()
    rest = urls.str.replace(r"^https?://[^/?#]+", "", regex=True) \
        .str.replace(r"#.*$", "", regex=True)
    rest = rest.where(rest != "", "/")
    rev = host.str.split(".").map(lambda ls: ",".join(reversed(ls)))
    return rev + ")" + rest


def cdx_index(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(surt_key, ts_ms, digest, n_bytes, url) sorted by
    (surt_key, ts_ms) — the capture index for the whole crawl."""

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].astype(str)
        return pd.DataFrame({
            "surt_key": surt_series(urls),
            "ts_ms": (df["warc_ts"].astype("datetime64[us]")
                      .astype(np.int64) // 1000),
            "digest": [hashlib.md5(b).hexdigest() for b in df["html"]],
            "n_bytes": np.array([len(b) for b in df["html"]],
                                dtype=np.int64),
            "url": urls,
        })

    return (pages.map_batches(rows, batch_format="pandas")
            .sort(["surt_key", "ts_ms"]))
