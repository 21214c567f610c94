"""Content-defined chunking (CDC) and the storage-dedup estimate —
how much smaller the corpus gets if identical CHUNKS are stored once.

Anchor-based chunking after Manber ("Finding similar files in a large
file system", USENIX 1994): a chunk boundary falls after every k-gram
whose rolling hash ≡ 0 (mod D), so boundaries depend only on local
content — an insertion shifts ONE chunk's edges instead of re-aligning
the whole file (the property fixed-size blocks lack, and the reason
every backup/dedup system chunks this way). Exact-duplicate documents
contribute zero new chunks; near-duplicates share every chunk outside
the edited region — the byte-level complement to the doc-level dedup
family in ``ops/dedup``.

Reuses the winnowing fingerprints' vectorized polynomial rolling hash
(``ops/text._rolling_hashes``), so the DuckDB oracle reproduces every
boundary with the already-proven base-257 HUGEINT mirror.

Scale shape (100 TB discipline):
- one streaming pass: each document chunks inside its own batch (text
  never shuffles) and collapses to slim (md5, length, count) partials,
  pre-combined per batch;
- ONE md5-hash co-partition co-locates every copy of a chunk, so chunk
  frequency, distinct counts and distinct bytes are partition-local;
- ≤ #parts scorecard partials fold in a tiny Sum aggregate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from .text import _rolling_hashes

CDC_K = 8            # anchor gram width (shared with the winnowing k)
CDC_DIVISOR = 64     # boundary when hash % D == 0 → ~D-char avg chunks
CDC_FP = 10 ** 6
CDC_PARTS = 32


def doc_chunks(text: str) -> list[str]:
    """Split one document at its content-defined anchors: a boundary
    after every k-gram with rolling_hash % D == 0; the remainder (or a
    boundary-free document) is the tail chunk. Empty text → no chunks.
    Mirrored 1:1 by the oracle's substr arithmetic."""
    if not text:
        return []
    h = _rolling_hashes(text, CDC_K).view(np.uint64)
    cuts = (np.flatnonzero(h % np.uint64(CDC_DIVISOR) == 0)
            + CDC_K).tolist()                      # 0-based exclusive ends
    chunks, prev = [], 0
    for c in cuts:
        chunks.append(text[prev:c])
        prev = c
    if prev < len(text):
        chunks.append(text[prev:])
    return chunks


def cdc_dedup_stats(docs: ray.data.Dataset) -> pd.DataFrame:
    """One-row scorecard (n_chunks, n_distinct_chunks, total_bytes,
    distinct_bytes, dedup_ratio_fp): the corpus chunked content-defined,
    with dedup_ratio_fp = distinct_bytes·FP // total_bytes — the bytes a
    chunk-dedup store would actually keep."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        md5s, lens = [], []
        for t in df["text"].astype(str):
            for ch in doc_chunks(t):
                md5s.append(hashlib.md5(ch.encode()).hexdigest())
                lens.append(len(ch.encode()))
        if not md5s:
            return pd.DataFrame({"part": np.empty(0, np.int32),
                                 "h": np.empty(0, object),
                                 "length": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64)})
        g = pd.DataFrame({"h": np.asarray(md5s, dtype=object),
                          "length": np.asarray(lens, dtype=np.int64)}) \
            .groupby("h", sort=False).agg(length=("length", "first"),
                                          cnt=("length", "size")) \
            .reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        g["part"] = np.fromiter(
            (int(x[:8], 16) % CDC_PARTS for x in g["h"]),
            dtype=np.int32, count=len(g))
        return g[["part", "h", "length", "cnt"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("h", sort=False).agg(length=("length", "first"),
                                             cnt=("cnt", "sum"))
        return pd.DataFrame({
            "n_chunks": [int(per["cnt"].sum())],
            "n_distinct_chunks": [len(per)],
            "total_bytes": [int((per["cnt"] * per["length"]).sum())],
            "distinct_bytes": [int(per["length"].sum())]})

    agg = (docs.select_columns(["text"])
           .map_batches(partial, batch_format="pandas")
           .groupby("part")
           .map_groups(lambda g: fold(g.drop(columns=["part"])),
                       batch_format="pandas")
           .aggregate(Sum("n_chunks", alias_name="n_chunks"),
                      Sum("n_distinct_chunks",
                          alias_name="n_distinct_chunks"),
                      Sum("total_bytes", alias_name="total_bytes"),
                      Sum("distinct_bytes", alias_name="distinct_bytes")))
    n_chunks = int(agg["n_chunks"] or 0)
    n_dist = int(agg["n_distinct_chunks"] or 0)
    total = int(agg["total_bytes"] or 0)
    dist = int(agg["distinct_bytes"] or 0)
    return pd.DataFrame({
        "n_chunks": [n_chunks], "n_distinct_chunks": [n_dist],
        "total_bytes": [total], "distinct_bytes": [dist],
        "dedup_ratio_fp": [(dist * CDC_FP) // total if total else 0]}) \
        .astype(np.int64)
