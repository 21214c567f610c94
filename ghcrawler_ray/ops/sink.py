"""Resumable sharded-Parquet corpus sink — the write discipline the
100 TB pipeline needs: output is split into deterministic key-hash
shards (one file per shard, atomic rename), so a failed run re-executes
ONLY the missing shards and never produces one giant file.

Ray-Data-first shape:
- shard id is a pure function of doc_id (md5 bucket — stable across
  reruns and corpus appends, same convention as
  ``ops.corpus.sample_bucket``);
- finished shards are pruned BEFORE the shuffle: the tagging
  ``map_batches`` drops their rows at the scan, so a resume moves only
  the missing shards' bytes;
- one ``groupby(shard).map_groups`` co-locates each shard and writes it
  as tmp-file + atomic rename; the returned manifest is #shards slim
  rows (the driver never sees row data).

Reference context: the reference's storage providers upsert one blob
per document with deterministic names so recrawls are idempotent
(`providers/storage/azureBlobStorage.js` name-by-urn); this is the
corpus-batch analogue — idempotent deterministic shard files.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

SHARD_FMT = "shard={:05d}.parquet"


def shard_of(doc_ids, n_shards: int) -> np.ndarray:
    """Deterministic shard in [0, n_shards): full-width md5 bucket of
    the doc_id (own salt, so it is independent of the 0-99 sampling
    bucket)."""
    import hashlib
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(f"shard-{int(d)}".encode()).digest()[:8], "big")
         % n_shards for d in doc_ids),
        dtype=np.int64, count=len(doc_ids))


def write_corpus_shards(docs: ray.data.Dataset, out_dir: str,
                        n_shards: int = 64) -> pd.DataFrame:
    """Write ``docs`` as ``out_dir/shard=NNNNN.parquet`` (rows ordered by
    doc_id within a shard). Idempotent/resumable: shards whose file
    already exists are skipped entirely (their rows are dropped at the
    scan). Returns the manifest (shard, n_rows, path, skipped)."""
    os.makedirs(out_dir, exist_ok=True)
    done = {int(f.split("=")[1].split(".")[0])
            for f in os.listdir(out_dir)
            if f.startswith("shard=") and f.endswith(".parquet")}

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shard"] = shard_of(df["doc_id"], n_shards)
        if done:
            df = df[~df["shard"].isin(done)]
        return df

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        g = g.drop(columns=["shard"]).sort_values("doc_id", kind="stable")
        path = os.path.join(out_dir, SHARD_FMT.format(shard))
        tmp = path + f".tmp{os.getpid()}"
        g.to_parquet(tmp, index=False)
        os.replace(tmp, path)          # atomic: presence == complete
        return pd.DataFrame({"shard": [shard],
                             "n_rows": np.array([len(g)], dtype=np.int64),
                             "path": [path]})

    tagged = docs.map_batches(tag, batch_format="pandas")
    written = tagged.groupby("shard").map_groups(
        write_one, batch_format="pandas").to_pandas()   # #shards rows
    skipped = pd.DataFrame({
        "shard": sorted(done),
        "n_rows": np.full(len(done), -1, dtype=np.int64),
        "path": [os.path.join(out_dir, SHARD_FMT.format(s))
                 for s in sorted(done)]})
    out = pd.concat([written.assign(skipped=False),
                     skipped.assign(skipped=True)], ignore_index=True)
    return out.sort_values("shard", kind="stable").reset_index(drop=True)


def read_corpus_shards(out_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(out_dir)
