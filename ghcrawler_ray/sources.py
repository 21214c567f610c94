"""Alternate source / sink formats.

The reference's providers speak JSON everywhere — queue messages are
JSON-serialized requests (`providers/queuing/amqp10Queue.js:125-126`),
doc stores hold JSON blobs (`providers/storage/storageDocStore.js:
33-58`), seeds arrive as JSON request specs (`routes/requests.js:
55-80`). Parquet is this engine's native layout; these adapters let a
user hand over existing JSONL corpora / CSV seed lists and export
results back without a separate conversion job.

All readers return plain ``ray.data.Dataset``s with the engine's
canonical column types, so every downstream op works unchanged; all
writers stream (one file per block — never a driver-side collect).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

#: canonical documents-table dtypes (TESTDATA.md contract)
_DOC_CAST = {"doc_id": np.int64, "n_chars": np.int64}


def read_docs_jsonl(path: str) -> ray.data.Dataset:
    """JSONL → documents Dataset with canonical dtypes (doc_id/n_chars
    int64; text/lang/source strings)."""
    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c, t in _DOC_CAST.items():
            if c in df.columns:
                df[c] = df[c].astype(t)
        for c in ("text", "lang", "source"):
            if c in df.columns:
                df[c] = df[c].astype(str)
        return df

    return ray.data.read_json(path).map_batches(cast, batch_format="pandas")


def write_docs_jsonl(docs: ray.data.Dataset, out_dir: str) -> None:
    """Streaming JSONL export (one file per block)."""
    docs.write_json(out_dir)


def read_seeds_csv(path: str) -> pd.DataFrame:
    """CSV seed list → seed frame for ``frontier.seeds_to_frontier`` /
    ``admin.inject_seeds``. Columns: url (required); priority, policy,
    seq optional with the reference's defaults (`routes/requests.js:
    64-80` buildRequestFromSpec fills type/policy defaults)."""
    df = ray.data.read_csv(path).to_pandas()   # seed lists are small
    if "priority" not in df.columns:
        df["priority"] = "normal"
    if "policy" not in df.columns:
        df["policy"] = "default"
    if "seq" not in df.columns:
        df["seq"] = np.arange(len(df), dtype=np.int64)
    df["url"] = df["url"].astype(str)
    df["priority"] = df["priority"].astype(str)
    df["policy"] = df["policy"].astype(str)
    df["seq"] = df["seq"].astype(np.int64)
    return df[["url", "priority", "policy", "seq"]]
