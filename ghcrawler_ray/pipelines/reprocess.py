"""Reprocess pipeline — the storage-authority traversal-policy scenarios
('Just Reprocess' / 'Reprocess and Update', `lib/traversalPolicy.js:
40-50`): run the processors again over the DOC STORE (no origin fetch),
gated by freshness.

Reference parity: fetch=storageOnly means "only use stored content; skip
this resource if we don't already have it" (`traversalPolicy.js:6`), and
freshness='version' processes a doc iff its stored processing version is
behind the current one (`traversalPolicy.js:184-186`). The reference's
processors REWRITE the stored doc with a bumped _metadata.version — so a
second run at the same version is a no-op; mirrored here by rewriting
each store file's ``version`` column in place. The v{N} feature table is
written alongside and a 'reprocessed' delta row is appended per doc
(`providers/storage/deltaStore.js:26-31` analogue).

Ray shape: one remote task per store file — read, vectorized version
gate, vectorized feature processors, three deterministic-name writes
(features, delta, store rewrite). Embarrassingly parallel: no shuffle,
no driver materialization, resumable per file (re-running overwrites the
same file names idempotently). Raw tasks rather than a Dataset because
the unit of work is "rewrite THIS file in place", which map_batches
cannot target (block ≠ file).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..policy import parse_policy

FEATURE_SCHEMA = {
    "url": str, "wave": np.int32, "prev_version": np.int32,
    "version": np.int32, "n_ws_tokens": np.int64, "quality_score": np.float64}


def _store_files(out_dir: str | Path) -> list[str]:
    d = Path(out_dir) / "pages"
    return sorted(str(p) for p in d.glob("wave=*/bucket=*.parquet"))


def _empty_features() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t)
                         for c, t in FEATURE_SCHEMA.items()})


@ray.remote
def _reprocess_file(path: str, dest: str, delta_dir: str, freshness: str,
                    current_version: int) -> str | None:
    """Reprocess one store file; returns the feature-file path written
    (None if every doc was already at the current version)."""
    from ..ops.text import quality_batch, token_count_batch

    t = pq.read_table(path)
    df = t.to_pandas()
    ver = (df["version"].to_numpy(dtype=np.int64)
           if "version" in df.columns else np.zeros(len(df), dtype=np.int64))
    if freshness == "always":
        take = np.ones(len(df), dtype=bool)
    else:            # 'version' / 'matchOrVersion': stored version behind
        take = ver < current_version
    if not take.any():
        return None

    sub = df[take].reset_index(drop=True)
    feats_in = pd.DataFrame({"doc_id": np.arange(len(sub), dtype=np.int64),
                             "text": sub["text"].astype(str)})
    tok = token_count_batch(feats_in)
    qual = quality_batch(feats_in)
    feats = pd.DataFrame({
        "url": sub["url"].astype(str),
        "wave": sub["wave"].astype(np.int32),
        "prev_version": ver[take].astype(np.int32),
        "version": np.int32(current_version),
        "n_ws_tokens": tok["n_ws_tokens"].to_numpy(),
        "quality_score": qual["quality_score"].to_numpy(),
    })

    # deterministic per-source-file names: wave=K/bucket=B → w{K}-b{B}
    p = Path(path)
    stem = f"{p.parent.name.replace('=', '')}-{p.stem.replace('=', '')}"
    dp = Path(dest)
    dp.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(feats, preserve_index=False),
                   dp / f"{stem}.parquet")

    dd = Path(delta_dir)
    dd.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "url": feats["url"], "etag": "", "change": "reprocessed",
        "wave": feats["wave"]}), preserve_index=False),
        dd / f"{stem}.parquet")

    # store rewrite: bump the processed rows' version (the reference's
    # doc._metadata.version bump — makes version-freshness idempotent)
    ver[take] = current_version
    df = df.assign(version=ver.astype(np.int32))
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return str(dp / f"{stem}.parquet")


def reprocess_docs(out_dir: str | Path, policy: str = "reprocess",
                   current_version: int = 2) -> ray.data.Dataset:
    """Re-run the feature processors over stored docs per ``policy``
    (must be a storage-authority policy). Returns the reprocessed rows
    (url, wave, prev_version, version + recomputed features), written to
    ``{out_dir}/docs_v{current_version}/`` plus 'reprocessed' delta rows;
    the store's ``version`` column is bumped in place."""
    fetch, freshness = parse_policy(policy)
    if fetch not in ("storageOnly", "storageOriginIfMissing"):
        raise ValueError(f"{policy!r} is not a storage-authority policy")
    files = _store_files(out_dir)
    if not files:
        raise ValueError(f"no stored docs under {out_dir}/pages")
    out = Path(out_dir)
    dest = out / f"docs_v{current_version}"
    delta_dir = out / "delta" / f"reprocess_v{current_version}"

    written = [w for w in ray.get([
        _reprocess_file.remote(f, str(dest), str(delta_dir), freshness,
                               current_version) for f in files])
        if w is not None]
    if not written:
        return ray.data.from_pandas(_empty_features())
    return ray.data.read_parquet(written)
