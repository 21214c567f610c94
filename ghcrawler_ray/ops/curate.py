"""End-to-end corpus curation: the composed pipeline a training-data run
executes between raw extraction and tokenization —

    quality gate  →  benchmark holdout + decontamination gate
                  →  exact dedup on NORMALIZED text (keep-first)
                  →  curated keep-list with per-doc provenance columns.

Composes the already-oracle-pinned kernels (`ops/text.quality_batch`,
`ops/contamination` shingle probe, `ops/corpus.text_normalize_batch`'s
normalization) into ONE streaming decision pass, so a user of the
reference can run the whole curation chain as a single Dataset pipeline
instead of four separate jobs.

Scale shape (100 TB discipline):
- one `map_batches` pass computes quality + normalization + the
  decontamination membership probe per batch and immediately drops
  failing rows — the text itself never leaves the task; survivors are
  slim feature rows (ids, counts, md5).
- the benchmark shingle set is bounded by the EVAL suite size, collected
  once and broadcast via `ray.put` (read per task, never re-shipped).
- exact dedup is the `aggregate(Min, Count)` shape on the slim rows
  (one hash shuffle, no per-group Python tasks).
- the keep-list → feature join-back is a co-partitioned merge on
  `doc_id % CURATE_PARTS` (tagged union + one int-keyed groupby;
  vectorized `pd.merge` per coarse partition — never a broadcast of an
  O(corpus) side).

Reference parity: the reference slims + gates documents per-type before
store (`providers/fetcher/githubProcessor.js:248-252`,
`lib/crawler.js:321-339` filter chain); this is the web-corpus analogue
composed over OUR training-data gates. Mirrored 1:1 by a DuckDB oracle
(`__ray_entry__._curate_sql`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Count, Min

from .contamination import BENCH_MOD, DECON_K, _batch_grams, benchmark_shingles
from .corpus import NORM_WS_RE
from .text import quality_batch

CURATE_MIN_SCORE = 0.5   # composite quality-score floor
CURATE_MIN_TOKENS = 10   # ws-token floor (drops fragments)
CURATE_PARTS = 64        # co-partition key space for the keep-list join


OUT_COLS = ["doc_id", "lang", "source", "n_ws_tokens", "quality_score",
            "norm_md5", "n_copies"]


def corpus_curate(docs: ray.data.Dataset,
                  min_score: float = CURATE_MIN_SCORE,
                  min_tokens: int = CURATE_MIN_TOKENS) -> ray.data.Dataset:
    """(doc_id, lang, source, n_ws_tokens, quality_score, norm_md5,
    n_copies): one row per KEPT document — quality-passing,
    non-benchmark, decontaminated, and the keep-first (min doc_id)
    representative of its normalized-text duplicate class. ``n_copies``
    is the size of that duplicate class among gate-surviving docs."""
    bench_ref = ray.put(benchmark_shingles(docs))

    def gates(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(df)
        t = df["text"].astype(str)
        norm = (t.str.lower()
                .str.replace(NORM_WS_RE, " ", regex=True).str.strip())
        md5 = hashlib.md5
        doc_id = df["doc_id"].to_numpy(dtype=np.int64)
        # decontamination probe (distinct raw-text shingles vs benchmark)
        bench = ray.get(bench_ref)
        cat, lens = _batch_grams(t.tolist(), DECON_K, distinct=True)
        if len(bench) and len(cat):
            idx = np.minimum(np.searchsorted(bench, cat), len(bench) - 1)
            hit = (bench[idx] == cat).astype(np.int64)
        else:
            hit = np.zeros(len(cat), dtype=np.int64)
        ends = np.cumsum(lens)
        csum = np.concatenate([[0], np.cumsum(hit)])
        n_hits = csum[ends] - csum[ends - lens]
        keep = ((q["quality_score"].to_numpy() >= min_score)
                & (q["n_ws_tokens"].to_numpy() >= min_tokens)
                & (doc_id % BENCH_MOD != 0)
                & (n_hits == 0))
        out = pd.DataFrame({
            "doc_id": doc_id,
            "lang": df["lang"].astype(str).to_numpy(),
            "source": df["source"].astype(str).to_numpy(),
            "n_ws_tokens": q["n_ws_tokens"].to_numpy(dtype=np.int64),
            "quality_score": q["quality_score"].to_numpy(),
            "norm_md5": [md5(s.encode()).hexdigest() for s in norm],
        })
        return out[keep]

    feats = (docs.select_columns(["doc_id", "text", "lang", "source"])
             .map_batches(gates, batch_format="pandas"))

    kept = (feats.select_columns(["norm_md5", "doc_id"])
            .groupby("norm_md5")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_copies")))

    def tag_a(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["doc_id"].to_numpy(dtype=np.int64)
                      % CURATE_PARTS).astype(np.int32)
        df["n_copies"] = np.int64(0)
        df["side"] = np.int8(0)
        return df[OUT_COLS + ["part", "side"]]

    def tag_b(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "lang": "", "source": "",
            "n_ws_tokens": np.int64(0), "quality_score": np.float64(0),
            "norm_md5": df["norm_md5"].astype(str).to_numpy(),
            "n_copies": df["n_copies"].to_numpy(dtype=np.int64),
        })
        out["part"] = (out["doc_id"].to_numpy(dtype=np.int64)
                       % CURATE_PARTS).astype(np.int32)
        out["side"] = np.int8(1)
        return out[OUT_COLS + ["part", "side"]]

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        m = a.drop(columns=["n_copies", "part", "side"]).merge(
            b[["doc_id", "norm_md5", "n_copies"]],
            on=["doc_id", "norm_md5"], how="inner")
        return m[OUT_COLS]

    tagged = (feats.map_batches(tag_a, batch_format="pandas")
              .union(kept.map_batches(tag_b, batch_format="pandas")))
    return tagged.groupby("part").map_groups(join_part,
                                             batch_format="pandas")
