"""Sparse similarity joins over shingle features — cosine (symmetric
near-dup) and containment (asymmetric quote / subset detection).

These complement the LSH family in ``ops.dedup``: LSH is probabilistic
(recall < 1 by design); the joins here are EXACT for every pair that
shares at least one discriminative shingle, at the cost of a feature
shuffle instead of a signature shuffle. The classic use: cosine for
boilerplate-tolerant near-dup scoring, containment for "document A is
quoted / wholly included in document B" (mirrors with extra chrome),
which Jaccard and cosine both under-score when |A| ≪ |B|.

Scale shape (100 TB discipline) — three slim shuffles, text scanned once:
1. combiner (``map_batches``): each document (whole text lives in its
   own row) folds to (shingle, tf) rows carrying the doc's TRUE norm /
   set size computed over ALL its shingles; the text never shuffles.
2. feature co-partition (``groupby(hash(shingle) % P)``): document
   frequency is partition-local; shingles with df ∉ [2, DF_MAX] are
   pruned — df=1 can't form a pair, df > DF_MAX are near-stopword
   features whose pair blowup is O(df²) (standard similarity-join
   pruning; scores become a documented lower bound). Surviving groups
   self-merge (C-level hash join, no Python pair loops) into
   (doc_a, doc_b, partial) rows.
3. pair co-partition: partial dot products / intersections Sum-fold
   per (doc_a, doc_b); the threshold filter runs where the pair lands,
   so only qualifying pairs return.

All scores are int64 fixed-point ((value · FP) // denom with a fixed
operation order), so the DuckDB oracle reproduces every bit.

Reference context: the reference crawler dedups only by exact etag /
content hash (`lib/crawler.js` upsert path); these ops are the
corpus-scale generalization a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .dedup import SHINGLE_K, _WS_RE

SIM_FP = 10 ** 6          # fixed-point scale for all scores
COSINE_THRESHOLD = 0.5    # report pairs with cosine >= this
CONTAIN_THRESHOLD = 0.8   # report pairs where either containment >= this
SIM_DF_MAX = 64           # prune shingles shared by more docs than this
N_SIM_PARTS = 64          # co-partition key count (fixed job parameter)

#: precomputed integer filters (avoid float compare in the hot path)
_COS2_FP_MIN = int(COSINE_THRESHOLD * COSINE_THRESHOLD * SIM_FP)
_CONT_FP_MIN = int(CONTAIN_THRESHOLD * SIM_FP)


def _shingles(text: str) -> list[str]:
    """All k-token shingles WITH multiplicity (cosine tf needs counts;
    the containment path distincts them)."""
    toks = _WS_RE.findall(text.lower())
    return [" ".join(toks[i:i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)]


_EMPTY_TF = {"part": np.empty(0, np.int32),
             "doc_id": np.empty(0, np.int64),
             "sh": np.empty(0, object),
             "tf": np.empty(0, np.int64),
             "w": np.empty(0, np.int64)}


def _tf_rows(df: pd.DataFrame, *, distinct: bool) -> pd.DataFrame:
    """Slim per-doc shingle stats. ``w`` carries the pair-score
    denominator: Σ tf² (norm², cosine) or the distinct-shingle count
    (set size, containment) — both computed over ALL the doc's
    shingles BEFORE df pruning, so scores use true denominators."""
    from ..urls import hash64_array

    ids, shs, tfs, ws = [], [], [], []
    for doc_id, text in zip(df["doc_id"].to_numpy(dtype=np.int64),
                            df["text"].astype(str)):
        grams = _shingles(text)
        if not grams:
            continue
        uniq, counts = np.unique(np.asarray(grams, dtype=object),
                                 return_counts=True)
        counts = counts.astype(np.int64)
        if distinct:
            counts = np.ones_like(counts)
            w = np.int64(len(uniq))
        else:
            w = np.int64((counts * counts).sum())
        ids.append(np.full(len(uniq), doc_id, dtype=np.int64))
        shs.append(uniq)
        tfs.append(counts)
        ws.append(np.full(len(uniq), w, dtype=np.int64))
    if not ids:
        return pd.DataFrame(_EMPTY_TF)
    out = pd.DataFrame({"doc_id": np.concatenate(ids),
                        "sh": np.concatenate(shs),
                        "tf": np.concatenate(tfs),
                        "w": np.concatenate(ws)})
    out["part"] = (hash64_array(out["sh"]) % N_SIM_PARTS).astype(np.int32)
    return out[["part", "doc_id", "sh", "tf", "w"]]


_EMPTY_PARTIAL = {"ppart": np.empty(0, np.int32),
                  "doc_a": np.empty(0, np.int64),
                  "doc_b": np.empty(0, np.int64),
                  "prod": np.empty(0, np.int64),
                  "wa": np.empty(0, np.int64),
                  "wb": np.empty(0, np.int64)}


def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
    """One feature partition → (doc_a, doc_b, tf_a·tf_b) partials for
    every doc pair sharing a surviving shingle. df is partition-local
    (a shingle's rows all land here); the pair explosion is a C-level
    self-merge bounded by df ≤ SIM_DF_MAX."""
    dfc = g.groupby("sh", sort=False)["doc_id"].transform("size") \
        .to_numpy(dtype=np.int64)
    g = g[(dfc >= 2) & (dfc <= SIM_DF_MAX)]
    if not len(g):
        return pd.DataFrame(_EMPTY_PARTIAL)
    m = g.merge(g, on="sh", suffixes=("_x", "_y"))
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    if not len(m):
        return pd.DataFrame(_EMPTY_PARTIAL)
    doc_a = m["doc_id_x"].to_numpy(dtype=np.int64)
    doc_b = m["doc_id_y"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "ppart": ((doc_a * 1_000_003 + doc_b) % N_SIM_PARTS)
        .astype(np.int32),
        "doc_a": doc_a, "doc_b": doc_b,
        "prod": m["tf_x"].to_numpy(dtype=np.int64)
        * m["tf_y"].to_numpy(dtype=np.int64),
        "wa": m["w_x"].to_numpy(dtype=np.int64),
        "wb": m["w_y"].to_numpy(dtype=np.int64)})


def _pair_table(docs: ray.data.Dataset, *, distinct: bool
                ) -> ray.data.Dataset:
    """Shared front half: text → tf rows → feature co-partition →
    pair partials, keyed by pair-hash for the scoring fold."""
    return (docs.select_columns(["doc_id", "text"])
            .map_batches(lambda df: _tf_rows(df, distinct=distinct),
                         batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: _pair_partials(g.drop(columns=["part"])),
                        batch_format="pandas"))


def shingle_cosine_pairs(docs: ray.data.Dataset,
                         threshold_fp: int = _COS2_FP_MIN
                         ) -> ray.data.Dataset:
    """(doc_a, doc_b, cos2_fp): all pairs whose shingle-tf cosine² ≥
    threshold, as int64 fixed-point cos² = (dot² · FP) // (‖a‖²·‖b‖²).
    cos² is monotone in cosine for non-negative tf vectors, so the
    threshold is exactly cosine ≥ √(threshold_fp / FP) with zero float
    drift; exact duplicates score exactly SIM_FP."""
    def score(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["doc_a", "doc_b"], sort=False).agg(
            dot=("prod", "sum"), wa=("wa", "first"), wb=("wb", "first")) \
            .reset_index()
        dot = a["dot"].to_numpy(dtype=np.int64)
        cos2 = (dot * dot * SIM_FP) // (a["wa"].to_numpy(dtype=np.int64)
                                        * a["wb"].to_numpy(dtype=np.int64))
        keep = cos2 >= threshold_fp
        return pd.DataFrame({
            "doc_a": a["doc_a"].to_numpy(dtype=np.int64)[keep],
            "doc_b": a["doc_b"].to_numpy(dtype=np.int64)[keep],
            "cos2_fp": cos2[keep]})

    return (_pair_table(docs, distinct=False)
            .groupby("ppart")
            .map_groups(lambda g: score(g.drop(columns=["ppart"])),
                        batch_format="pandas"))


def containment_pairs(docs: ray.data.Dataset,
                      threshold_fp: int = _CONT_FP_MIN
                      ) -> ray.data.Dataset:
    """(doc_a, doc_b, cont_a_fp, cont_b_fp): pairs where either
    direction's shingle-set containment |A∩B| / |side| ≥ threshold —
    the quote / subset detector (a short doc fully included in a long
    one scores SIM_FP on its side while Jaccard stays low)."""
    def score(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["doc_a", "doc_b"], sort=False).agg(
            inter=("prod", "sum"), wa=("wa", "first"), wb=("wb", "first")) \
            .reset_index()
        inter = a["inter"].to_numpy(dtype=np.int64)
        cont_a = (inter * SIM_FP) // a["wa"].to_numpy(dtype=np.int64)
        cont_b = (inter * SIM_FP) // a["wb"].to_numpy(dtype=np.int64)
        keep = np.maximum(cont_a, cont_b) >= threshold_fp
        return pd.DataFrame({
            "doc_a": a["doc_a"].to_numpy(dtype=np.int64)[keep],
            "doc_b": a["doc_b"].to_numpy(dtype=np.int64)[keep],
            "cont_a_fp": cont_a[keep], "cont_b_fp": cont_b[keep]})

    return (_pair_table(docs, distinct=True)
            .groupby("ppart")
            .map_groups(lambda g: score(g.drop(columns=["ppart"])),
                        batch_format="pandas"))
