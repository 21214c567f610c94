"""Distributed BM25 ranking over the ``documents`` table — the lexical
retrieval primitive of a training-data / search pipeline (the sparse
complement to the dense ANN ops in ``ops.ann``).

Scale shape (100 TB discipline):
- one slim stats pass: ``map_batches`` projects each document to
  (doc_id, dl, tf_j, has_j) — a handful of int64 columns, the text never
  shuffles. The corpus-level constants (N, avgdl, per-term df) come from
  ONE ``aggregate`` over that slim table: Sum/Count reductions whose
  result is #terms scalars on the driver, not data.
- the slim stats dataset is materialized once, so the text is scanned
  exactly once and both the aggregate and the scoring pass reuse it.
- scoring is a stateless vectorized ``map_batches`` (the tiny idf/avgdl
  constants ride in the closure; at fleet scale: ``ray.put`` once);
  each task emits only its LOCAL top-k, so the final exact top-k sort
  sees ≤ k × #blocks rows — the same local-topk → slim-reduce pattern
  as ``ops.ann.ann_topk``.

Float determinism: scores are accumulated term-by-term in a fixed
left-to-right order with the exact operation order the DuckDB mirror
uses (e0 float literals, same associativity), so the oracle comparison
is value-exact after round(…, 6).

Reference context: the reference has no ranking, but its weighted queue
selection (`providers/queuing/queueSet.js:46-65`) is the same
"score-then-pick-best" shape; BM25 is the corpus-scale generalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Count, Sum

from .dedup import _WS_RE

#: fixed query — terms drawn from the synthetic corpus vocabulary
QUERY_TERMS: tuple[str, ...] = ("spark", "window", "hash", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _tf_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Slim per-doc term stats: doc length + per-query-term frequency
    and presence indicator (the df partial)."""
    toks = [_WS_RE.findall(t.lower()) for t in df["text"].tolist()]
    out = {"doc_id": df["doc_id"].to_numpy(dtype=np.int64),
           "dl": np.fromiter((len(t) for t in toks), dtype=np.int64,
                             count=len(toks))}
    for j, term in enumerate(QUERY_TERMS):
        tf = np.fromiter((t.count(term) for t in toks), dtype=np.int64,
                         count=len(toks))
        out[f"tf_{j}"] = tf
        out[f"has_{j}"] = (tf > 0).astype(np.int64)
    return pd.DataFrame(out)


def bm25_topk(docs: ray.data.Dataset, k: int = BM25_TOPK) -> pd.DataFrame:
    """Exact BM25 top-k for the fixed ``QUERY_TERMS`` query:
    (doc_id, rank, score), rank 1..k ordered by score desc, doc_id asc."""
    stats = (docs.select_columns(["doc_id", "text"])
             .map_batches(_tf_batch, batch_format="pandas")
             .materialize())          # slim (ints only); one text scan total

    aggs = [Count(alias_name="n"), Sum("dl", alias_name="sum_dl")]
    aggs += [Sum(f"has_{j}", alias_name=f"df_{j}")
             for j in range(len(QUERY_TERMS))]
    c = stats.aggregate(*aggs)        # #terms+2 scalars on the driver
    n = float(c["n"])
    avgdl = float(c["sum_dl"]) / n
    idf = [np.log((n - float(c[f"df_{j}"]) + 0.5) / (float(c[f"df_{j}"]) + 0.5)
                  + 1.0) for j in range(len(QUERY_TERMS))]

    def score_local_topk(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(dtype=np.float64)
        norm = BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avgdl)
        score = np.zeros(len(df), dtype=np.float64)
        for j in range(len(QUERY_TERMS)):   # fixed-order accumulation
            tf = df[f"tf_{j}"].to_numpy(dtype=np.float64)
            score = score + idf[j] * (tf * (BM25_K1 + 1.0)) / (tf + norm)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                            "score": score})
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k)

    top = (stats.map_batches(score_local_topk, batch_format="pandas")
           .to_pandas())               # ≤ k × #blocks slim rows
    top = top.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["score"] = top["score"].round(6)
    return top[["doc_id", "rank", "score"]]


# ---- inverted index (postings) ----

def _postings_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Flat postings (token, doc_id, tf, first_pos) — complete per batch
    because each document's tokens live entirely in its own row, so NO
    cross-batch combine or shuffle is needed: the op is embarrassingly
    parallel and the text never leaves the task. first_pos is 0-based.
    Vectorized: explode all (doc, token, pos) triples, one C-level
    pandas groupby per batch."""
    tok_lists = [_WS_RE.findall(t.lower()) for t in df["text"].tolist()]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    if lens.sum() == 0:
        return pd.DataFrame({"token": np.array([], dtype=object),
                             "doc_id": np.array([], dtype=np.int64),
                             "tf": np.array([], dtype=np.int64),
                             "first_pos": np.array([], dtype=np.int64)})
    flat = pd.DataFrame({
        "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64), lens),
        "token": np.concatenate([np.asarray(t, dtype=object)
                                 for t in tok_lists if t]),
        "pos": np.concatenate([np.arange(n, dtype=np.int64)
                               for n in lens if n]),
    })
    g = flat.groupby(["doc_id", "token"], sort=False)["pos"] \
        .agg(tf="size", first_pos="min").reset_index()
    return pd.DataFrame({"token": g["token"].to_numpy(dtype=object),
                         "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                         "tf": g["tf"].to_numpy(dtype=np.int64),
                         "first_pos": g["first_pos"].to_numpy(dtype=np.int64)})


def postings(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Inverted-index postings over the corpus: one row per distinct
    (token, document) with term frequency and first position. At fleet
    scale the output is written as token-hash-partitioned parquet (the
    index shards); here it stays a Dataset for the caller to sink."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _postings_batch, batch_format="pandas")
