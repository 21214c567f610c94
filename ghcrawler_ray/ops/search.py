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

from .dedup import _WS_RE, _hash64_str

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


# ---- TF-IDF top terms per document (integer-surrogate idf) ----

# idf_fp = (N_docs * TFIDF_FP) // df — an integer-exact idf surrogate
# (monotone in 1/df, so rankings match the ln(N/df) classic) that keeps
# the whole op in int64 and the DuckDB mirror bit-exact.
TFIDF_FP = 10 ** 6
TFIDF_TOPK = 3
TFIDF_PARTS = 64


def tfidf_top_terms(docs: ray.data.Dataset,
                    k: int = TFIDF_TOPK) -> ray.data.Dataset:
    """(doc_id, token, tfidf_fp, rank_in_doc): the top-``k`` ws-tokens
    of every document by tf × integer-idf, rank ordered by
    (tfidf_fp desc, token asc).

    Scale shape — two slim co-partition shuffles, NO vocab broadcast
    (the vocabulary of a 100 TB corpus is itself huge):
      1. combiner: per-batch (doc_id, token, tf) rows — (doc_id, token)
         is unique per batch because tf is counted within the doc;
      2. token-hash co-partition: every (doc_id, token) row of a token
         lands in one partition, so df = row count per token is local;
         emit (doc_id, token, tfidf_fp);
      3. doc-hash co-partition: per-doc top-k vectorized across the
         whole partition (sort + groupby head, no per-doc tasks).
    """
    from ..urls import hash64_array

    n_docs = docs.count()

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = [np.array(_WS_RE.findall(t.lower()), dtype=object)
                for t in df["text"].astype(str)]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        if not lens.sum():
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "token": np.empty(0, object),
                                 "tf": np.empty(0, np.int64),
                                 "part": np.empty(0, np.int32)})
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64),
                                lens),
            "token": np.concatenate(toks)})
        out = flat.groupby(["doc_id", "token"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        out["tf"] = out["tf"].astype(np.int64)
        out["part"] = (hash64_array(out["token"]) % TFIDF_PARTS) \
            .astype(np.int32)
        return out

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        df_per_tok = g.groupby("token", sort=False)["doc_id"] \
            .transform("size").to_numpy(dtype=np.int64)
        idf = (np.int64(n_docs) * np.int64(TFIDF_FP)) // df_per_tok
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
            "token": g["token"].to_numpy(dtype=object),
            "tfidf_fp": g["tf"].to_numpy(dtype=np.int64) * idf})
        out["dpart"] = (out["doc_id"] % TFIDF_PARTS).astype(np.int32)
        return out

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tfidf_fp", "token"],
                          ascending=[True, False, True], kind="stable")
        top = g.groupby("doc_id", sort=False).head(k).copy()
        top["rank_in_doc"] = (top.groupby("doc_id", sort=False)
                              .cumcount().to_numpy(dtype=np.int64) + 1)
        return top[["doc_id", "token", "tfidf_fp", "rank_in_doc"]]

    scored = (docs.select_columns(["doc_id", "text"])
              .map_batches(tf_rows, batch_format="pandas")
              .materialize()
              .groupby("part")
              .map_groups(lambda g: score_part(g.drop(columns=["part"])),
                          batch_format="pandas"))
    return scored.groupby("dpart").map_groups(
        lambda g: topk_part(g.drop(columns=["dpart"])),
        batch_format="pandas")


# ---- exact phrase search ----

#: fixed phrase — adjacent-token match over the corpus vocabulary
PHRASE: tuple[str, str] = ("hash", "join")


def phrase_search(docs: ray.data.Dataset,
                  phrase: tuple[str, str] = PHRASE) -> ray.data.Dataset:
    """Exact consecutive-phrase match: (doc_id, n_occurrences,
    first_pos) for every document containing ``phrase[0] phrase[1]``
    as adjacent whitespace tokens (first_pos 0-based).

    Embarrassingly parallel — a document's tokens live wholly in its
    row, so the match is one vectorized pass per batch (flattened
    token/pos arrays, adjacent-row compare) with NO shuffle at all;
    the output is only matching (int, int, int) rows. This is the
    positional-postings phrase query collapsed to its map-only form;
    for multi-term phrases over a pre-built index, join ``postings``
    shards on (doc_id, pos+1) instead."""
    l_tok, r_tok = phrase

    def match(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [_WS_RE.findall(t.lower()) for t in df["text"].tolist()]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                              "n_occurrences": np.empty(0, np.int64),
                              "first_pos": np.empty(0, np.int64)})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in tok_lists if len(t)])
        doc = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), lens)
        pos = np.concatenate([np.arange(n, dtype=np.int64)
                              for n in lens if n])
        hit = np.zeros(len(flat), dtype=bool)
        if len(flat) > 1:
            hit[:-1] = ((flat[:-1] == l_tok) & (flat[1:] == r_tok)
                        & (doc[:-1] == doc[1:]))
        if not hit.any():
            return empty
        m = pd.DataFrame({"doc_id": doc[hit], "pos": pos[hit]}) \
            .groupby("doc_id", sort=False)["pos"] \
            .agg(n_occurrences="size", first_pos="min").reset_index()
        return m.astype({"doc_id": np.int64, "n_occurrences": np.int64,
                         "first_pos": np.int64})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        match, batch_format="pandas")


# ---- multi-term phrase search over the inverted index ----

PHRASE3: tuple[str, ...] = ("big", "order", "scan")
PHRASE_PARTS = 64


def phrase_search_indexed(docs: ray.data.Dataset,
                          phrase: tuple[str, ...] = PHRASE3
                          ) -> ray.data.Dataset:
    """N-term exact phrase match via POSITIONAL POSTINGS JOIN —
    the retrieval shape when the text itself is not available to the
    matcher (a pre-built sharded index): same output schema as
    ``phrase_search`` (doc_id, n_occurrences, first_pos).

    Scale shape: the postings builder prunes to the phrase's terms at
    the combiner (the read-side term filter an index shard lookup
    performs), so only (doc, term, pos) rows of matching terms ever
    move; ONE doc-hash co-partition co-locates a document's postings
    and the intersection is a chain of vectorized (doc, pos−offset)
    merges across ALL the partition's docs — positions of term i must
    sit exactly i after term 0."""
    terms = {t: i for i, t in enumerate(phrase)}

    def post(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [_WS_RE.findall(t.lower()) for t in df["text"].tolist()]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        empty = pd.DataFrame({"part": np.empty(0, np.int32),
                              "doc_id": np.empty(0, np.int64),
                              "term": np.empty(0, np.int8),
                              "pos": np.empty(0, np.int64)})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in tok_lists if len(t)])
        doc = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), lens)
        pos = np.concatenate([np.arange(n, dtype=np.int64)
                              for n in lens if n])
        keep = np.isin(flat, list(terms))
        if not keep.any():
            return empty
        term = np.fromiter((terms[t] for t in flat[keep]), dtype=np.int8,
                           count=int(keep.sum()))
        d = doc[keep]
        return pd.DataFrame({"part": (d % PHRASE_PARTS).astype(np.int32),
                             "doc_id": d, "term": term, "pos": pos[keep]})

    def intersect(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["term"] == 0][["doc_id", "pos"]]
        for i in range(1, len(phrase)):
            nxt = g[g["term"] == i][["doc_id", "pos"]].copy()
            nxt["pos"] = nxt["pos"] - i
            base = base.merge(nxt, on=["doc_id", "pos"], how="inner")
        if not len(base):
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "n_occurrences": np.empty(0, np.int64),
                                 "first_pos": np.empty(0, np.int64)})
        m = base.groupby("doc_id", sort=False)["pos"] \
            .agg(n_occurrences="size", first_pos="min").reset_index()
        return m.astype({"doc_id": np.int64, "n_occurrences": np.int64,
                         "first_pos": np.int64})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(post, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: intersect(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- postings delta-gap compression estimate (index storage) ----

PC_FP = 10 ** 6


def postings_compression(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(token, df, raw_bytes, coded_bytes, savings_fp): per-token
    inverted-index storage estimate under delta-gap varint coding —
    postings sorted by doc_id, each id stored as a varint of the gap to
    its predecessor (the universal index layout) vs. raw 8-byte ids.
    The planner readout: frequent tokens compress hardest (dense gaps),
    and Σ coded_bytes is the index's real footprint.

    Scale shape: the postings combiner is embarrassingly parallel (text
    never shuffles); ONE token-hash co-partition co-locates a token's
    postings, where the sort + gap + varint math is vectorized across
    the whole partition."""
    from ..urls import hash64_array

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        p = _postings_batch(df)[["token", "doc_id"]]
        p["part"] = (hash64_array(p["token"]) % TFIDF_PARTS) \
            .astype(np.int32)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        doc = g["doc_id"].to_numpy(dtype=np.int64)
        tok = g["token"].to_numpy(dtype=object)
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = tok[1:] != tok[:-1]
        gap = np.where(first, doc, doc - np.concatenate(([0], doc[:-1])))
        vb = (1 + (gap >= 1 << 7).astype(np.int64)
              + (gap >= 1 << 14) + (gap >= 1 << 21) + (gap >= 1 << 28))
        out = pd.DataFrame({"token": tok, "vb": vb}) \
            .groupby("token", sort=False)["vb"] \
            .agg(df="size", coded_bytes="sum").reset_index()
        raw = out["df"].to_numpy(dtype=np.int64) * 8
        coded = out["coded_bytes"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "token": out["token"].to_numpy(dtype=object),
            "df": out["df"].to_numpy(dtype=np.int64),
            "raw_bytes": raw, "coded_bytes": coded,
            "savings_fp": np.maximum(raw - coded, 0) * PC_FP // raw})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(slim, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- inverted-index shard plan (index-build balance planner) ----

N_INDEX_SHARDS = 16


def index_shard_plan(docs: ray.data.Dataset,
                     n_shards: int = N_INDEX_SHARDS) -> pd.DataFrame:
    """(shard, n_terms, n_postings): how an md5-hash term-sharded
    inverted index would balance across ``n_shards`` index servers —
    the capacity-planning readout an index build runs BEFORE the
    expensive posting construction (`postings` / `postings_compression`
    are the per-term views; this is the per-shard rollup a serving
    fleet is provisioned from).

    Scale shape: per-batch combiner emits distinct (term-hash, df)
    partial rows (docs are batch-unique, so per-batch df partials sum
    exactly); ONE token-hash co-partition dedups terms and folds df;
    each partition emits ≤ n_shards partial rows; driver folds
    ≤ n_shards × parts rows. Tokens never re-shuffle."""

    n_parts = 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(_WS_RE)
        rows = []
        for tl in toks:
            rows.append(pd.unique(np.asarray(tl, dtype=object)))
        if not rows:
            return pd.DataFrame({"h": np.empty(0, np.int64),
                                 "df": np.empty(0, np.int64),
                                 "part": np.empty(0, np.int32)})
        flat = np.concatenate(rows)
        c = pd.Series(flat).value_counts()
        h = _hash64_str(list(c.index)).view(np.int64)
        return pd.DataFrame({
            "h": h, "df": c.to_numpy(np.int64),
            "part": (h % n_parts).astype(np.int32)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", sort=False)["df"].sum()
        hv = s.index.to_numpy(np.int64).view(np.uint64)
        shard = (hv % np.uint64(n_shards)).astype(np.int64)
        out = pd.DataFrame({"shard": shard,
                            "df": s.to_numpy(np.int64)}).groupby(
            "shard", sort=False).agg(n_terms=("df", "size"),
                                     n_postings=("df", "sum")).reset_index()
        for c2 in ("shard", "n_terms", "n_postings"):
            out[c2] = out[c2].astype(np.int64)
        return out

    parts = (docs.select_columns(["text"])
             .map_batches(partial, batch_format="pandas")
             .groupby("part")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())                  # ≤ n_shards × n_parts rows
    out = parts.groupby("shard", sort=True).agg(
        n_terms=("n_terms", "sum"), n_postings=("n_postings", "sum")) \
        .reset_index()
    for c in ("shard", "n_terms", "n_postings"):
        out[c] = out[c].astype(np.int64)
    return out


# ---- proximity search (two terms within a token window) ----

PROX_TERMS: tuple[str, str] = ("hash", "scan")
PROX_WINDOW = 6


def proximity_search(docs: ray.data.Dataset,
                     terms: tuple[str, str] = PROX_TERMS,
                     window: int = PROX_WINDOW) -> ray.data.Dataset:
    """(doc_id, min_dist, n_within): documents where BOTH terms occur,
    with the minimum token distance between any occurrence pair and the
    number of pairs within ``window`` tokens — the proximity operator
    ranking engines run between exact ``phrase_search`` (distance 1,
    ordered) and bag-of-words BM25 (no positions). Unordered distance.

    Scale shape: map-only (zero shuffles) — positions come from the
    batch's token arrays, the pair-distance fold is numpy per doc
    (occurrence counts are tiny); only matching (doc_id, 2 ints) rows
    leave the task."""
    a_term, b_term = terms

    def match(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(_WS_RE)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        out_id, out_min, out_n = [], [], []
        for did, tl in zip(ids, toks):
            t = np.asarray(tl, dtype=object)
            pa = np.flatnonzero(t == a_term)
            pb = np.flatnonzero(t == b_term)
            if len(pa) == 0 or len(pb) == 0:
                continue
            d = np.abs(pa[:, None] - pb[None, :])
            out_id.append(did)
            out_min.append(int(d.min()))
            out_n.append(int((d <= window).sum()))
        return pd.DataFrame({
            "doc_id": np.array(out_id, dtype=np.int64),
            "min_dist": np.array(out_min, dtype=np.int64),
            "n_within": np.array(out_n, dtype=np.int64)})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(match, batch_format="pandas"))


# ---- snippet extraction around the first phrase hit ----

SNIPPET_CONTEXT = 3              # tokens of context each side


def search_snippets(docs: ray.data.Dataset,
                    phrase: tuple[str, str] = PHRASE,
                    context: int = SNIPPET_CONTEXT) -> ray.data.Dataset:
    """(doc_id, first_pos, snippet): for documents containing the exact
    phrase, a deterministic token-window snippet around the FIRST
    occurrence (``context`` tokens each side) — the result-page
    presentation step after ``phrase_search`` decides the hit list.
    first_pos is 0-based like phrase_search's.

    Scale shape: map-only (zero shuffles); only matching (doc_id, int,
    short string) rows leave the task — never full text."""
    a_term, b_term = phrase

    def snip(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(_WS_RE)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        out_id, out_pos, out_sn = [], [], []
        for did, tl in zip(ids, toks):
            t = np.asarray(tl, dtype=object)
            if len(t) < 2:
                continue
            hit = np.flatnonzero((t[:-1] == a_term) & (t[1:] == b_term))
            if not len(hit):
                continue
            p = int(hit[0])
            out_id.append(did)
            out_pos.append(p)
            out_sn.append(" ".join(
                t[max(p - context, 0):p + 2 + context]))
        return pd.DataFrame({
            "doc_id": np.array(out_id, dtype=np.int64),
            "first_pos": np.array(out_pos, dtype=np.int64),
            "snippet": np.array(out_sn, dtype=object)})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(snip, batch_format="pandas"))


# ---- prefix (wildcard) search ----

PREFIXES: tuple[str, ...] = ("sc", "win", "jo")


def prefix_search(docs: ray.data.Dataset,
                  prefixes: tuple[str, ...] = PREFIXES) -> ray.data.Dataset:
    """(prefix, doc_id, n_hits, n_distinct_terms) for every document
    containing ≥1 whitespace token starting with ``prefix`` — the
    `pre*` wildcard query shape (truncation search), the query class a
    front-coded term dictionary answers with one binary-search range
    scan. Here collapsed to its map-only form: a document's tokens
    live wholly in its row, so each batch flattens once and answers
    ALL prefixes vectorized (np.char comparisons on the flat token
    array); output is only matching slim rows, NO shuffle."""

    def match(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [_WS_RE.findall(t.lower()) for t in df["text"].tolist()]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        empty = pd.DataFrame({
            "prefix": np.empty(0, object),
            "doc_id": np.empty(0, np.int64),
            "n_hits": np.empty(0, np.int64),
            "n_distinct_terms": np.empty(0, np.int64)})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in tok_lists if len(t)])
        doc = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), lens)
        frames = []
        flat_s = flat.astype(str)
        for p in prefixes:
            hit = np.char.startswith(flat_s, p)
            if not hit.any():
                continue
            m = pd.DataFrame({"doc_id": doc[hit], "term": flat[hit]}) \
                .groupby("doc_id", sort=False)["term"] \
                .agg(n_hits="size", n_distinct_terms="nunique") \
                .reset_index()
            m.insert(0, "prefix", p)
            frames.append(m)
        if not frames:
            return empty
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"doc_id": np.int64, "n_hits": np.int64,
                           "n_distinct_terms": np.int64})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        match, batch_format="pandas")


# ---- shard rebalance plan: mod-hash vs rendezvous (HRW) hashing ----

REBALANCE_ADD = 4            # grow the index fleet N → N + 4
REBALANCE_FP = 10 ** 6
_U64_MOD = 1 << 64
_HRW_GOLD = 2654435769       # 0x9E3779B9


def _hrw_weights(h_u64: np.ndarray, shard: int) -> np.ndarray:
    """Affine rendezvous weight w(t, s) = (A_s·h + B_s) mod 2^64 with
    A_s = 2s+3 (odd, < 2^32) and B_s = golden·(s+1) mod 2^64 — the
    minhash affine-seed trick, so DuckDB mirrors it exactly in
    HUGEINT."""
    a = np.uint64(2 * shard + 3)
    b = np.uint64((_HRW_GOLD * (shard + 1)) % _U64_MOD)
    return h_u64 * a + b          # uint64 wraparound = mod 2^64


def shard_rebalance_plan(docs: ray.data.Dataset,
                         n_old: int = N_INDEX_SHARDS,
                         n_add: int = REBALANCE_ADD) -> pd.DataFrame:
    """One row (n_terms, moved_mod, moved_hrw, moved_mod_fp,
    moved_hrw_fp): when the index fleet grows from ``n_old`` to
    ``n_old + n_add`` shards, what fraction of DISTINCT terms must
    migrate under (a) mod-hash placement (h % N — nearly everything
    moves) vs (b) rendezvous/HRW hashing (argmax of per-shard weights —
    only terms a NEW shard wins move, ≈ n_add/(n_old+n_add)). The
    capacity-ops readout that justifies consistent placement before a
    fleet resize (reshard cost = bytes moved, not bytes stored).
    Ties in the argmax break to the smaller shard id (mirrored).

    Scale shape: the ``index_shard_plan`` distinct-term combiner → ONE
    token-hash co-partition dedups terms; each partition folds to a
    single (n, moved_mod, moved_hrw) counter row; a scalar Sum
    finishes. Terms never re-shuffle; the weight matrix is
    (n_old+n_add) vectorized affine passes per partition."""
    from ray.data.aggregate import Sum

    n_parts = 64
    n_new = n_old + n_add

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(_WS_RE)
        rows = [pd.unique(np.asarray(tl, dtype=object)) for tl in toks]
        if not rows:
            return pd.DataFrame({"h": np.empty(0, np.int64),
                                 "part": np.empty(0, np.int32)})
        flat = pd.unique(np.concatenate(rows))
        h = _hash64_str(list(flat)).view(np.int64)
        return pd.DataFrame({"h": h,
                             "part": (h % n_parts).astype(np.int32)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(g["h"].to_numpy(np.int64))
        hu = h.view(np.uint64)
        w = np.stack([_hrw_weights(hu, s) for s in range(n_new)])
        s_old = np.argmax(w[:n_old], axis=0)     # first max = min s
        s_new = np.argmax(w, axis=0)
        moved_hrw = int((s_old != s_new).sum())
        moved_mod = int(((hu % np.uint64(n_old))
                         != (hu % np.uint64(n_new))).sum())
        return pd.DataFrame({"n": [np.int64(len(h))],
                             "mm": [np.int64(moved_mod)],
                             "mh": [np.int64(moved_hrw)]})

    agg = (docs.select_columns(["text"])
           .map_batches(partial, batch_format="pandas",
                        batch_size=16384)
           .groupby("part").map_groups(fold, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("mm", alias_name="mm"),
                      Sum("mh", alias_name="mh")))
    n, mm, mh = int(agg["n"]), int(agg["mm"]), int(agg["mh"])
    return pd.DataFrame({
        "n_terms": np.array([n], dtype=np.int64),
        "moved_mod": np.array([mm], dtype=np.int64),
        "moved_hrw": np.array([mh], dtype=np.int64),
        "moved_mod_fp": np.array([REBALANCE_FP * mm // max(n, 1)],
                                 dtype=np.int64),
        "moved_hrw_fp": np.array([REBALANCE_FP * mh // max(n, 1)],
                                 dtype=np.int64)})
