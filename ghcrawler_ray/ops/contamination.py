"""Benchmark decontamination and corpus-wide duplicate n-gram statistics
over the ``documents`` table — the two n-gram-overlap curation passes a
training-data pipeline runs before training:

- ``decontaminate``: flag every corpus document that shares at least one
  k-token shingle with a (small) benchmark/eval set. The benchmark side
  is bounded by definition (an eval suite, not the corpus), so its
  distinct shingle hashes are collected ONCE and broadcast via
  ``ray.put`` — the classic small-side broadcast join; the 100 TB corpus
  side streams through one ``map_batches`` pass and never shuffles.
  Membership tests are a single vectorized ``np.searchsorted`` over the
  whole batch's concatenated shingle hashes (no per-doc set ops).
- ``duplicate_ngrams``: (gram_hash, n_docs, n_total) for every k-gram
  that appears in ≥ ``min_docs`` distinct documents — the C4-style
  "duplicated span" counting shape. Per-batch PARTIAL counts collapse
  each batch before one coarse ``groupby(gram_hash % 64)`` co-partition
  fold of (hash, int, int) rows; the raw text never shuffles.

All hashing is the md5-prefix primitive shared with the LSH family
(``ops.dedup._hash64_str``), so both ops are reproduced bit-for-bit by
DuckDB mirrors (``('0x'||substr(md5(g),1,16))::UBIGINT``) and get FULL
value-hash correctness checks.

Reference context: the reference's content-level dedup is the etag/304
layer (`providers/fetcher/githubFetcher.js:26-84`); these ops are the
corpus-curation generalization of that "have I seen this content"
primitive to sub-document granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .dedup import _WS_RE, _hash64_str

DECON_K = 5              # 5-token shingles (decontamination standard: long
                         # enough that overlap implies shared provenance)
BENCH_MOD = 25           # doc_id % BENCH_MOD == 0 → the deterministic
                         # stand-in "benchmark/eval set" (≈4% of docs)
DUP_NGRAM_K = 5
DUP_MIN_DOCS = 2


def _gram_hashes(text: str, k: int, distinct: bool) -> np.ndarray:
    """uint64 md5-prefix hashes of the k-token shingles of ``text``
    (lowercased ws-tokens, same tokenization as the LSH family)."""
    toks = _WS_RE.findall(text.lower())
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if distinct:
        grams = sorted(set(grams))
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return _hash64_str(grams)


def _batch_grams(texts, k: int, distinct: bool) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated gram hashes for a batch + per-doc lengths."""
    per_doc = [_gram_hashes(t, k, distinct) for t in texts]
    lens = np.fromiter((len(h) for h in per_doc), dtype=np.int64,
                       count=len(per_doc))
    cat = np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
    return cat, lens


def benchmark_shingles(docs: ray.data.Dataset, k: int = DECON_K,
                       bench_mod: int = BENCH_MOD) -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark subset. The ONLY
    driver-side collect in this module, bounded by the benchmark size
    (an eval suite, not the corpus)."""

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[(df["doc_id"].to_numpy(dtype=np.int64) % bench_mod) == 0]
        cat, _ = _batch_grams(sub["text"].tolist(), k, distinct=True)
        return pd.DataFrame({"g": np.unique(cat)})

    t = (docs.select_columns(["doc_id", "text"])
         .map_batches(grams, batch_format="pandas").to_pandas())
    return np.unique(t["g"].to_numpy(dtype=np.uint64))


def decontaminate(docs: ray.data.Dataset, k: int = DECON_K,
                  bench_mod: int = BENCH_MOD) -> ray.data.Dataset:
    """(doc_id, n_hits, contaminated) for every NON-benchmark document:
    n_hits = how many of its distinct k-token shingles appear anywhere
    in the benchmark set, contaminated = n_hits > 0."""
    bench_ref = ray.put(benchmark_shingles(docs, k, bench_mod))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_ref)
        sub = df[(df["doc_id"].to_numpy(dtype=np.int64) % bench_mod) != 0]
        cat, lens = _batch_grams(sub["text"].tolist(), k, distinct=True)
        # one vectorized membership probe for the whole batch
        if len(bench):
            idx = np.searchsorted(bench, cat)
            idx[idx == len(bench)] = 0
            hit = (bench[idx] == cat).astype(np.int64)
        else:
            hit = np.zeros(len(cat), dtype=np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        csum = np.concatenate([[0], np.cumsum(hit)])
        n_hits = csum[ends] - csum[starts]
        return pd.DataFrame({
            "doc_id": sub["doc_id"].to_numpy(dtype=np.int64),
            "n_hits": n_hits.astype(np.int64),
            "contaminated": n_hits > 0})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(flag, batch_format="pandas"))


def duplicate_ngrams(docs: ray.data.Dataset, k: int = DUP_NGRAM_K,
                     min_docs: int = DUP_MIN_DOCS) -> ray.data.Dataset:
    """(gram_hash, n_docs, n_total) for every k-gram occurring in at
    least ``min_docs`` distinct documents. n_total counts ALL window
    occurrences (repeats within a doc included); n_docs counts distinct
    documents."""

    n_parts = 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-doc: (gram → occurrences); batch-partial: fold duplicate
        # grams across the batch's docs before the shuffle (combiner).
        # gram hashes ride as SIGNED int64 (bit-reinterpreted) — the
        # same signed-view convention as the winnowing fingerprints,
        # mirrored in SQL by the u64→i64 CASE
        cat, lens = _batch_grams(df["text"].tolist(), k, distinct=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        g = pd.DataFrame({"gram_hash": cat.view(np.int64), "doc": doc_idx})
        per = g.groupby(["gram_hash", "doc"], sort=False) \
            .size().reset_index(name="tot")
        out = per.groupby("gram_hash", sort=False).agg(
            n_docs=("tot", "size"), n_total=("tot", "sum")).reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["n_total"] = out["n_total"].astype(np.int64)
        # coarse int co-partition key: a global groupby over millions of
        # distinct gram hashes sort-shuffles the full key space (39 s at
        # sf0.1); folding inside 64 hash partitions runs in seconds
        out["part"] = (out["gram_hash"].to_numpy(dtype=np.int64)
                       % n_parts).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("gram_hash", sort=False).agg(
            n_docs=("n_docs", "sum"), n_total=("n_total", "sum")) \
            .reset_index()
        keep = s[s["n_docs"] >= min_docs].copy()
        keep["n_docs"] = keep["n_docs"].astype(np.int64)
        keep["n_total"] = keep["n_total"].astype(np.int64)
        return keep[["gram_hash", "n_docs", "n_total"]]

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- duplicated-span REMOVAL (the curation counterpart of the stats) ----

# Broadcast ceiling for the duplicated-gram hash table: 8M int64 hashes
# = 64 MB in the object store — comfortably a "small side" on a worker.
# Beyond it the distributed co-partition join path runs instead.
SPAN_BROADCAST_MAX = 8_000_000
SPAN_PARTS = 64


def _covered_mask(n_toks: int, hit_pos: np.ndarray, k: int) -> np.ndarray:
    """Boolean mask of tokens covered by >=1 duplicated k-gram starting
    at any position in ``hit_pos`` — interval stabbing via a diff array
    (no per-position loop)."""
    delta = np.zeros(n_toks + 1, dtype=np.int64)
    np.add.at(delta, hit_pos, 1)
    np.add.at(delta, np.minimum(hit_pos + k, n_toks), -1)
    return np.cumsum(delta[:-1]) > 0


def _clean_docs(df: pd.DataFrame, dup_sorted: np.ndarray,
                k: int) -> pd.DataFrame:
    """Rebuild each doc with every token covered by a duplicated gram
    removed. ``dup_sorted`` = sorted int64 duplicated-gram hashes."""
    ids, texts = df["doc_id"].to_numpy(dtype=np.int64), df["text"].tolist()
    clean, n_tok, n_rm = [], [], []
    for text in texts:
        toks = _WS_RE.findall(text.lower())
        h = _gram_hashes(text, k, distinct=False).view(np.int64)
        if len(h) and len(dup_sorted):
            idx = np.searchsorted(dup_sorted, h)
            idx[idx == len(dup_sorted)] = 0
            hit_pos = np.flatnonzero(dup_sorted[idx] == h)
        else:
            hit_pos = np.empty(0, dtype=np.int64)
        covered = _covered_mask(len(toks), hit_pos, k)
        kept = np.array(toks, dtype=object)[~covered] if len(toks) else []
        clean.append(" ".join(kept))
        n_tok.append(len(toks))
        n_rm.append(int(covered.sum()))
    return pd.DataFrame({
        "doc_id": ids,
        "clean_text": np.array(clean, dtype=object),
        "n_tokens": np.array(n_tok, dtype=np.int64),
        "n_removed": np.array(n_rm, dtype=np.int64)})


def dedup_spans(docs: ray.data.Dataset, k: int = DUP_NGRAM_K,
                min_docs: int = DUP_MIN_DOCS) -> ray.data.Dataset:
    """Duplicated-span removal (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", at k-gram granularity): every token
    covered by a k-gram that occurs in >= ``min_docs`` distinct docs is
    removed; output (doc_id, clean_text, n_tokens, n_removed) for EVERY
    document (tokens lowercased ws-tokens, the family's tokenization).

    Scale shape: the duplicated-gram table from ``duplicate_ngrams`` is
    output-sized. When it fits ``SPAN_BROADCAST_MAX`` it is broadcast
    once via ``ray.put`` and the corpus streams through ONE map_batches
    pass (searchsorted probe + diff-array interval stabbing per doc).
    Beyond that, the dormant distributed path (pinned equal by
    tests/test_scale_paths.py) never ships the table: doc grams explode
    to slim (part, gram_hash, doc_id, pos) rows and hash-join the dup
    table inside each of ``SPAN_PARTS`` co-partitions, then the hit
    positions co-partition with the docs on doc_id % SPAN_PARTS for the
    rebuild — raw text crosses the wire exactly once.
    """
    dup = (duplicate_ngrams(docs, k, min_docs)
           .select_columns(["gram_hash"]).materialize())
    slim = docs.select_columns(["doc_id", "text"])

    if dup.count() <= SPAN_BROADCAST_MAX:
        arr = np.sort(dup.to_pandas()["gram_hash"].to_numpy(dtype=np.int64))
        ref = ray.put(arr)

        def clean(df: pd.DataFrame) -> pd.DataFrame:
            return _clean_docs(df, ray.get(ref), k)

        return slim.map_batches(clean, batch_format="pandas")

    # -- distributed path: co-partition join on gram_hash % SPAN_PARTS --
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        cat, lens = _batch_grams(df["text"].tolist(), k, distinct=False)
        g = cat.view(np.int64)
        pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens]) \
            if len(lens) else np.empty(0, dtype=np.int64)
        return pd.DataFrame({
            "part": (g % SPAN_PARTS).astype(np.int32),
            "gram_hash": g,
            "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64), lens),
            "pos": pos})

    def tag_dup(df: pd.DataFrame) -> pd.DataFrame:
        g = df["gram_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "part": (g % SPAN_PARTS).astype(np.int32),
            "gram_hash": g,
            "doc_id": np.full(len(g), -1, dtype=np.int64),
            "pos": np.full(len(g), -1, dtype=np.int64)})

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        side_dup = g["doc_id"].to_numpy(dtype=np.int64) < 0
        table = np.sort(np.unique(g.loc[side_dup, "gram_hash"]
                                  .to_numpy(dtype=np.int64)))
        probe = g.loc[~side_dup]
        h = probe["gram_hash"].to_numpy(dtype=np.int64)
        if len(h) and len(table):
            idx = np.searchsorted(table, h)
            idx[idx == len(table)] = 0
            hit = table[idx] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        out = probe.loc[hit, ["doc_id", "pos"]].copy()
        out["upart"] = (out["doc_id"].to_numpy(dtype=np.int64)
                        % SPAN_PARTS).astype(np.int32)
        return out

    hits = (slim.map_batches(explode, batch_format="pandas").union(
                dup.map_batches(tag_dup, batch_format="pandas"))
            .materialize()
            .groupby("part").map_groups(join_part, batch_format="pandas"))

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "upart": (ids % SPAN_PARTS).astype(np.int32),
            "doc_id": ids,
            "pos": np.full(len(ids), -1, dtype=np.int64),
            "text": df["text"].astype(str).to_numpy()})

    def tag_hits(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "upart": df["upart"].to_numpy(dtype=np.int32),
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "pos": df["pos"].to_numpy(dtype=np.int64),
            "text": np.full(len(df), "", dtype=object)})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["pos"].to_numpy(dtype=np.int64) < 0
        docs_g = g.loc[is_doc, ["doc_id", "text"]]
        hit_pos = {did: grp["pos"].to_numpy(dtype=np.int64)
                   for did, grp in g.loc[~is_doc].groupby("doc_id")}
        rows = []
        for did, text in zip(docs_g["doc_id"].to_numpy(dtype=np.int64),
                             docs_g["text"].tolist()):
            toks = _WS_RE.findall(text.lower())
            covered = _covered_mask(
                len(toks), hit_pos.get(did, np.empty(0, np.int64)), k)
            kept = np.array(toks, dtype=object)[~covered] if len(toks) else []
            rows.append((did, " ".join(kept), len(toks), int(covered.sum())))
        return pd.DataFrame(rows, columns=["doc_id", "clean_text",
                                           "n_tokens", "n_removed"]) \
            .astype({"doc_id": np.int64, "n_tokens": np.int64,
                     "n_removed": np.int64})

    return (slim.map_batches(tag_docs, batch_format="pandas")
            .union(hits.map_batches(tag_hits, batch_format="pandas"))
            .materialize()
            .groupby("upart").map_groups(rebuild, batch_format="pandas"))


# ---- duplicated-LINE removal (RefinedWeb / CCNet line-level dedup) ----

# Line-level dedup is the third granularity of the family: document
# (exact_dedup), span (dedup_spans), LINE — the boilerplate cut
# (RefinedWeb §G.2 "line-wise corrections"; CCNet's paragraph-hash
# dedup): a line whose stripped form occurs >= LINE_MIN_COUNT times
# ANYWHERE in the corpus (nav bars, cookie banners, footers) is removed
# from every document.

LINE_MIN_COUNT = 3       # total occurrences across the corpus
LINE_STRIP = " \t\r"     # strip set for the line key (mirrored in SQL)
LINE_PARTS = 64
# Broadcast ceiling for the duplicated-line hash table (8M int64 = 64 MB
# object); beyond it the distributed co-partition join path runs instead.
LINE_BROADCAST_MAX = 8_000_000


def _line_frame(df: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
    """Explode a batch's docs into (doc_id, pos, line, line_hash) rows
    plus the per-doc line counts. The key is the LINE_STRIP-stripped
    line; empty keys hash to 0 (blank lines are document structure —
    never counted, never removed)."""
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    split = [str(t).split("\n") for t in df["text"].tolist()]
    lens = np.fromiter((len(s) for s in split), dtype=np.int64,
                       count=len(split))
    lines = [l for s in split for l in s]
    keys = [l.strip(LINE_STRIP) for l in lines]
    h = np.zeros(len(keys), dtype=np.int64)
    nz = [i for i, k0 in enumerate(keys) if k0 != ""]
    if nz:
        h[nz] = _hash64_str([keys[i] for i in nz]).view(np.int64)
    pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens]) \
        if len(lens) else np.empty(0, dtype=np.int64)
    lf = pd.DataFrame({"doc_id": np.repeat(ids, lens), "pos": pos,
                       "line": np.array(lines, dtype=object),
                       "line_hash": h})
    return lf, lens


def duplicate_lines(docs: ray.data.Dataset,
                    min_count: int = LINE_MIN_COUNT) -> ray.data.Dataset:
    """(line_hash, n_total) for every non-empty stripped line occurring
    at least ``min_count`` times corpus-wide. Per-batch combiner →
    ONE coarse int co-partition fold; line text never shuffles."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lf, _ = _line_frame(df)
        g = (lf.loc[lf["line_hash"] != 0]
             .groupby("line_hash", sort=False).size()
             .rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        g["part"] = (g["line_hash"].to_numpy(dtype=np.int64)
                     % LINE_PARTS).astype(np.int32)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("line_hash", sort=False)["cnt"].sum()
             .rename("n_total").reset_index())
        keep = s[s["n_total"] >= min_count].copy()
        keep["n_total"] = keep["n_total"].astype(np.int64)
        return keep[["line_hash", "n_total"]]

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


def _clean_lines_frame(df: pd.DataFrame,
                       dup_sorted: np.ndarray) -> pd.DataFrame:
    """Rebuild each doc with its duplicated lines removed; one
    vectorized membership probe for the whole batch, then per-doc
    slicing for the string joins only."""
    lf, lens = _line_frame(df)
    h = lf["line_hash"].to_numpy(dtype=np.int64)
    if len(h) and len(dup_sorted):
        idx = np.searchsorted(dup_sorted, h)
        idx[idx == len(dup_sorted)] = 0
        rm = (dup_sorted[idx] == h) & (h != 0)
    else:
        rm = np.zeros(len(h), dtype=bool)
    ne = h != 0
    ends = np.cumsum(lens)
    starts = ends - lens
    csum_ne = np.concatenate([[0], np.cumsum(ne)])
    csum_rm = np.concatenate([[0], np.cumsum(rm)])
    lines = lf["line"].tolist()
    clean = ["\n".join(lines[i] for i in range(s, e) if not rm[i])
             for s, e in zip(starts, ends)]
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
        "clean_text": np.array(clean, dtype=object),
        "n_lines": (csum_ne[ends] - csum_ne[starts]).astype(np.int64),
        "n_removed": (csum_rm[ends] - csum_rm[starts]).astype(np.int64)})


def dedup_lines(docs: ray.data.Dataset,
                min_count: int = LINE_MIN_COUNT) -> ray.data.Dataset:
    """Line-level dedup: (doc_id, clean_text, n_lines, n_removed) for
    EVERY document, where every line whose stripped form occurs >=
    ``min_count`` times anywhere in the corpus is removed (blank lines
    kept — they are structure, not content; n_lines counts non-blank
    lines).

    Scale shape mirrors ``dedup_spans``: the duplicated-line table is
    output-sized (boilerplate, not the corpus) — broadcast once via
    ``ray.put`` under LINE_BROADCAST_MAX, with a dormant distributed
    co-partition path above it (pinned equal by test_scale_paths):
    docs explode to slim (line_hash, doc_id, pos) rows that hash-join
    the dup table inside LINE_PARTS co-partitions, and the (doc_id,
    pos) hits co-partition with the docs for the rebuild — line text
    crosses the wire exactly once."""
    dup = (duplicate_lines(docs, min_count)
           .select_columns(["line_hash"]).materialize())
    slim = docs.select_columns(["doc_id", "text"])

    if dup.count() <= LINE_BROADCAST_MAX:
        arr = np.sort(dup.to_pandas()["line_hash"].to_numpy(dtype=np.int64))
        ref = ray.put(arr)

        def clean(df: pd.DataFrame) -> pd.DataFrame:
            return _clean_lines_frame(df, ray.get(ref))

        return slim.map_batches(clean, batch_format="pandas")

    # -- distributed path: join on line_hash % LINE_PARTS, rebuild on
    #    doc_id % LINE_PARTS; only (hash, doc, pos) ints shuffle twice --
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        lf, _ = _line_frame(df)
        lf = lf[lf["line_hash"] != 0]
        h = lf["line_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "part": (h % LINE_PARTS).astype(np.int32),
            "line_hash": h,
            "doc_id": lf["doc_id"].to_numpy(dtype=np.int64),
            "pos": lf["pos"].to_numpy(dtype=np.int64)})

    def tag_dup(df: pd.DataFrame) -> pd.DataFrame:
        h = df["line_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "part": (h % LINE_PARTS).astype(np.int32),
            "line_hash": h,
            "doc_id": np.full(len(h), -1, dtype=np.int64),
            "pos": np.full(len(h), -1, dtype=np.int64)})

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        side_dup = g["doc_id"].to_numpy(dtype=np.int64) < 0
        table = np.sort(np.unique(
            g.loc[side_dup, "line_hash"].to_numpy(dtype=np.int64)))
        probe = g.loc[~side_dup]
        h = probe["line_hash"].to_numpy(dtype=np.int64)
        if len(h) and len(table):
            idx = np.searchsorted(table, h)
            idx[idx == len(table)] = 0
            hit = table[idx] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        out = probe.loc[hit, ["doc_id", "pos"]].copy()
        out["upart"] = (out["doc_id"].to_numpy(dtype=np.int64)
                        % LINE_PARTS).astype(np.int32)
        return out

    hits = (slim.map_batches(explode, batch_format="pandas").union(
                dup.map_batches(tag_dup, batch_format="pandas"))
            .materialize()
            .groupby("part").map_groups(join_part, batch_format="pandas"))

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "upart": (ids % LINE_PARTS).astype(np.int32),
            "doc_id": ids,
            "pos": np.full(len(ids), -1, dtype=np.int64),
            "text": df["text"].astype(str).to_numpy()})

    def tag_hits(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "upart": df["upart"].to_numpy(dtype=np.int32),
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "pos": df["pos"].to_numpy(dtype=np.int64),
            "text": np.full(len(df), "", dtype=object)})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["pos"].to_numpy(dtype=np.int64) < 0
        docs_g = g.loc[is_doc, ["doc_id", "text"]]
        hit_pos = {did: set(grp["pos"].tolist())
                   for did, grp in g.loc[~is_doc].groupby("doc_id")}
        rows = []
        for did, text in zip(docs_g["doc_id"].to_numpy(dtype=np.int64),
                             docs_g["text"].tolist()):
            split = text.split("\n")
            rmset = hit_pos.get(did, ())
            kept = [l for i, l in enumerate(split) if i not in rmset]
            n_lines = sum(1 for l in split if l.strip(LINE_STRIP) != "")
            rows.append((did, "\n".join(kept), n_lines, len(rmset)))
        return pd.DataFrame(rows, columns=["doc_id", "clean_text",
                                           "n_lines", "n_removed"]) \
            .astype({"doc_id": np.int64, "n_lines": np.int64,
                     "n_removed": np.int64})

    return (slim.map_batches(tag_docs, batch_format="pandas")
            .union(hits.map_batches(tag_hits, batch_format="pandas"))
            .materialize()
            .groupby("upart").map_groups(rebuild, batch_format="pandas"))


# ---- corpus-vs-corpus n-gram overlap (memorization-risk scorecard) ----

OVERLAP_PARTS = 64
OVERLAP_FP = 10 ** 6


def corpus_ngram_overlap(old: ray.data.Dataset, new: ray.data.Dataset,
                         k: int = DUP_NGRAM_K) -> pd.DataFrame:
    """One-row scorecard (n_new_grams, n_overlap, overlap_fp): what
    fraction of the NEW corpus's distinct k-gram vocabulary already
    appears anywhere in the OLD corpus — the corpus-level memorization
    / contamination readout (train-vs-eval overlap, recrawl-vs-v1
    novelty) that ``decontaminate`` applies per-document and this op
    aggregates per-corpus. overlap_fp = OVERLAP_FP·n_overlap //
    n_new_grams, exact integer.

    Scale shape: each side scans its text ONCE, folding to per-batch
    DISTINCT gram-hash rows tagged by side (combiner); ONE gram-hash
    co-partition (``% OVERLAP_PARTS`` coarse int key, the
    duplicate_ngrams shuffle shape) dedups each side within the
    partition and counts (n_new, n_both) locally; ≤ OVERLAP_PARTS
    partial rows fold to the single output row on the driver. Neither
    corpus is broadcast or materialized."""

    def side(tag: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            cat, _ = _batch_grams(df["text"].tolist(), k, distinct=True)
            g = np.unique(cat).view(np.int64)
            return pd.DataFrame({
                "gram_hash": g,
                "side": np.full(len(g), tag, dtype=np.int8),
                "part": (g % OVERLAP_PARTS).astype(np.int32)})
        return f

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        h = g["gram_hash"].to_numpy(np.int64)
        s = g["side"].to_numpy(np.int8)
        new_h = np.unique(h[s == 1])
        old_h = np.unique(h[s == 0])
        both = np.intersect1d(new_h, old_h, assume_unique=True)
        return pd.DataFrame({"n_new": [np.int64(len(new_h))],
                             "n_both": [np.int64(len(both))]})

    parts = (old.select_columns(["text"]).map_batches(
                 side(0), batch_format="pandas")
             .union(new.select_columns(["text"]).map_batches(
                 side(1), batch_format="pandas"))
             .groupby("part")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())                        # ≤ OVERLAP_PARTS rows
    n_new = int(parts["n_new"].sum())
    n_both = int(parts["n_both"].sum())
    return pd.DataFrame({
        "n_new_grams": np.array([n_new], dtype=np.int64),
        "n_overlap": np.array([n_both], dtype=np.int64),
        "overlap_fp": np.array([OVERLAP_FP * n_both // max(n_new, 1)],
                               dtype=np.int64)})


# ---- contamination rate by source ----

CONTAM_FP = 10 ** 6


def contamination_by_source(docs: ray.data.Dataset) -> pd.DataFrame:
    """(source, n_docs, n_contaminated, rate_fp): ``decontaminate``'s
    per-document verdicts rolled up by corpus source — the "which feed
    is leaking benchmark text" triage readout that decides whether to
    drop a source or just its flagged documents. rate_fp =
    CONTAM_FP·n_contaminated // n_docs, exact.

    Scale shape: the decontaminate verdicts (slim rows) and a
    (doc_id, source) projection co-partition on ONE doc-hash key; the
    per-partition join is a vectorized merge and only ≤ #sources × 2
    count partials leave each partition."""
    flags = decontaminate(docs)
    n_parts = 64

    def tag_flags(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": d, "part": (d % n_parts).astype(np.int32),
            "side": np.ones(len(d), dtype=np.int8),
            "source": np.full(len(d), "", dtype=object),
            "c": df["contaminated"].astype(bool).astype(np.int64)})

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": d, "part": (d % n_parts).astype(np.int32),
            "side": np.zeros(len(d), dtype=np.int8),
            "source": df["source"].astype(str),
            "c": np.zeros(len(d), dtype=np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        doc = g[g["side"] == 0][["doc_id", "source"]]
        fl = g[g["side"] == 1][["doc_id", "c"]]
        m = doc.merge(fl, on="doc_id", how="inner")
        out = m.groupby("source", sort=False).agg(
            n=("doc_id", "size"), nc=("c", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["nc"] = out["nc"].astype(np.int64)
        return out[["source", "n", "nc"]]

    parts = (docs.select_columns(["doc_id", "source"])
             .map_batches(tag_docs, batch_format="pandas")
             .union(flags.map_batches(tag_flags, batch_format="pandas"))
             .groupby("part")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())               # ≤ #sources × #parts rows
    out = parts.groupby("source", sort=True).agg(
        n_docs=("n", "sum"), n_contaminated=("nc", "sum")).reset_index()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_contaminated"] = out["n_contaminated"].astype(np.int64)
    out["rate_fp"] = (np.int64(CONTAM_FP)
                      * out["n_contaminated"].to_numpy(np.int64)
                      // np.maximum(out["n_docs"].to_numpy(np.int64), 1))
    out["source"] = out["source"].astype(object)
    return out


# ---- per-source boilerplate detection (CCNet/RefinedWeb nav-footer
# shape): a line is boilerplate WITHIN a source when it appears in at
# least frac_num/frac_den of that source's documents — unlike
# duplicate_lines' corpus-wide occurrence count, the unit here is
# distinct-document frequency relative to the source's size, which is
# what separates sitewide chrome from popular quotations. ----

BOILER_FRAC_NUM = 1
BOILER_FRAC_DEN = 2


def boilerplate_lines(docs: ray.data.Dataset,
                      frac_num: int = BOILER_FRAC_NUM,
                      frac_den: int = BOILER_FRAC_DEN) -> ray.data.Dataset:
    """(source, line_hash, doc_freq, n_docs) for every stripped line
    whose distinct-document frequency within its source reaches
    ``frac_num/frac_den`` of the source's document count.

    Scale shape: per-source doc totals are a tiny column-pruned
    aggregate (≤ #sources rows) broadcast via ``ray.put``; the line
    pass dedups (doc, line) per batch — each doc lives in exactly one
    batch, so the per-batch dedup IS the global (doc, line) dedup —
    and folds to (source, line_hash, count) partials under ONE coarse
    line-hash co-partition where the broadcast totals gate
    ``doc_freq·den ≥ n_docs·num`` in pure integers. Line text never
    shuffles."""
    totals = (docs.select_columns(["doc_id", "source"])
              .groupby("source").count().to_pandas())
    cnt_col = [c for c in totals.columns if c != "source"][0]
    src_sorted = np.sort(totals["source"].to_numpy(dtype=object))
    order = np.argsort(totals["source"].to_numpy(dtype=object),
                       kind="stable")
    n_docs_sorted = totals[cnt_col].to_numpy(np.int64)[order]
    ref = ray.put((src_sorted, n_docs_sorted))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lf, lens = _line_frame(df)
        src = np.repeat(df["source"].to_numpy(dtype=object), lens)
        lf = lf.assign(source=src)
        lf = lf[lf["line_hash"] != 0]
        u = lf[["doc_id", "line_hash", "source"]].drop_duplicates(
            ["doc_id", "line_hash"])
        g = (u.groupby(["source", "line_hash"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        g["part"] = (g["line_hash"].to_numpy(np.int64)
                     % LINE_PARTS).astype(np.int32)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        src_s, nd_s = ray.get(ref)
        s = (g.groupby(["source", "line_hash"], sort=False)["cnt"].sum()
             .rename("doc_freq").reset_index())
        pos = np.searchsorted(src_s, s["source"].to_numpy(dtype=object))
        nd = nd_s[pos]
        keep = (s["doc_freq"].to_numpy(np.int64) * frac_den
                >= nd * frac_num)
        out = s[keep].copy()
        out["doc_freq"] = out["doc_freq"].astype(np.int64)
        out["n_docs"] = nd[keep]
        return out[["source", "line_hash", "doc_freq", "n_docs"]]

    return (docs.select_columns(["doc_id", "source", "text"])
            .map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- per-document n-gram novelty (corpus redundancy curve) ----

NOVELTY_FP = 10 ** 6


def ngram_novelty(docs: ray.data.Dataset,
                  k: int = DUP_NGRAM_K) -> ray.data.Dataset:
    """(doc_id, n_shingles, n_novel, novelty_fp): among each document's
    DISTINCT k-token shingles, how many occur in NO document with a
    smaller doc_id (global first occurrence) — the marginal-information
    curve of a growing corpus. Averaged over ingestion order this is the
    diminishing-returns readout ("how much new text does the next crawl
    snapshot actually add?") that drives stop/continue decisions for a
    collection run; per-doc it flags boilerplate-heavy documents
    (novelty → 0) before any pairwise dedup runs.

    novelty_fp = FP·n_novel // n_shingles (docs with < k tokens emit no
    row — mirrored). Shingle identity = the module's md5-prefix u64 hash
    (same tokenization as the LSH family; the SQL oracle recomputes the
    identical hash, so the comparison is exact, not probabilistic).

    Scale shape: per-batch distinct (doc, gram) projection — text never
    shuffles — ONE gram-hash co-partition makes first-owner-per-gram
    global and folds to per-doc partials; a doc-keyed Sum finishes
    (output is doc-cardinality)."""
    n_parts = 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cat, lens = _batch_grams(df["text"].tolist(), k, distinct=True)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        out = pd.DataFrame({"gram_hash": cat.view(np.int64),
                            "doc_id": doc})
        out["part"] = (out["gram_hash"].to_numpy(np.int64)
                       % n_parts).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("gram_hash", sort=False)["doc_id"] \
            .transform("min")
        agg = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "novel": (g["doc_id"].to_numpy(np.int64)
                      == first.to_numpy(np.int64)).astype(np.int64)}) \
            .groupby("doc_id", as_index=False) \
            .agg(n_shingles=("novel", "size"), n_novel=("novel", "sum"))
        agg = agg.astype({"n_shingles": np.int64, "n_novel": np.int64})
        # coarse doc co-partition key for the merge fold (a second
        # int-keyed exchange beats a full-cardinality doc_id Aggregate)
        agg["dpart"] = (agg["doc_id"].to_numpy(np.int64)
                        % n_parts).astype(np.int32)
        return agg

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", as_index=False) \
            .agg(n_shingles=("n_shingles", "sum"),
                 n_novel=("n_novel", "sum"))
        n = s["n_shingles"].to_numpy(np.int64)
        v = s["n_novel"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": s["doc_id"].to_numpy(np.int64),
            "n_shingles": n, "n_novel": v,
            "novelty_fp": np.int64(NOVELTY_FP) * v // n})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas")
            .groupby("dpart")
            .map_groups(lambda g: finish(g.drop(columns=["dpart"])),
                        batch_format="pandas"))


# ---- source x source shared-shingle overlap matrix (provenance) ----

SRC_OVERLAP_DF_CAP = 16      # ignore grams shared by > CAP sources
                             # (stop-phrase hubs would emit O(CAP²) pairs)


def source_overlap_matrix(docs: ray.data.Dataset,
                          k: int = DUP_NGRAM_K) -> ray.data.Dataset:
    """(source_a, source_b, n_shared_grams): for every ordered source
    pair (a < b), how many DISTINCT k-token shingles appear in both —
    the who-copies-whom provenance matrix (syndication rings, mirror
    feeds, cross-source template reuse) that decides which sources
    dedup against each other before mixing. Grams shared by more than
    ``SRC_OVERLAP_DF_CAP`` sources are stop-phrases and are excluded
    (mirrored in SQL), which also bounds the per-gram pair fan-out.

    Scale shape: per-batch distinct (gram-hash, source) projection —
    text never shuffles; ONE gram-hash co-partition makes the
    (gram, source) set global, emits each qualifying gram's ≤ CAP²/2
    source pairs ONCE, and pre-combines pair counts; a final int
    pair-hash co-partition completes the sums (no multi-string-key Ray
    groupby). Driver never holds gram state."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        cat, lens = _batch_grams(df["text"].astype(str).tolist(), k, True)
        src = np.repeat(df["source"].to_numpy(dtype=object), lens)
        out = pd.DataFrame({"h": cat.view(np.int64), "source": src}) \
            .drop_duplicates()
        out["gpart"] = (out["h"].to_numpy(np.int64)
                        % OVERLAP_PARTS).astype(np.int32)
        return out

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["h", "source"]) \
            .sort_values(["h", "source"], kind="stable")
        h = g["h"].to_numpy(np.int64)
        src = g["source"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        ends = np.r_[starts[1:], len(h)]
        rows_a, rows_b = [], []
        for lo, hi in zip(starts, ends):
            d = hi - lo
            if 2 <= d <= SRC_OVERLAP_DF_CAP:
                s = src[lo:hi]
                ia, ib = np.triu_indices(d, 1)
                rows_a.append(s[ia])
                rows_b.append(s[ib])
        if not rows_a:
            return pd.DataFrame({
                "source_a": pd.Series([], dtype=object),
                "source_b": pd.Series([], dtype=object),
                "n_shared_grams": pd.Series([], dtype=np.int64),
                "ppart": pd.Series([], dtype=np.int32)})
        pa_ = np.concatenate(rows_a)
        pb_ = np.concatenate(rows_b)
        agg = pd.DataFrame({"source_a": pa_, "source_b": pb_,
                            "n_shared_grams": np.ones(len(pa_),
                                                      dtype=np.int64)}) \
            .groupby(["source_a", "source_b"], as_index=False,
                     sort=False).sum()
        agg["ppart"] = ((_hash64_str(list(agg["source_a"].astype(str)))
                         + _hash64_str(list(agg["source_b"].astype(str))))
                        .view(np.int64) % OVERLAP_PARTS).astype(np.int32)
        return agg

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["source_a", "source_b"], as_index=False,
                        sort=False)["n_shared_grams"].sum()
        agg["n_shared_grams"] = agg["n_shared_grams"].astype(np.int64)
        return agg

    return (docs.select_columns(["source", "text"])
            .map_batches(slim, batch_format="pandas", batch_size=4096)
            .groupby("gpart").map_groups(
                lambda g: per_gram(g.drop(columns=["gpart"])),
                batch_format="pandas")
            .groupby("ppart").map_groups(
                lambda g: final(g.drop(columns=["ppart"])),
                batch_format="pandas"))
