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
- exact dedup + keep-list resolution happen in ONE int-keyed co-partition
  (`hash64(norm_md5) % CURATE_PARTS`): every row of a duplicate class
  lands in the same coarse partition, so min-doc_id, class size AND the
  keep filter are a single vectorized transform inside that one group
  pass — one all-to-all total, no string-keyed shuffle, no join-back.

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

from .contamination import BENCH_MOD, DECON_K, _batch_grams, benchmark_shingles
from .corpus import NORM_WS_RE
from .text import quality_batch


def _md5_part(md5s: list[str]) -> np.ndarray:
    """First 8 hex chars of the (already computed) md5 as an int key."""
    return np.array([int(s[:8], 16) for s in md5s], dtype=np.int64)

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
        md5s = [md5(s.encode()).hexdigest() for s in norm]
        out = pd.DataFrame({
            "doc_id": doc_id,
            "lang": df["lang"].astype(str).to_numpy(),
            "source": df["source"].astype(str).to_numpy(),
            "n_ws_tokens": q["n_ws_tokens"].to_numpy(dtype=np.int64),
            "quality_score": q["quality_score"].to_numpy(),
            "norm_md5": md5s,
            # int co-partition key over the DUP CLASS: every row of a
            # normalized-text class lands in one coarse partition
            "part": (_md5_part(md5s) % CURATE_PARTS).astype(np.int32),
        })
        return out[keep]

    def resolve_class(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("norm_md5", sort=False)["doc_id"]
        keep_id = grp.transform("min").to_numpy(dtype=np.int64)
        n = grp.transform("size").to_numpy(dtype=np.int64)
        g = g.assign(n_copies=n)
        return g.loc[g["doc_id"].to_numpy(dtype=np.int64) == keep_id,
                     OUT_COLS]

    # materialize the slim survivor rows before the all-to-all (fusing
    # the gates scan with a shuffle in one execution is the repo's
    # measured several-times-slower pattern)
    return (docs.select_columns(["doc_id", "text", "lang", "source"])
            .map_batches(gates, batch_format="pandas")
            .materialize()
            .groupby("part")
            .map_groups(resolve_class, batch_format="pandas"))


# ---- percentile quality gate (data-dependent threshold, two passes) ----

GATE_BIN_FP = 1000     # score bin = floor(quality_score * 1000); score ≤ 1.0
GATE_Q = 0.1           # drop the bottom decile per language


def _score_bin_thresholds(slim: ray.data.Dataset,
                          qs: tuple[float, ...]) -> dict[str, list[int]]:
    """Per-lang nearest-rank quantile bins of the composite quality
    score: combiner → ≤ #langs × (GATE_BIN_FP+1) counter rows → Sum
    shuffle → bounded driver fold. Shared by the percentile gate and
    the CCNet-style tercile bucketing."""
    from ray.data.aggregate import Sum

    def bin_partials(df: pd.DataFrame) -> pd.DataFrame:
        sc = quality_batch(df)["quality_score"].to_numpy()
        part = pd.DataFrame({
            "lang": df["lang"].to_numpy(dtype=object),
            "bin": np.floor(sc * float(GATE_BIN_FP)).astype(np.int64)})
        g = (part.groupby(["lang", "bin"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return g

    # LARGE batch_size: a partial is ≤ langs×(GATE_BIN_FP+1) rows no
    # matter the batch width, so wide batches shrink the shuffle input
    hist = (slim.map_batches(bin_partials, batch_format="pandas",
                             batch_size=16384)
            .groupby(["lang", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    thr: dict[str, list[int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("bin", kind="stable")
        n = int(g["n"].sum())
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        bins = g["bin"].to_numpy(dtype=np.int64)
        thr[str(lang)] = [
            int(bins[np.searchsorted(cum, int(np.floor(q * (n - 1))) + 1)])
            for q in qs]
    return thr


def quality_percentile_gate(docs: ray.data.Dataset,
                            q: float = GATE_Q) -> ray.data.Dataset:
    """(doc_id, lang, quality_score, score_bin, thr_bin, keep): gate each
    document on a DATA-DEPENDENT per-language quality threshold — the
    p-quantile of the corpus's own score distribution (CCNet-style
    head/middle/tail cuts use exactly this shape) — instead of the fixed
    floor ``corpus_curate`` applies.

    Two streaming passes, zero row-level shuffles:
      1. combiner → ≤ #langs × 1001 (lang, score-bin, n) counter rows →
         Sum shuffle → threshold bin per lang = lower edge of the bin
         holding nearest-rank floor(q·(n−1))+1 (bounded driver fold,
         broadcast once via ``ray.put``);
      2. re-score each batch locally (recompute beats a full-row
         shuffle at 100 TB) and flag ``keep = score_bin ≥ thr_bin``.

    Everything is floor-of-IEEE-product integer binning, so the DuckDB
    mirror reproduces keep decisions bit-for-bit."""
    slim = docs.select_columns(["doc_id", "text", "lang"])
    thr = {lang: t[0] for lang, t in
           _score_bin_thresholds(slim, (q,)).items()}
    thr_ref = ray.put(thr)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        sc = quality_batch(df)["quality_score"].to_numpy()
        bins = np.floor(sc * float(GATE_BIN_FP)).astype(np.int64)
        tb = df["lang"].map(t).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "lang": df["lang"].to_numpy(dtype=object),
            "quality_score": sc,
            "score_bin": bins,
            "thr_bin": tb,
            "keep": bins >= tb,
        })

    return slim.map_batches(gate, batch_format="pandas")


# ---- CCNet-style quality buckets (head / middle / tail) ----

#: tercile cut points (IEEE doubles; the SQL mirror inlines their reprs)
TERCILE_LO = 1 / 3
TERCILE_HI = 2 / 3


def quality_buckets(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, lang, score_bin, lo_bin, hi_bin, bucket): CCNet's
    head/middle/tail split — each document labeled by which per-language
    score TERCILE it falls in ('tail' = bottom third, 'head' = top
    third). CCNet buckets by LM perplexity terciles; this is the same
    cut over the composite quality score (swap the scorer per deployment).

    Same two-pass zero-row-shuffle shape as
    :func:`quality_percentile_gate`, one histogram pass computing BOTH
    cut points."""
    slim = docs.select_columns(["doc_id", "text", "lang"])
    thr = _score_bin_thresholds(slim, (TERCILE_LO, TERCILE_HI))
    thr_ref = ray.put(thr)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        sc = quality_batch(df)["quality_score"].to_numpy()
        bins = np.floor(sc * float(GATE_BIN_FP)).astype(np.int64)
        pair = df["lang"].map(t)
        lo = pair.map(lambda p: p[0]).to_numpy(dtype=np.int64)
        hi = pair.map(lambda p: p[1]).to_numpy(dtype=np.int64)
        bucket = np.where(bins >= hi, "head",
                          np.where(bins >= lo, "middle", "tail"))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "lang": df["lang"].to_numpy(dtype=object),
            "score_bin": bins,
            "lo_bin": lo,
            "hi_bin": hi,
            "bucket": bucket.astype(object),
        })

    return slim.map_batches(label, batch_format="pandas")


# ---- DSIR-style importance weights (hashed n-gram data selection) ----

DSIR_BUCKETS = 4096       # hashed feature space (B in the paper)
DSIR_FP = 10 ** 6
DSIR_TARGET_LANG = "en"   # the "target distribution" exemplar subset


def dsir_weights(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_grams, dsir_score_fp): per-document importance weight
    for target-distribution resampling, following the hashed n-gram
    DSIR recipe (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling"): features are uni+bigrams hashed into
    ``DSIR_BUCKETS`` buckets; a target model (docs whose lang is the
    exemplar) and a raw model (all docs) are bag-of-buckets counts; a
    document's weight is its grams' mean target/raw likelihood ratio.

    Integer surrogate: the paper's Σ log(p_tgt/p_raw) is transcendental,
    so the score is the add-one count ratio in fixed point —
    ratio_fp[b] = ((tgt[b]+1)·FP) // (raw[b]+1), score = Σ ratio_fp //
    n_grams — monotone per feature, bit-exact in the DuckDB mirror,
    and order-independent (integer sums).

    Scale shape: pass 1 folds each batch to ≤ B (bucket, raw_c, tgt_c)
    partial rows (np.bincount — the text never shuffles) and a
    B-bounded hash-agg finishes the two models; the B-row ratio table
    broadcasts once via ``ray.put``; pass 2 is a stateless streaming
    re-score (vectorized bucket lookup). Same two-scan shape as
    ``ops/text.unigram_rank_scores``."""
    from .dedup import _WS_RE, _hash64_str

    B = DSIR_BUCKETS

    def grams_of(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        """flat bucket array + per-doc gram counts (uni + bigrams)."""
        per_doc, lens = [], np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _WS_RE.findall(t.lower())
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            lens[i] = len(grams)
            if grams:
                per_doc.append(
                    (_hash64_str(grams) % np.uint64(B)).astype(np.int64))
        flat = (np.concatenate(per_doc) if per_doc
                else np.empty(0, np.int64))
        return flat, lens

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = grams_of(df["text"].astype(str))
        is_tgt = np.repeat(
            (df["lang"].astype(str) == DSIR_TARGET_LANG).to_numpy(), lens)
        raw_c = np.bincount(flat, minlength=B)
        tgt_c = np.bincount(flat[is_tgt], minlength=B)
        nz = (raw_c > 0).nonzero()[0]
        return pd.DataFrame({"b": nz.astype(np.int64),
                             "raw_c": raw_c[nz].astype(np.int64),
                             "tgt_c": tgt_c[nz].astype(np.int64)})

    from ray.data.aggregate import Sum
    # LARGE batch_size: each partial is ≤ B rows regardless of batch
    # row count, so wide batches shrink the shuffle input ~linearly
    # (64 tiny blocks × 4k rows → a handful of partials).
    model = (docs.select_columns(["lang", "text"])
             .map_batches(count_partial, batch_format="pandas",
                          batch_size=65536)
             .groupby("b")
             .aggregate(Sum("raw_c", alias_name="raw_n"),
                        Sum("tgt_c", alias_name="tgt_n"))
             .to_pandas())           # ≤ B rows — bounded by design
    ratio = np.full(B, DSIR_FP, dtype=np.int64)   # unseen bucket: 1/1
    bb = model["b"].to_numpy(dtype=np.int64)
    ratio[bb] = ((model["tgt_n"].to_numpy(dtype=np.int64) + 1) * DSIR_FP
                 // (model["raw_n"].to_numpy(dtype=np.int64) + 1))
    ratio_ref = ray.put(ratio)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ratio_ref)
        flat, lens = grams_of(df["text"].astype(str))
        keep = lens > 0
        sums = np.zeros(len(df), dtype=np.int64)
        np.add.at(sums, np.repeat(np.arange(len(df)), lens), r[flat])
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
            "n_grams": lens[keep],
            "dsir_score_fp": sums[keep] // lens[keep]})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pandas")
