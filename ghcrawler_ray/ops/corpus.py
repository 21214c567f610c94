"""Corpus-curation operators: PII scrubbing, deterministic stratified
sampling, corpus-level token statistics, and repetition (Gopher-style)
quality signals — the filters a training-data pipeline applies between
extraction and dedup.

Every op is a vectorized ``map_batches`` stage over the ``documents``
table ``(doc_id, text, lang, source, n_chars)`` and is mirrored 1:1 by a
DuckDB oracle in ``__ray_entry__`` (same column names, same operation
order for floats, md5-derived hashing only — no RNG).

Scale shapes (100 TB discipline):
- pii_scrub / repetition_metrics: embarrassingly parallel per-row maps,
  zero shuffles; output is slim (counts + md5), the redacted text itself
  is never shuffled or collected.
- stratified_sample: the sampling decision is a pure function of
  (doc_id, lang) — md5 bucket < per-stratum rate — so it needs no
  global state, no count pass, and resampling is reproducible from the
  id alone (the property that matters when a 100 TB corpus is sampled
  again after an append).
- token_stats: per-batch PARTIAL counts (pandas groupby inside the map
  task) collapse each batch to its distinct (lang, token) rows before
  the one slim ``groupby(lang, token)`` shuffle — the classic combiner;
  the final per-lang top-k touches only #langs × vocab rows.

Reference context: the reference slims payloads per-type before store
(`providers/fetcher/githubProcessor.js:248-252` patch stripping); these
ops are the web-corpus analogues of that normalize-before-persist pass.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from .text import WS_TOKEN_RE

# ---- PII scrubbing ----
# Patterns are written in the common subset of Python re and RE2 (no
# lookbehind), so DuckDB's regexp_replace/regexp_extract_all reproduce
# byte-identical redactions. Redaction order is fixed: email → ipv4 →
# phone, each count taken on the text as redacted so far.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{9,15}"

_EMAIL = re.compile(EMAIL_RE)
_IPV4 = re.compile(IPV4_RE)
_PHONE = re.compile(PHONE_RE)


def pii_scrub_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, clean_md5): count + redact
    each PII class in the fixed order, md5 of the fully redacted text.
    Slim output — the redacted text never leaves the task."""
    t = df["text"].astype(str)
    n_email = t.str.count(EMAIL_RE).astype(np.int64)
    t1 = t.str.replace(EMAIL_RE, "[EMAIL]", regex=True)
    n_ip = t1.str.count(IPV4_RE).astype(np.int64)
    t2 = t1.str.replace(IPV4_RE, "[IP]", regex=True)
    n_phone = t2.str.count(PHONE_RE).astype(np.int64)
    t3 = t2.str.replace(PHONE_RE, "[PHONE]", regex=True)
    md5 = hashlib.md5
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype(np.int64),
        "n_emails": n_email, "n_ipv4": n_ip, "n_phones": n_phone,
        "clean_md5": [md5(s.encode()).hexdigest() for s in t3],
    })


# ---- deterministic stratified sampling ----

#: per-language keep rate out of 100 (unlisted langs keep everything) —
#: the down-mix a training corpus applies to over-represented strata
SAMPLE_PCT: dict[str, int] = {"en": 50, "zh": 20}
SAMPLE_DEFAULT_PCT = 100
_SAMPLE_SALT = "sample-"


def sample_bucket(doc_ids) -> np.ndarray:
    """Deterministic bucket in [0, 100): first 8 bytes of
    md5('sample-<doc_id>') as a big-endian u64, mod 100 — DuckDB computes
    the identical value as ('0x'||substr(md5(...),1,16))::UBIGINT % 100."""
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(f"{_SAMPLE_SALT}{int(d)}".encode()).digest()[:8],
                        "big") % 100 for d in doc_ids),
        dtype=np.int64, count=len(doc_ids))


def stratified_sample_batch(df: pd.DataFrame) -> pd.DataFrame:
    b = sample_bucket(df["doc_id"])
    pct = df["lang"].astype(str).map(SAMPLE_PCT) \
        .fillna(SAMPLE_DEFAULT_PCT).to_numpy(dtype=np.int64)
    keep = b < pct
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype(np.int64)[keep],
        "lang": df["lang"].astype(str)[keep],
        "sample_bucket": b[keep],
    })


# ---- corpus-level token statistics (combiner → slim shuffle → top-k) ----

TOKEN_STATS_TOPK = 10


def _partial_token_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: explode ws-tokens and pre-aggregate to the
    batch's distinct (lang, token) rows — the shuffle then moves vocab-
    sized rows, not corpus-sized."""
    langs, toks = [], []
    ws = re.compile(WS_TOKEN_RE)
    for lang, text in zip(df["lang"].astype(str), df["text"].astype(str)):
        ts = ws.findall(text.lower())
        langs.append(np.full(len(ts), lang, dtype=object))
        toks.append(np.array(ts, dtype=object))
    if not langs:
        return pd.DataFrame({"lang": [], "token": [], "n_part": []})
    flat = pd.DataFrame({"lang": np.concatenate(langs),
                         "token": np.concatenate(toks)})
    out = flat.groupby(["lang", "token"], as_index=False).size() \
        .rename(columns={"size": "n_part"})
    out["n_part"] = out["n_part"].astype(np.int64)
    return out


def _topk_of_lang(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["n", "token"], ascending=[False, True],
                      kind="stable").head(TOKEN_STATS_TOPK)
    g = g.reset_index(drop=True)
    g["rank_in_lang"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["lang", "token", "n", "rank_in_lang"]]


def token_stats(docs: ray.data.Dataset,
                k: int = TOKEN_STATS_TOPK) -> ray.data.Dataset:
    """Top-k ws-tokens per language: (lang, token, n, rank_in_lang),
    rank ordered by (n desc, token asc). One slim vocab-sized shuffle;
    the per-lang top-k groups are #langs-bounded (a web corpus has
    O(100) languages, so map_groups per lang is NOT the per-group-task
    pitfall the dedup ops avoid)."""
    assert k == TOKEN_STATS_TOPK  # k is baked into the SQL mirror

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # coarse int co-partition on the token hash (string groupbys
        # sort-shuffle the vocab text; see the degree_stats lesson)
        from ..urls import hash64_array
        df = df.copy()
        df["part"] = (hash64_array(df["token"]) % 64).astype(np.int32)
        return df

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        # full count per (lang, token) — a token's rows all share the
        # part — then per-lang LOCAL top-k: the global top-k is a subset
        # of the union of the 64 per-part top-ks
        s = g.groupby(["lang", "token"], sort=False)["n_part"].sum() \
            .rename("n").reset_index()
        s["n"] = s["n"].astype(np.int64)
        return (s.sort_values(["n", "token"], ascending=[False, True],
                              kind="stable")
                .groupby("lang", sort=False).head(TOKEN_STATS_TOPK))

    return (docs.select_columns(["lang", "text"])
            .map_batches(_partial_token_counts, batch_format="pandas")
            .map_batches(add_part, batch_format="pandas")
            .groupby("part")
            .map_groups(fold_topk, batch_format="pandas")
            .groupby("lang")
            .map_groups(_topk_of_lang, batch_format="pandas"))


# ---- repetition / duplication quality signals (Gopher-style) ----

#: thresholds for the composite repetitiveness flag
REP_DUP_2GRAM_MAX = 0.6
REP_TOP_TOKEN_MAX = 0.2


def repetition_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-document repetition signals over lowercased ws-tokens:
    duplicate-token fraction, most-frequent-token fraction, duplicate
    2-gram fraction, and a composite ``is_repetitive`` flag (int 0/1).
    Every division is (int − int) / max(int, 1) in float64, in the same
    order as the SQL mirror."""
    ws = re.compile(WS_TOKEN_RE)
    n_tok = np.zeros(len(df), dtype=np.int64)
    n_dist = np.zeros(len(df), dtype=np.int64)
    top_n = np.zeros(len(df), dtype=np.int64)
    n_2g = np.zeros(len(df), dtype=np.int64)
    n_2g_dist = np.zeros(len(df), dtype=np.int64)
    for i, text in enumerate(df["text"].astype(str)):
        ts = ws.findall(text.lower())
        n_tok[i] = len(ts)
        if ts:
            arr = np.array(ts, dtype=object)
            _, counts = np.unique(arr, return_counts=True)
            n_dist[i] = len(counts)
            top_n[i] = counts.max()
            if len(ts) > 1:
                grams = np.array([f"{ts[j]} {ts[j + 1]}"
                                  for j in range(len(ts) - 1)], dtype=object)
                n_2g[i] = len(grams)
                n_2g_dist[i] = len(np.unique(grams))
    dup_tok = (n_tok - n_dist) / np.maximum(n_tok, 1)
    top_frac = top_n / np.maximum(n_tok, 1)
    dup_2g = (n_2g - n_2g_dist) / np.maximum(n_2g, 1)
    flag = ((dup_2g > REP_DUP_2GRAM_MAX)
            | (top_frac > REP_TOP_TOKEN_MAX)).astype(np.int64)
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype(np.int64),
        "n_tokens": n_tok, "n_distinct_tokens": n_dist,
        "top_token_n": top_n, "n_2grams": n_2g,
        "n_distinct_2grams": n_2g_dist,
        "dup_token_frac": dup_tok, "top_token_frac": top_frac,
        "dup_2gram_frac": dup_2g, "is_repetitive": flag,
    })


# ---- per-stratum length quantiles (exact, nearest-rank) ----

_QUANTILES = (("p50_chars", 0.5), ("p90_chars", 0.9), ("p99_chars", 0.99))


def _length_stats_of_lang(g: pd.DataFrame) -> pd.DataFrame:
    """Exact nearest-rank quantiles: value at index floor(q·(n−1)) of the
    ascending-sorted lengths — the deterministic rule the SQL mirror
    reproduces with row_number(). Per-lang groups are #langs-bounded."""
    v = np.sort(g["n_chars"].to_numpy(dtype=np.int64))
    n = len(v)
    row = {"lang": [g["lang"].iloc[0]],
           "n_docs": np.array([n], dtype=np.int64),
           "min_chars": np.array([v[0]], dtype=np.int64),
           "max_chars": np.array([v[-1]], dtype=np.int64)}
    for name, q in _QUANTILES:
        row[name] = np.array([v[int(np.floor(q * (n - 1)))]], dtype=np.int64)
    return pd.DataFrame(row)[["lang", "n_docs", "min_chars", "p50_chars",
                              "p90_chars", "p99_chars", "max_chars"]]


def doc_length_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs, min/p50/p90/p99/max chars): per-language length
    distribution — the pre-filter profile a corpus pipeline computes
    before choosing truncation/min-length thresholds. Only (lang,
    n_chars) is shuffled; quantiles are exact nearest-rank."""
    return (docs.select_columns(["lang", "n_chars"])
            .groupby("lang")
            .map_groups(_length_stats_of_lang, batch_format="pandas"))


# ---- Dataset-level entry points ----

def pii_scrub(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        pii_scrub_batch, batch_format="pandas")


def stratified_sample(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "lang"]).map_batches(
        stratified_sample_batch, batch_format="pandas")


def repetition_metrics(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pandas")


# ---- text normalization (the normalize-before-persist pass) ----

#: whitespace run (ASCII — matches both Python re and DuckDB RE2 \s
#: semantics on this corpus)
NORM_WS_RE = r"\s+"


def text_normalize_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_chars_raw, n_chars_norm, norm_md5): lowercase,
    collapse whitespace runs to single spaces, trim — the canonical
    text-normalization pass a web corpus applies before dedup so that
    formatting-only variants hash identically. Slim output: the
    normalized text never leaves the task (downstream stages recompute
    it locally or persist it shard-side)."""
    t = df["text"].astype(str)
    norm = (t.str.lower()
            .str.replace(NORM_WS_RE, " ", regex=True)
            .str.strip())
    md5 = hashlib.md5
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
        "n_chars_raw": t.str.len().to_numpy(dtype=np.int64),
        "n_chars_norm": norm.str.len().to_numpy(dtype=np.int64),
        "norm_md5": [md5(s.encode()).hexdigest() for s in norm],
    })


def text_normalize(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        text_normalize_batch, batch_format="pandas")


# ---- domain mixture weights ----

WEIGHT_FP = 10 ** 12    # fixed-point scale for mixture proportions


def mixture_weights(docs: ray.data.Dataset) -> pd.DataFrame:
    """(source, n_docs, n_tokens, weight_fp): per-source token share of
    the corpus as an exact int64 fixed-point proportion — the sampling
    weights a training run derives from a curated corpus (domain
    mixing). One slim combiner pass (per-batch partial sums over
    (source, tokens, docs)) → a #sources-row aggregate; the division is
    integer floor so the DuckDB mirror is bit-exact. Result is
    inherently small (#sources rows) — returned as a DataFrame."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tok = df["text"].astype(str).str.count(WS_TOKEN_RE) \
            .to_numpy(dtype=np.int64)
        g = pd.DataFrame({"source": df["source"].astype(str),
                          "n_tokens": tok,
                          "n_docs": np.ones(len(df), dtype=np.int64)})
        out = g.groupby("source", sort=False).sum().reset_index()
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    agg = (docs.select_columns(["source", "text"])
           .map_batches(partial, batch_format="pandas")
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas())
    total = int(agg["n_tokens"].sum())
    # Python-int math: n_tokens × 1e12 overflows int64 past ~9.2M
    # tokens per source; the quotient itself always fits (≤ 1e12)
    agg["weight_fp"] = np.fromiter(
        (int(t) * WEIGHT_FP // total for t in agg["n_tokens"]),
        dtype=np.int64, count=len(agg))
    agg = agg.sort_values("source", kind="stable").reset_index(drop=True)
    return agg[["source", "n_docs", "n_tokens", "weight_fp"]]


# ---- per-source document caps (host-cap rule) ----

SOURCE_CAP = 10          # max docs kept per source
SOURCE_CAP_PARTS = 64    # coarse co-partition key space


def source_caps(docs: ray.data.Dataset,
                cap: int = SOURCE_CAP) -> ray.data.Dataset:
    """(doc_id, source, rank_in_source): the web-corpus "at most N
    documents per host/source" rule — rank = position by ascending
    doc_id within the source, rows with rank ≥ cap dropped.

    Scale shape: only slim (doc_id, source) rows ever move; ONE
    coarse co-partition shuffle on ``hash(source) % SOURCE_CAP_PARTS``
    co-locates each source's rows, then ranks are a vectorized
    sort + cumcount across ALL of a partition's sources (no per-source
    task, no global sort). Skewed giant sources stay bounded because
    only their first ``cap`` rows survive the group pass's output.
    Reference parity: per-org allow-cap filtering at pop/push
    (`lib/crawler.js:321-339,563-576`) generalized to a count cap."""
    def slim(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].astype(str)
        part = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
             % SOURCE_CAP_PARTS for s in src),
            dtype=np.int64, count=len(src))
        return pd.DataFrame({"part": part.astype(np.int32),
                             "doc_id": df["doc_id"].astype(np.int64),
                             "source": src})

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "doc_id"], kind="stable")
        rank = g.groupby("source", sort=False).cumcount().to_numpy()
        keep = rank < cap
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(dtype=np.int64)[keep],
            "source": g["source"].to_numpy()[keep],
            "rank_in_source": rank[keep].astype(np.int64)})

    return (docs.select_columns(["doc_id", "source"])
            .map_batches(slim, batch_format="pandas")
            .groupby("part")
            .map_groups(rank_part, batch_format="pandas"))


# ---- BPE first-merge pair statistics (tokenizer-training prep) ----

BPE_PAIR_TOPK = 32


def bpe_pair_counts(docs: ray.data.Dataset,
                    k: int = BPE_PAIR_TOPK) -> pd.DataFrame:
    """(pair, n): the k most frequent ADJACENT whitespace-token pairs
    corpus-wide (ties broken by pair text asc) — the statistic the first
    BPE merge selects its rule from. Per-batch combiner collapses each
    batch to its distinct pairs before the one slim ``groupby(pair)``
    shuffle; per-PARTITION local top-k then a k×parts driver reduce
    keeps the global sort away (the bm25 local-topk shape). The shuffle
    key is a coarse ``hash64(pair) % 64`` INT (a raw string groupby
    sort-shuffles the full distinct-pair text — the repo's measured
    pitfall); a pair lives wholly in one partition, so per-partition
    top-k is lossless. Deterministic: counts are exact integers;
    ordering is (n desc, pair asc)."""
    from ..urls import hash64_array

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(WS_TOKEN_RE)
        pairs = [f"{ts[i]} {ts[i + 1]}"
                 for ts in toks for i in range(len(ts) - 1)]
        if not pairs:
            return pd.DataFrame({"part": np.empty(0, np.int32),
                                 "pair": np.empty(0, object),
                                 "n_part": np.empty(0, np.int64)})
        cnt = pd.Series(pairs, dtype=object).value_counts()
        pair = cnt.index.to_numpy(dtype=object)
        return pd.DataFrame({
            "part": (hash64_array(pd.Series(pair)) % 64).astype(np.int32),
            "pair": pair,
            "n_part": cnt.to_numpy(dtype=np.int64)})

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pair", sort=False, as_index=False)["n_part"] \
            .sum().rename(columns={"n_part": "n"})
        out = out.sort_values(["n", "pair"], ascending=[False, True],
                              kind="stable")
        return out.head(k)

    top = (docs.select_columns(["text"])
           .map_batches(partial, batch_format="pandas")
           .materialize()   # split scan from all-to-all (fusion pitfall)
           .groupby("part")
           .map_groups(fold_topk, batch_format="pandas")
           .to_pandas())
    top = top.sort_values(["n", "pair"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
    top["n"] = top["n"].astype(np.int64)
    return top[["pair", "n"]]


# ---- mixture resampling (apply target domain weights) ----

MIX_PPM = 10 ** 6        # keep-rate resolution (parts per million)
_MIX_SALT = "mix-"


def mixture_resample(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, source, bucket_ppm, rate_ppm, keep): deterministically
    down-sample over-represented sources toward a UNIFORM per-source
    token share — the static domain-reweighting pass a training run
    applies after measuring :func:`mixture_weights`. A source holding
    more than 1/#sources of corpus tokens gets keep-rate
    total·PPM // (#sources · its_tokens); under-represented sources
    keep everything (rate capped at PPM).

    Scale shape: one slim combiner pass → #sources-row driver fold
    (same sidecar shape as ``mixture_weights``), then ONE streaming
    keep-flag pass — the hash-bucket rule (md5 of the doc_id) is
    stateless, so the sample is reproducible after corpus appends and
    needs no shuffle. All integer arithmetic; bit-exact mirror."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tok = df["text"].astype(str).str.count(WS_TOKEN_RE) \
            .to_numpy(dtype=np.int64)
        g = pd.DataFrame({"source": df["source"].astype(str),
                          "n_tokens": tok})
        out = g.groupby("source", sort=False).sum().reset_index()
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        return out

    agg = (docs.select_columns(["source", "text"])
           .map_batches(partial, batch_format="pandas")
           .groupby("source")
           .aggregate(Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas())
    total = int(agg["n_tokens"].sum())
    ns = len(agg)
    rates = {
        str(s): (MIX_PPM if t == 0
                 else min(MIX_PPM, total * MIX_PPM // (ns * int(t))))
        for s, t in zip(agg["source"], agg["n_tokens"])}
    ref = ray.put(rates)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        m = hashlib.md5
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        bucket = np.fromiter(
            (int.from_bytes(m(f"{_MIX_SALT}{int(d)}".encode()).digest()[:8],
                            "big") % MIX_PPM for d in ids),
            dtype=np.int64, count=len(ids))
        rate = df["source"].astype(str).map(r).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "source": df["source"].astype(str).to_numpy(dtype=object),
            "bucket_ppm": bucket,
            "rate_ppm": rate,
            "keep": bucket < rate,
        })

    return (docs.select_columns(["doc_id", "source"])
            .map_batches(flag, batch_format="pandas"))


# ---- exact-N deterministic sample per stratum ----

FIXED_SAMPLE_N = 50
_FIXN_SALT = "fixn-"
_FIXN_HEX = 15           # 60-bit keys fit int64; SQL mirrors the value


def _fixn_keys(doc_ids) -> np.ndarray:
    m = hashlib.md5
    return np.fromiter(
        (int(m(f"{_FIXN_SALT}{int(d)}".encode()).hexdigest()[:_FIXN_HEX],
             16) for d in doc_ids),
        dtype=np.int64, count=len(doc_ids))


def fixed_n_sample(docs: ray.data.Dataset,
                   n: int = FIXED_SAMPLE_N) -> ray.data.Dataset:
    """(doc_id, lang, sample_key, rank_in_lang): EXACTLY min(n, stratum
    size) documents per language — the fixed-size eval/holdout draw
    (a rate-based sample like ``stratified_sample`` can't hit an exact
    count). Selection = the n smallest md5-derived keys per lang, ties
    by doc_id, so the draw is uniform-ish, reproducible, and stable
    under corpus repartitioning.

    Scale shape: a per-batch combiner keeps only each batch's local
    top-n per lang (the global top-n is a subset of the union of local
    top-n's), so the fold input is ≤ n × #langs × #blocks slim rows —
    never the corpus; the final per-lang rank is a tiny map_groups."""
    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "lang": df["lang"].to_numpy(dtype=object),
            "sample_key": _fixn_keys(df["doc_id"])})
        g = g.sort_values(["lang", "sample_key", "doc_id"], kind="stable")
        return g.groupby("lang", sort=False).head(n)

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sample_key", "doc_id"], kind="stable").head(n) \
            .reset_index(drop=True)
        g["rank_in_lang"] = np.arange(len(g), dtype=np.int64)
        return g[["doc_id", "lang", "sample_key", "rank_in_lang"]]

    return (docs.select_columns(["doc_id", "lang"])
            .map_batches(local_topn, batch_format="pandas")
            .groupby("lang")
            .map_groups(final_topn, batch_format="pandas"))


# ---- ROLLUP grouping-set aggregate ----

ROLLUP_ALL = "ALL"


def rollup_doc_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """GROUP BY ROLLUP (lang, source) over the corpus: (lang, source,
    n_docs, total_chars) at three grouping levels — per (lang, source),
    per-lang subtotal (source='ALL'), and the grand total
    (lang='ALL', source='ALL').

    Shape: the per-batch combiner emits ALL THREE grouping levels as
    partial rows (≤ 3×#groups per batch), so one slim hash-groupby
    finishes every level in a single shuffle — rollups never re-scan or
    re-shuffle the corpus per level. Counts/sums are exact int64."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame({
            "lang": df["lang"].to_numpy(dtype=object),
            "source": df["source"].to_numpy(dtype=object),
            "n": np.ones(len(df), dtype=np.int64),
            "chars": df["n_chars"].to_numpy(dtype=np.int64)})
        lvl0 = base.groupby(["lang", "source"], sort=False,
                            as_index=False).sum()
        lvl1 = lvl0.groupby("lang", sort=False, as_index=False) \
            [["n", "chars"]].sum()
        lvl1["source"] = ROLLUP_ALL
        lvl2 = pd.DataFrame({"lang": [ROLLUP_ALL], "source": [ROLLUP_ALL],
                             "n": [lvl1["n"].sum()],
                             "chars": [lvl1["chars"].sum()]})
        return pd.concat([lvl0, lvl1[["lang", "source", "n", "chars"]],
                          lvl2], ignore_index=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"].astype(str),
            "source": df["source"].astype(str),
            "n_docs": df["n"].to_numpy(dtype=np.int64),
            "total_chars": df["chars"].to_numpy(dtype=np.int64)})

    return (docs.select_columns(["lang", "source", "n_chars"])
            .map_batches(partial, batch_format="pandas")
            .groupby(["lang", "source"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("chars", alias_name="chars"))
            .map_batches(finish, batch_format="pandas"))


# ---- exact global percentile ranks ----

def length_percentile_ranks(docs: ray.data.Dataset) -> ray.data.Dataset:
    """SQL ``percent_rank() OVER (ORDER BY n_chars)`` at corpus scale:
    (doc_id, n_chars, pct_rank) with pct_rank = count_less / (N − 1)
    (ties share their minimum rank, exactly the window-function rule).

    Shape: a global sort would be an all-to-all over every row — instead
    the value histogram (n_chars is a bounded int, so #distinct values ≪
    #docs) comes from a per-batch combiner + one value-keyed slim
    shuffle; the cumulative counts-below table is a driver-side cumsum
    over that bounded table, broadcast into ONE streaming searchsorted
    pass. pct_rank is a single IEEE division of exact ints — bit-exact
    vs the window mirror with no rounding."""

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.Series(df["n_chars"].to_numpy(dtype=np.int64)) \
            .value_counts()
        return pd.DataFrame({"v": c.index.to_numpy(dtype=np.int64),
                             "n": c.to_numpy(dtype=np.int64)})

    from ray.data.aggregate import Sum
    h = (docs.select_columns(["n_chars"])
         .map_batches(hist, batch_format="pandas")
         .groupby("v").aggregate(Sum("n", alias_name="n"))
         .to_pandas())                     # #distinct-values rows
    h = h.sort_values("v").reset_index(drop=True)
    vals = h["v"].to_numpy(dtype=np.int64)
    below = np.concatenate([[0], np.cumsum(h["n"].to_numpy(np.int64))[:-1]])
    total = int(h["n"].sum())

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n_chars"].to_numpy(dtype=np.int64)
        less = below[np.searchsorted(vals, c)]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "n_chars": c,
            "pct_rank": less.astype(np.float64) / np.float64(total - 1)})

    return (docs.select_columns(["doc_id", "n_chars"])
            .map_batches(rank, batch_format="pandas"))


# ---- data-quality audit (constraint validation) ----

QA_ALLOWED_LANGS = ("en", "fr", "es", "de")


def data_quality_audit(docs: ray.data.Dataset) -> pd.DataFrame:
    """Deequ-style constraint audit over the corpus: one row per check
    (check_name, n_violations) — empty/null text, n_chars↔len(text)
    consistency, lang outside the allowed set (the synthetic corpus
    ships 'zh' rows, so the drift detector has real signal), and
    doc_id uniqueness.

    Shape: the three row-local checks fold to ONE partial count row per
    batch (a scalar Sum aggregate); uniqueness is exact distinct via a
    doc_id-hash co-partition (per-partition distinct counts are
    additive under hash partitioning) — nothing heavier than slim int
    rows ever moves."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"]
        null_text = int((txt.isna() | (txt == "")).sum())
        mismatch = int((df["n_chars"].to_numpy(dtype=np.int64)
                        != txt.fillna("").str.len()
                        .to_numpy(dtype=np.int64)).sum())
        bad_lang = int((~df["lang"].isin(QA_ALLOWED_LANGS)).sum())
        return pd.DataFrame({"null_text": [null_text],
                             "n_chars_mismatch": [mismatch],
                             "bad_lang": [bad_lang],
                             "n_rows": [len(df)]})

    def id_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = pd.Series(df["doc_id"].to_numpy(dtype=np.int64)) \
            .drop_duplicates()
        out = pd.DataFrame({"doc_id": ids.to_numpy(dtype=np.int64)})
        out["part"] = (out["doc_id"] % 64).astype(np.int32)
        return out

    def id_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_distinct": [np.int64(g["doc_id"].nunique())]})

    c = (docs.select_columns(["doc_id", "text", "lang", "n_chars"])
         .map_batches(partial, batch_format="pandas")
         .aggregate(Sum("null_text", alias_name="null_text"),
                    Sum("n_chars_mismatch", alias_name="n_chars_mismatch"),
                    Sum("bad_lang", alias_name="bad_lang"),
                    Sum("n_rows", alias_name="n_rows")))
    n_distinct = int(docs.select_columns(["doc_id"])
                     .map_batches(id_partial, batch_format="pandas")
                     .groupby("part").map_groups(id_fold,
                                                 batch_format="pandas")
                     .to_pandas()["n_distinct"].sum())
    return pd.DataFrame({
        "check_name": ["null_text", "n_chars_mismatch", "bad_lang",
                       "dup_doc_id"],
        "n_violations": np.array(
            [c["null_text"], c["n_chars_mismatch"], c["bad_lang"],
             c["n_rows"] - n_distinct], dtype=np.int64)})


# ---- weighted priority sample (deterministic A-Res surrogate) ----

WSAMPLE_N = 50
_WSAMPLE_SALT = "wsamp-"
_WSAMPLE_HEX = 15


def weighted_sample(docs: ray.data.Dataset,
                    n: int = WSAMPLE_N) -> ray.data.Dataset:
    """(doc_id, n_tokens, priority, rank): EXACTLY min(n, corpus)
    documents sampled with probability increasing in token count —
    the deterministic integer surrogate of A-Res weighted reservoir
    sampling (Efraimidis & Spirakis 2006): priority =
    md5(doc_id) // max(n_tokens, 1), keep the n SMALLEST priorities
    (ties by doc_id). A doc with w× the tokens gets a key scaled by
    1/w, so heavier docs win proportionally more often; integer
    division keeps the DuckDB mirror bit-exact where the float
    u^(1/w) form would drift. Reproducible and stable under corpus
    appends/repartitioning, like the other md5-keyed draws.

    Scale shape: the weight (token count) is computed in the same
    combiner pass that keeps only the batch-local top-n — the global
    top-n is a subset of the union of local top-n's, so the fold sees
    ≤ n × #blocks slim rows, never the corpus."""
    import hashlib
    m = hashlib.md5

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        ntok = (df["text"].astype(str).str.count(r"[^\s]+")
                .to_numpy(dtype=np.int64))
        key = np.fromiter(
            (int(m(f"{_WSAMPLE_SALT}{int(d)}".encode())
                 .hexdigest()[:_WSAMPLE_HEX], 16) for d in ids),
            dtype=np.int64, count=len(ids))
        g = pd.DataFrame({"doc_id": ids, "n_tokens": ntok,
                          "priority": key // np.maximum(ntok, 1)})
        return g.sort_values(["priority", "doc_id"],
                             kind="stable").head(n)

    def final_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["priority", "doc_id"], kind="stable") \
            .head(n).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", "n_tokens", "priority", "rank"]]

    # single-group fold: the combiner output is ≤ n×#blocks rows total
    part = (docs.select_columns(["doc_id", "text"])
            .map_batches(local_topn, batch_format="pandas")
            .map_batches(lambda d: d.assign(g=np.int32(0)),
                         batch_format="pandas"))
    return part.groupby("g").map_groups(
        lambda d: final_topn(d.drop(columns=["g"])),
        batch_format="pandas")


# ---- leakage-safe holdout split (group split by source) ----

SPLIT_BUCKETS = 10        # md5(source) % 10 → 8/1/1 train/val/test
SPLIT_TRAIN_LT = 8
SPLIT_VAL_EQ = 8


def holdout_split(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, source, fold): assign every document to
    train/val/test with ALL documents of a source in the SAME fold —
    the leakage-safe group split (near-dups cluster within a source;
    a random row split would leak them across folds). Deterministic
    md5(source) bucketing: stateless, reproducible after appends,
    zero shuffles — one streaming pass."""
    from .dedup import _hash64_str

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].astype(str)
        # stay uint64: the DuckDB mirror buckets with UBIGINT % n
        b = _hash64_str(src.tolist()) % np.uint64(SPLIT_BUCKETS)
        fold = np.where(b < SPLIT_TRAIN_LT, "train",
                        np.where(b == SPLIT_VAL_EQ, "val", "test"))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "source": src.to_numpy(dtype=object),
                             "fold": fold.astype(object)})

    return docs.select_columns(["doc_id", "source"]).map_batches(
        assign, batch_format="pandas")


# ---- corpus snapshot diff (incremental-crawl delta) ----

DIFF_PARTS = 32


def snapshot_diff(old: ray.data.Dataset,
                  new: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, status) for status ∈ added/removed/changed/unchanged —
    the delta between two corpus snapshots keyed by doc_id (the url
    analogue), content-compared by md5(text). The incremental-crawl
    primitive: what a recrawl actually changed (the reference's delta
    store answers the per-upsert form of the same question,
    `providers/storage/deltaStore.js:26-31`).

    Scale shape: each side folds to slim (doc_id, md5, side) rows in
    its own streaming pass (text never shuffles); ONE doc-hash
    co-partition meets a doc's two versions in the same partition and
    the status is a vectorized two-side merge — no broadcast of either
    (100 TB-scale) snapshot."""
    def slim(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["doc_id"].to_numpy(dtype=np.int64)
            ch = np.fromiter(
                (hashlib.md5(t.encode()).hexdigest()
                 for t in df["text"].astype(str)),
                dtype=object, count=len(df))
            return pd.DataFrame({
                "part": (ids % DIFF_PARTS).astype(np.int32),
                "doc_id": ids, "content_hash": ch,
                "side": np.full(len(ids), side, dtype=np.int8)})
        return fn

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["doc_id", "content_hash"]]
        n = g[g["side"] == 1][["doc_id", "content_hash"]]
        m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"))
        has_o = m["content_hash_o"].notna().to_numpy()
        has_n = m["content_hash_n"].notna().to_numpy()
        same = (m["content_hash_o"] == m["content_hash_n"]).to_numpy()
        status = np.where(~has_o, "added",
                          np.where(~has_n, "removed",
                                   np.where(same, "unchanged", "changed")))
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(np.int64),
                             "status": status.astype(object)})

    return (old.select_columns(["doc_id", "text"])
            .map_batches(slim(0), batch_format="pandas")
            .union(new.select_columns(["doc_id", "text"])
                   .map_batches(slim(1), batch_format="pandas"))
            .groupby("part")
            .map_groups(lambda g: diff(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- exact proportional sample (Hamilton largest-remainder) ----

PROP_SAMPLE_N = 100


def proportional_sample(docs: ray.data.Dataset,
                        total_n: int = PROP_SAMPLE_N) -> ray.data.Dataset:
    """(doc_id, lang, sample_key, rank_in_lang, quota): EXACTLY
    ``total_n`` documents overall, apportioned across languages by the
    Hamilton largest-remainder method — quota_l = ⌊N·n_l/total⌋ plus one
    for the langs with the largest remainders (ties → lang asc) until
    the quotas sum to N. ``fixed_n_sample`` draws a fixed count per
    stratum; this draws a fixed TOTAL with exact proportional
    representation — the eval-set builder that cannot over- or
    under-sample any language by more than one document.

    Scale shape: lang counts are a bounded hash-agg; apportionment is
    integer driver math on #langs rows; selection reuses the
    local-top-n combiner (each batch keeps its smallest max-quota keys
    per lang) so the fold sees ≤ max_quota × #langs × #blocks rows."""
    from ray.data.aggregate import Sum

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    counts = (docs.select_columns(["lang"])
              .map_batches(cnt, batch_format="pandas")
              .groupby("lang").aggregate(Sum("n", alias_name="n"))
              .to_pandas())                    # ≤ #langs rows
    nl = counts["n"].to_numpy(dtype=np.int64)
    tot = int(nl.sum())
    base = np.int64(total_n) * nl // tot
    rem = (np.int64(total_n) * nl) % tot
    extra = int(total_n - base.sum())
    order = np.lexsort((counts["lang"].to_numpy(dtype=object), -rem))
    quota = base.copy()
    quota[order[:extra]] += 1
    qmap = dict(zip(counts["lang"].astype(str), quota.astype(int)))
    max_q = int(quota.max()) if len(quota) else 0

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "lang": df["lang"].to_numpy(dtype=object),
            "sample_key": _fixn_keys(df["doc_id"])})
        g = g.sort_values(["lang", "sample_key", "doc_id"], kind="stable")
        return g.groupby("lang", sort=False).head(max_q)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        q = int(qmap.get(str(g["lang"].iloc[0]), 0))
        g = g.sort_values(["sample_key", "doc_id"], kind="stable") \
            .head(q).reset_index(drop=True)
        g["rank_in_lang"] = np.arange(len(g), dtype=np.int64)
        g["quota"] = np.int64(q)
        return g[["doc_id", "lang", "sample_key", "rank_in_lang", "quota"]]

    return (docs.select_columns(["doc_id", "lang"])
            .map_batches(local_topn, batch_format="pandas")
            .groupby("lang")
            .map_groups(final, batch_format="pandas"))


# ---- pivot / crosstab: source × lang document counts ----

#: the documents table's lang domain (stable across scale factors); the
#: op derives its columns from the data — the SQL mirror pins this set
PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def source_lang_pivot(docs: ray.data.Dataset) -> pd.DataFrame:
    """(source, n_<lang>..., n_total): document counts crosstabbed
    source × lang — the wide pivot shape every corpus report ends in
    (one row per source, one column per language). Column set is the
    LANG domain observed in the corpus, sorted, so the output schema is
    deterministic for a given corpus.

    Scale shape: per-batch (source, lang) count combiner (bounded by
    #sources × #langs per batch) → tiny driver fold → one pivot of a
    #sources × #langs frame. The wide format never exists distributed —
    only the slim count rows move."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["source", "lang"], sort=False,
                         as_index=False).size()
        out["n"] = out["size"].astype(np.int64)
        return out[["source", "lang", "n"]]

    rows = (docs.select_columns(["source", "lang"])
            .map_batches(partial, batch_format="pandas")
            .to_pandas())              # ≤ #sources × #langs × #blocks
    agg = rows.groupby(["source", "lang"], sort=True)["n"].sum() \
        .reset_index()
    langs = sorted(agg["lang"].unique())
    wide = agg.pivot(index="source", columns="lang", values="n") \
        .fillna(0).astype(np.int64)
    wide = wide.reindex(columns=langs).reset_index()
    wide.columns = ["source"] + [f"n_{lg}" for lg in langs]
    wide["n_total"] = wide[[f"n_{lg}" for lg in langs]].sum(axis=1) \
        .astype(np.int64)
    wide["source"] = wide["source"].astype(object)
    return wide.sort_values("source", kind="stable").reset_index(drop=True)


# ---- groupwise top-k (best docs per language) ----

TOPK_PER_LANG = 3


def top_docs_per_lang(docs: ray.data.Dataset,
                      k: int = TOPK_PER_LANG) -> ray.data.Dataset:
    """(lang, rank, doc_id, quality_score): the k highest-quality
    documents per language (composite ``quality_batch`` score; ties →
    smaller doc_id) — the generic groupwise-top-k shape (`row_number()
    OVER (PARTITION BY g ORDER BY s DESC) <= k`) done the distributed
    way: each batch keeps only its LOCAL top-k per lang (the combiner —
    a global winner is necessarily a batch winner), so the final
    per-lang fold sees ≤ k×batches slim rows, never the corpus."""
    from .text import quality_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(df)[["doc_id", "quality_score"]]
        q.insert(0, "lang", df["lang"].to_numpy(dtype=object))
        q = q.sort_values(["lang", "quality_score", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        return q.groupby("lang", sort=False).head(k)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["quality_score", "doc_id"],
                          ascending=[False, True], kind="stable") \
            .head(k).reset_index(drop=True)
        return pd.DataFrame({
            "lang": g["lang"].astype(object),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "doc_id": g["doc_id"].astype(np.int64),
            "quality_score": g["quality_score"].astype(np.float64)})

    return (docs.select_columns(["doc_id", "text", "lang"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=16384)
            .groupby("lang").map_groups(fold, batch_format="pandas"))


# ---- RAG-style document chunking (token windows with stride) ----

CHUNK_TOKENS = 32          # tokens per chunk window
CHUNK_STRIDE = 24          # window start step (overlap = 32 - 24 = 8)


def chunk_documents(docs: ray.data.Dataset,
                    size: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE) -> ray.data.Dataset:
    """(doc_id, start_tok, n_tok, chunk): overlapping token windows per
    document — the retrieval/RAG chunking step (and the packing
    pre-step for long-document training). Windows start at token
    1, 1+stride, 1+2·stride, … while the start is within the document;
    the final window may be short; empty documents emit no chunks.
    Chunk text is the window's tokens joined with single spaces
    (original inter-token whitespace is not preserved — identical rule
    in the SQL mirror's ``array_to_string(array_slice(...))``).

    Scale shape: embarrassingly parallel — ONE streaming map_batches
    pass, no shuffle; the batch tokenizes in one C-level regex pass
    (:func:`~ghcrawler_ray.ops.text.tokenize_flat`) and each output
    chunk is one C-level join. Output rows are chunk-sized, so
    downstream embed/index stages see bounded payloads regardless of
    input document length."""
    from .text import tokenize_flat

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = tokenize_flat(df["text"].astype(str).tolist())
        ids = df["doc_id"].to_numpy(np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        out_id, out_s, out_n, out_c = [], [], [], []
        for i in range(len(ids)):
            n = int(lens[i])
            base = int(starts[i])
            for s in range(0, n, stride):
                e = min(s + size, n)
                out_id.append(ids[i])
                out_s.append(s + 1)          # 1-based like array_slice
                out_n.append(e - s)
                out_c.append(" ".join(flat[base + s:base + e]))
        return pd.DataFrame({
            "doc_id": np.array(out_id, dtype=np.int64),
            "start_tok": np.array(out_s, dtype=np.int64),
            "n_tok": np.array(out_n, dtype=np.int64),
            "chunk": np.array(out_c, dtype=object)})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(chunk, batch_format="pandas"))


# ---- robust length-outlier gate (exact distributed median + MAD) ----

MAD_K_NUM = 3              # flag when |x - median| > 3 · MAD


def length_mad_outliers(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars, dev2, is_outlier): robust length-outlier gate —
    flag documents whose character count deviates from the corpus
    median by more than ``MAD_K_NUM`` × MAD (median absolute
    deviation). The mean/std z-score version breaks on the heavy-tailed
    length distributions web corpora actually have; median/MAD is the
    production-grade gate.

    Exactness: medians of integers are carried DOUBLED (median = avg of
    the two middle values on even counts → med2 = lo+hi is always an
    int), deviations as ``dev2 = |2·x − med2|``, MAD doubled again
    (mad4), and the gate is the pure-integer comparison
    ``4·dev2 > 3·mad4`` — bit-identical to the SQL ``median()`` mirror
    with no floating point anywhere.

    Scale shape: an exact global median needs no sort — lengths are
    low-cardinality, so ONE combiner pass builds a (value, count)
    histogram whose global merge is driver-side over ≤ #distinct-length
    rows; the second histogram over dev2 reuses the first (a shifted
    |2x−med2| remap, no second corpus scan); only the final flag pass
    streams the corpus again."""

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("n_chars", as_index=False).size()
        return pd.DataFrame({
            "v": c["n_chars"].to_numpy(np.int64),
            "n": c["size"].to_numpy(np.int64)})

    h = (docs.select_columns(["n_chars"])
         .map_batches(hist, batch_format="pandas", batch_size=65536)
         .groupby("v").aggregate(Sum("n", alias_name="n"))
         .to_pandas())                       # ≤ #distinct lengths rows
    h = h.sort_values("v").reset_index(drop=True)
    v = h["v"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)

    def med2_of(vals: np.ndarray, cnts: np.ndarray) -> np.int64:
        total = cnts.sum()
        cum = np.cumsum(cnts)
        lo = vals[np.searchsorted(cum, (total + 1) // 2)]
        hi = vals[np.searchsorted(cum, total // 2 + 1)]
        return np.int64(lo + hi)

    med2 = med2_of(v, n)
    # dev2 histogram derived from the length histogram — no second scan
    dev2 = np.abs(2 * v - med2)
    dh = pd.DataFrame({"d": dev2, "n": n}).groupby("d", as_index=False) \
        .sum().sort_values("d")
    mad4 = med2_of(dh["d"].to_numpy(np.int64), dh["n"].to_numpy(np.int64))
    m2, m4 = np.int64(med2), np.int64(mad4)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        d2 = np.abs(2 * x - m2)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": x, "dev2": d2,
            "is_outlier": (4 * d2 > np.int64(MAD_K_NUM) * m4)
            .astype(np.int64)})

    return (docs.select_columns(["doc_id", "n_chars"])
            .map_batches(flag, batch_format="pandas"))


# ---- exact per-group medians (grouped doubled-median histogram) ----

def lang_length_medians(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs, med2_chars): exact per-language median document
    length, carried DOUBLED (med2 = lo+hi of the two middle values, an
    integer even when the median is x.5) — grouped robust statistics
    without a global sort, the per-stratum version of
    :func:`length_mad_outliers`.

    Scale shape: ONE combiner pass builds per-(lang, n_chars) count
    partials; the (lang, value) histogram — ≤ langs × distinct-lengths
    rows, corpus-size-independent — folds per lang-hash partition where
    each language's histogram lands whole, so the median select is a
    cumsum probe, not a sort of the corpus."""
    from ..urls import hash64_array

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["lang", "n_chars"], as_index=False).size()
        out = pd.DataFrame({
            "lang": c["lang"].to_numpy(dtype=object),
            "v": c["n_chars"].to_numpy(np.int64),
            "n": c["size"].to_numpy(np.int64)})
        # deterministic string hash — Python's builtin hash() is
        # seed-randomized per process and would split a language's
        # histogram across partitions
        out["part"] = (hash64_array(out["lang"]) % 16).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, gl in g.groupby("lang", sort=False):
            s = gl.groupby("v", as_index=False)["n"].sum() \
                .sort_values("v")
            v = s["v"].to_numpy(np.int64)
            n = s["n"].to_numpy(np.int64)
            total = n.sum()
            cum = np.cumsum(n)
            lo = v[np.searchsorted(cum, (total + 1) // 2)]
            hi = v[np.searchsorted(cum, total // 2 + 1)]
            rows.append((lang, int(total), int(lo + hi)))
        return pd.DataFrame(rows, columns=["lang", "n_docs",
                                           "med2_chars"])

    return (docs.select_columns(["lang", "n_chars"])
            .map_batches(hist, batch_format="pandas", batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .select_columns(["lang", "n_docs", "med2_chars"]))


# ---- per-language token-budget cap (ordered cumulative gate) ----

TOKEN_BUDGET_PER_LANG = 2000


def token_budget_sample(docs: ray.data.Dataset,
                        budget: int = TOKEN_BUDGET_PER_LANG
                        ) -> ray.data.Dataset:
    """(doc_id, lang, n_tokens, cum_tokens, keep): cap each language's
    corpus slice at a token budget, admitting documents in doc_id order
    until the running total would exceed the budget — the
    mixture-building step that turns "sample 30B tokens of French" into
    a deterministic, resumable selection (id order ⇒ re-running after
    an append admits the same prefix).

    keep = 1 iff the document's INCLUSIVE running total ≤ budget (a
    document never splits). Mirrored by the SQL windowed cumsum.

    Scale shape: per-doc token counts are one vectorized streaming
    pass; the cumulative gate needs each language's counts ordered by
    doc_id, so slim (lang, doc_id, n_tokens) rows co-partition ONCE by
    a deterministic lang hash and each partition lexsorts + cumsums its
    languages vectorized. Only the slim count rows shuffle — never
    text. (Per-lang data volume is the partitioning assumption: a
    single language's count rows must fit a partition; at 100 TB that
    is ~10⁹ slim rows per lang — int columns only, still partition-
    sized. A salted two-level cumsum is the escape hatch.)"""
    from .text import WS_TOKEN_RE
    from ..urls import hash64_array

    def count(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "lang": df["lang"].to_numpy(dtype=object),
            "n_tokens": df["text"].astype(str).str.count(WS_TOKEN_RE)
            .to_numpy(np.int64)})
        out["part"] = (hash64_array(out["lang"]) % 16).astype(np.int32)
        return out

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "doc_id"], kind="stable") \
            .reset_index(drop=True)
        lang = g["lang"].to_numpy(dtype=object)
        n = g["n_tokens"].to_numpy(np.int64)
        c = np.cumsum(n)
        # rebase the cumsum at each language boundary
        new = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = lang[1:] != lang[:-1]
        starts = np.flatnonzero(np.concatenate([[True], new[1:]])) \
            if len(g) else np.empty(0, np.int64)
        runlen = np.diff(np.concatenate([starts, [len(g)]]))
        base = np.repeat(c[starts] - n[starts], runlen) \
            if len(g) else np.empty(0, np.int64)
        cum = c - base
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "lang": lang, "n_tokens": n, "cum_tokens": cum,
            "keep": (cum <= np.int64(budget)).astype(np.int64)})

    return (docs.select_columns(["doc_id", "lang", "text"])
            .map_batches(count, batch_format="pandas")
            .groupby("part").map_groups(gate, batch_format="pandas")
            .select_columns(["doc_id", "lang", "n_tokens",
                             "cum_tokens", "keep"]))
