"""Streaming cardinality sketch — HyperLogLog distinct-token counts per
language, the O(1)-memory answer to "how big is this corpus's
vocabulary" that a 100 TB pipeline runs instead of an exact
count-distinct (whose groupby shuffle would move every token).

Ray-Data-first shape:
  1. ``map_batches`` combiner: each batch folds its tokens into partial
     registers and emits at most #langs × m slim rows (lang, reg, rank)
     — already max-reduced within the batch, so the shuffle moves
     register rows, never tokens;
  2. one ``groupby(lang, reg).aggregate(Max)`` over ≤ #langs × m rows;
  3. ``groupby(lang).map_groups`` finalize — #langs tiny groups.

Exactness of the MIRROR (not of the estimate): every step is integer —
md5-derived 64-bit hashes, register = top ``P`` bits, rank = leading
zeros of the remaining bits + 1, and the harmonic mean is computed in
scaled-integer arithmetic (Σ 2^−M_j = S / 2^(64−P) with
S = Σ 2^(64−P−M_j) an exact integer; the final estimate is one HUGEINT
floor division) — so the DuckDB SQL in ``__ray_entry__`` reproduces the
ESTIMATE bit-for-bit. Accuracy vs the true distinct count is the usual
HLL ~1.04/√m (pinned by a pytest tolerance check, not the oracle).

The per-distinct-token md5 loop keeps the value SQL-reproducible (same
convention as ``ops.corpus.sample_bucket``); at fleet scale swap in a
vectorized 64-bit hash and drop the mirror.

Reference context: the reference tracks queue depth / request counts as
live counters (`lib/crawlerService.js` stats surface); HLL is the
corpus-scale generalization for distinct counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Max

from .text import STOPWORDS, WS_TOKEN_RE

HLL_P = 12                       # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
HLL_W = 64 - HLL_P               # rank bits; max rank = HLL_W + 1
#: alpha_m for m=4096, scaled 1e6: 0.7213 / (1 + 1.079/m)
HLL_ALPHA_FP = 721110
_ALPHA_SCALE = 10 ** 6


def _hash_u64(tokens) -> np.ndarray:
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(t.encode()).digest()[:8], "big") for t in tokens),
        dtype=np.uint64, count=len(tokens))


def _register_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial registers: (lang, reg, rank) max-reduced within
    the batch. Duplicate tokens hash identically, so the per-batch
    distinct() is a pure optimization."""
    out = []
    toks = df["text"].astype(str).str.lower().str.findall(WS_TOKEN_RE)
    for lang, tlist in zip(df["lang"].astype(str), toks):
        out.append(pd.DataFrame({"lang": lang,
                                 "tok": pd.unique(np.asarray(tlist,
                                                             dtype=object))}))
    if not out:
        return pd.DataFrame({"lang": [], "reg": [], "rank": []})
    flat = pd.concat(out, ignore_index=True).drop_duplicates()
    h = _hash_u64(flat["tok"].tolist())
    reg = (h >> np.uint64(HLL_W)).astype(np.int64)
    w = h & np.uint64((1 << HLL_W) - 1)
    # rank = leading zeros within the HLL_W-bit suffix, + 1
    nbits = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    nbits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    # float log2 can misround at 2^k boundaries — correct exactly
    too_hi = nz & ((np.uint64(1) << nbits.clip(0).astype(np.uint64)) > w)
    nbits[too_hi] -= 1
    too_lo = nz & ((np.uint64(2) << nbits.clip(0).astype(np.uint64)) <= w)
    nbits[too_lo] += 1
    rank = np.where(nz, HLL_W - nbits, HLL_W + 1).astype(np.int64)
    part = pd.DataFrame({"lang": flat["lang"].to_numpy(dtype=object),
                         "reg": reg, "rank": rank})
    g = part.groupby(["lang", "reg"], sort=False)["rank"].max().reset_index()
    g["rank"] = g["rank"].astype(np.int64)
    return g


def _finalize(g: pd.DataFrame, key: str = "lang") -> pd.DataFrame:
    ranks = g["rank"].to_numpy(dtype=np.int64)
    n_filled = len(g)
    # S = Σ 2^(HLL_W − M_j) over filled registers, + 2^HLL_W per empty
    # register (M_j = 0) — exact integers throughout
    s = int(sum(1 << (HLL_W - int(r)) for r in ranks))
    s += (HLL_M - n_filled) * (1 << HLL_W)
    raw = (HLL_ALPHA_FP * HLL_M * HLL_M * (1 << HLL_W)) \
        // (s * _ALPHA_SCALE)
    # small-range correction (standard HLL): below 2.5·m the raw
    # harmonic estimator is biased high — use linear counting over the
    # empty-register count. One ln() on the same rational both sides,
    # so the mirror stays value-exact after round(…, 6).
    v = HLL_M - n_filled
    if raw <= 5 * HLL_M // 2 and v > 0:
        est = round(HLL_M * float(np.log(HLL_M / v)), 6)
    else:
        est = float(raw)
    return pd.DataFrame({key: [g[key].iloc[0]],
                         "m": np.array([HLL_M], dtype=np.int64),
                         "n_filled": np.array([n_filled], dtype=np.int64),
                         "est_distinct": np.array([est],
                                                  dtype=np.float64)})


def hll_distinct_tokens(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, m, n_filled, est_distinct): HLL estimate of the distinct
    whitespace-token count per language."""
    return (docs.select_columns(["lang", "text"])
            .map_batches(_register_rows, batch_format="pandas")
            .groupby(["lang", "reg"])
            .aggregate(Max("rank", alias_name="rank"))
            .groupby("lang")
            .map_groups(_finalize, batch_format="pandas"))


# ---- count-min sketch (heavy-hitter counts in sublinear memory) ----

#: depth × width: 4 md5-derived hash rows over 2048 counters — the
#: point-query error bound is ε ≈ e/W of the total token mass per row,
#: with failure probability e^-D. At 100 TB the sketch is still D×W
#: int64 cells; only (row, col, add) partials ever shuffle.
CMS_D = 4
CMS_W = 2048
#: fixed, deterministic point-query set (the mirror and the Ray op must
#: agree on candidates; local per-batch top-k candidates would depend on
#: block boundaries and break replayability)
CMS_CANDIDATES = STOPWORDS


def _cms_cols(tokens, row: int) -> np.ndarray:
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(f"{row}:{t}".encode()).digest()[:8], "big")
         % CMS_W for t in tokens),
        dtype=np.int64, count=len(tokens))


def cms_token_counts(docs: ray.data.Dataset,
                     candidates: tuple[str, ...] = CMS_CANDIDATES
                     ) -> pd.DataFrame:
    """(token, est_n): count-min point estimates of corpus-wide token
    occurrence counts for a fixed candidate set. Per-batch combiner
    collapses each batch to ≤ D×W (row, col, add) partials (tokens never
    shuffle); one slim ``groupby.aggregate(Sum)`` builds the sketch; the
    driver touches only the D×W cell table. est_n ≥ true count always
    (CMS overestimates; equality when no hash collisions in some row —
    pinned by pytest; the DuckDB mirror reproduces est_n exactly)."""
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(WS_TOKEN_RE)
        flat = pd.Series([t for ts in toks for t in ts], dtype=object)
        if not len(flat):
            return pd.DataFrame({"row": np.empty(0, np.int64),
                                 "col": np.empty(0, np.int64),
                                 "add": np.empty(0, np.int64)})
        cnt = flat.value_counts()
        out = []
        for j in range(CMS_D):
            out.append(pd.DataFrame({
                "row": np.full(len(cnt), j, dtype=np.int64),
                "col": _cms_cols(cnt.index.tolist(), j),
                "add": cnt.to_numpy(dtype=np.int64)}))
        p = pd.concat(out, ignore_index=True)
        return p.groupby(["row", "col"], sort=False, as_index=False).sum()

    sk = (docs.select_columns(["text"])
          .map_batches(partials, batch_format="pandas")
          .groupby(["row", "col"])
          .aggregate(Sum("add", alias_name="n"))
          .to_pandas())                           # ≤ D×W rows
    cells = {(int(r), int(c)): int(n)
             for r, c, n in zip(sk["row"], sk["col"], sk["n"])}
    cand = sorted(candidates)
    est = np.array(
        [min(cells.get((j, int(_cms_cols([t], j)[0])), 0)
             for j in range(CMS_D)) for t in cand],
        dtype=np.int64)
    return pd.DataFrame({"token": cand, "est_n": est})


# ---- mergeable histogram quantiles (the 100 TB quantile path) ----

#: fixed bin width in chars. The exact per-stratum quantile op
#: (``ops.corpus.doc_length_stats``) shuffles one slim row per DOCUMENT;
#: this sketch shuffles at most #langs × #bins COUNTER rows regardless
#: of corpus size — the shape a 100 TB profile pass needs. Error is
#: bounded by the bin width (estimate = lower edge of the bin holding
#: the nearest-rank target; pinned in pytest).
HIST_BIN_W = 64


def _hist_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: (lang, bin, n) — already count-reduced, so
    the shuffle moves bounded counter rows, never documents."""
    part = pd.DataFrame({
        "lang": df["lang"].to_numpy(dtype=object),
        "bin": df["n_chars"].to_numpy(dtype=np.int64) // HIST_BIN_W})
    g = part.groupby(["lang", "bin"], sort=False).size().reset_index(name="n")
    g["n"] = g["n"].astype(np.int64)
    return g


_HIST_QUANTILES = (("est_p50_chars", 0.5), ("est_p90_chars", 0.9),
                   ("est_p99_chars", 0.99))


def _hist_finalize(g: pd.DataFrame) -> pd.DataFrame:
    """Per-lang finalize over ≤ #bins counter rows: nearest-rank target
    floor(q·(n−1))+1 (the same rule as the exact op), estimate = lower
    edge of the first bin whose cumulative count reaches it."""
    g = g.sort_values("bin", kind="stable")
    n = np.int64(g["n"].sum())
    cum = g["n"].to_numpy(dtype=np.int64).cumsum()
    bins = g["bin"].to_numpy(dtype=np.int64)
    row = {"lang": [g["lang"].iloc[0]],
           "n_docs": np.array([n], dtype=np.int64),
           "bin_w": np.array([HIST_BIN_W], dtype=np.int64)}
    for name, q in _HIST_QUANTILES:
        target = np.int64(np.floor(q * (n - 1))) + 1
        b = bins[np.searchsorted(cum, target)]
        row[name] = np.array([b * HIST_BIN_W], dtype=np.int64)
    return pd.DataFrame(row)[["lang", "n_docs", "bin_w", "est_p50_chars",
                              "est_p90_chars", "est_p99_chars"]]


def hist_length_quantiles(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs, bin_w, est_p50/p90/p99_chars): approximate
    per-language length quantiles from a mergeable fixed-width
    histogram. Combiner → ≤ #langs × #bins Sum shuffle → #langs tiny
    finalize groups; memory and shuffle volume are O(#bins), not
    O(#docs) — run this instead of the exact op when the corpus is
    100 TB and a ±bin_w answer is enough."""
    from ray.data.aggregate import Sum
    return (docs.select_columns(["lang", "n_chars"])
            .map_batches(_hist_partials, batch_format="pandas")
            .groupby(["lang", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .groupby("lang")
            .map_groups(_hist_finalize, batch_format="pandas"))


# ---- per-window distinct users (streaming-analytics HLL) ----

def hll_distinct_users(events: ray.data.Dataset) -> ray.data.Dataset:
    """(window_start, m, n_filled, est_distinct): HyperLogLog estimate
    of DISTINCT USERS per tumbling hour over the events stream — the
    streaming-analytics cardinality the reference's live counters
    approximate per queue (`lib/crawlerService.js` stats), generalized
    to event windows. Same O(#windows × m) register shuffle as the
    vocabulary sketch: an exact count-distinct would move every
    (window, user) pair; this moves at most m counter rows per window
    no matter how many events the window holds."""
    def registers(df: pd.DataFrame) -> pd.DataFrame:
        ws = (df["ts"].dt.floor("h").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        part = pd.DataFrame({"ws": ws, "uid": df["user_id"]
                             .to_numpy(dtype=np.int64)}).drop_duplicates()
        h = _hash_u64([str(int(u)) for u in part["uid"]])
        reg = (h >> np.uint64(HLL_W)).astype(np.int64)
        w = h & np.uint64((1 << HLL_W) - 1)
        nbits = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        nbits[nz] = np.floor(np.log2(w[nz].astype(np.float64))) \
            .astype(np.int64)
        too_hi = nz & ((np.uint64(1) << nbits.clip(0).astype(np.uint64)) > w)
        nbits[too_hi] -= 1
        too_lo = nz & ((np.uint64(2) << nbits.clip(0).astype(np.uint64))
                       <= w)
        nbits[too_lo] += 1
        rank = np.where(nz, HLL_W - nbits, HLL_W + 1).astype(np.int64)
        out = pd.DataFrame({"ws": part["ws"].to_numpy(dtype=np.int64),
                            "reg": reg, "rank": rank})
        g = out.groupby(["ws", "reg"], sort=False)["rank"].max() \
            .reset_index()
        g["rank"] = g["rank"].astype(np.int64)
        return g

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        out = _finalize(g, key="ws")
        out["window_start"] = out.pop("ws").astype(np.int64) \
            .astype("datetime64[us]")
        return out[["window_start", "m", "n_filled", "est_distinct"]]

    return (events.select_columns(["ts", "user_id"])
            .map_batches(registers, batch_format="pandas")
            .groupby(["ws", "reg"])
            .aggregate(Max("rank", alias_name="rank"))
            .groupby("ws")
            .map_groups(fin, batch_format="pandas"))


# ---- KMV (k-minimum-values) distinct sketch ----

KMV_K = 256                      # std err ~ 1/sqrt(k) ≈ 6%
_U64_SPAN = 1 << 64


def kmv_distinct_tokens(docs: ray.data.Dataset,
                        k: int = KMV_K) -> pd.DataFrame:
    """(lang, n_kept, est_distinct): K-minimum-values distinct-token
    estimate per language (Bar-Yossef et al. 2002) — the mergeable
    bottom-k sketch next to ``hll_distinct_tokens``: keep the k
    smallest distinct 64-bit hashes; D ≈ (k−1)·2⁶⁴ / h_(k). Below k
    distinct values the sketch IS the exact count (n_kept < k ⇒
    est = n_kept). Unlike HLL it also yields a uniform distinct-value
    SAMPLE (the kept hashes) for free.

    Exactness of the MIRROR: md5-derived u64 hashes, estimate = one
    integer floor division — DuckDB reproduces the estimate
    bit-for-bit; accuracy vs truth is pinned in pytest.

    Scale shape: per-batch combiner keeps each lang's k smallest
    distinct hashes (≤ #langs × k rows per batch); the fold pulls
    ≤ #langs × k × #blocks slim rows — never tokens."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = df["text"].astype(str).str.lower().str.findall(
            WS_TOKEN_RE)
        rows_l, rows_h = [], []
        for lang, g in pd.DataFrame({"lang": df["lang"].astype(str),
                                     "toks": tok_lists}).groupby(
                                         "lang", sort=False):
            toks = set()
            for tl in g["toks"]:
                toks.update(tl)
            h = np.unique(_hash_u64(sorted(toks)))[:k]
            rows_l.append(np.full(len(h), lang, dtype=object))
            rows_h.append(h)
        if not rows_h:
            return pd.DataFrame({"lang": np.empty(0, object),
                                 "hv": np.empty(0, np.int64)})
        return pd.DataFrame({
            "lang": np.concatenate(rows_l),
            "hv": np.concatenate(rows_h).view(np.int64)})  # signed reinterp

    rows = (docs.select_columns(["lang", "text"])
            .map_batches(partials, batch_format="pandas")
            .to_pandas())                  # ≤ langs × k × #blocks rows
    out = []
    for lang, g in rows.groupby("lang", sort=True):
        h = np.unique(g["hv"].to_numpy(np.int64).view(np.uint64))[:k]
        n_kept = len(h)
        if n_kept < k:
            est = n_kept
        else:
            est = (k - 1) * _U64_SPAN // int(h[-1])
        out.append((lang, n_kept, est))
    return pd.DataFrame({
        "lang": np.array([o[0] for o in out], dtype=object),
        "n_kept": np.array([o[1] for o in out], dtype=np.int64),
        "est_distinct": np.array([o[2] for o in out], dtype=np.int64)})


# ---- KMV-sketch vocabulary Jaccard between two corpora ----

KMV_J_FP = 10 ** 6


def kmv_vocab_jaccard(old: ray.data.Dataset, new: ray.data.Dataset,
                      k: int = KMV_K) -> pd.DataFrame:
    """One-row (n_kept, n_both, jaccard_fp): KMV-sketch estimate of the
    token-vocabulary Jaccard between two corpora — the k smallest
    distinct hashes of the UNION form an (exactly) uniform sample of
    the union, so |sample ∩ (A∩B)| / |sample| estimates |A∩B|/|A∪B|
    (Beyer et al. 2007). Below k union-distinct values the answer is
    EXACT. The corpus-level drift scalar next to ``snapshot_diff``'s
    per-doc statuses and ``corpus_ngram_overlap``'s containment.

    Exactness of the MIRROR: md5-u64 hashes, bottom-k by window
    row_number, one integer division — bit-exact. Scale shape: each
    side's per-batch combiner keeps its k smallest distinct hashes
    tagged by side; the fold is ≤ 2k × #blocks slim rows."""

    def side(tag: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            tok_lists = df["text"].astype(str).str.lower().str.findall(
                WS_TOKEN_RE)
            toks = set()
            for tl in tok_lists:
                toks.update(tl)
            h = np.unique(_hash_u64(sorted(toks)))[:k]
            return pd.DataFrame({
                "hv": h.view(np.int64),
                "side": np.full(len(h), tag, dtype=np.int8)})
        return f

    rows = (old.select_columns(["text"]).map_batches(
                side(0), batch_format="pandas")
            .union(new.select_columns(["text"]).map_batches(
                side(1), batch_format="pandas"))
            .to_pandas())                       # ≤ 2k × #blocks rows
    hv = rows["hv"].to_numpy(np.int64).view(np.uint64)
    sd = rows["side"].to_numpy(np.int8)
    union = np.unique(hv)[:k]                   # bottom-k of the union
    in_a = np.isin(union, np.unique(hv[sd == 0]), assume_unique=False)
    in_b = np.isin(union, np.unique(hv[sd == 1]), assume_unique=False)
    n_kept = len(union)
    n_both = int((in_a & in_b).sum())
    return pd.DataFrame({
        "n_kept": np.array([n_kept], dtype=np.int64),
        "n_both": np.array([n_both], dtype=np.int64),
        "jaccard_fp": np.array([KMV_J_FP * n_both // max(n_kept, 1)],
                               dtype=np.int64)})
