"""Sequence packing for LM training — the concat-and-chunk layout pass
that turns a deduped/filtered corpus into fixed-length training
sequences. Each document, in deterministic (lang, doc_id) stream order,
is assigned its absolute token offset in the per-language token stream
and therefore the training sequences it spans (GPT-style packing where
documents may straddle sequence boundaries).

Ray-Data-first shape — a distributed two-level prefix sum, the textbook
way to compute a global running total without a serial scan:
  1. slim pass: ``map_batches`` projects each doc to
     (lang, doc_id, n_tokens, bucket) — the text never shuffles;
  2. bucket totals: per-batch partial sums (combiner) → one tiny
     ``groupby(lang, bucket)`` aggregate whose result is #buckets rows
     (a JOB parameter via ``bucket_span``, independent of corpus size
     at fixed span; raise the span at 100 TB so the driver table stays
     ~10^4 rows), prefix-summed on the driver and broadcast;
  3. within-bucket offsets: ONE slim ``groupby(bucket % P)`` shuffle;
     inside each coarse partition the cumsum over all its buckets is
     vectorized across rows (no per-bucket task explosion).

Everything is int64 arithmetic (token counts, floor division) — no
floats — so the DuckDB window-function mirror in ``__ray_entry__`` is
bit-exact.

Reference context: the reference batches requests into fixed-size queue
messages (`providers/queuing/amqpQueue.js` push batching); packing is
the training-corpus analogue — fixed-size units cut from a deterministic
stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from .text import WS_TOKEN_RE

SEQ_LEN = 2048          # tokens per training sequence
BUCKET_SPAN = 64        # doc_ids per prefix-sum bucket (job parameter)
N_PACK_PARTS = 32


def _slim_batch(df: pd.DataFrame, span: int) -> pd.DataFrame:
    t = df["text"].astype(str)
    d = df["doc_id"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "lang": df["lang"].astype(str),
        "doc_id": d,
        "n_tokens": t.str.count(WS_TOKEN_RE).to_numpy(dtype=np.int64),
        "bucket": d // span,
    })


def pack_sequences(docs: ray.data.Dataset, seq_len: int = SEQ_LEN,
                   bucket_span: int = BUCKET_SPAN) -> ray.data.Dataset:
    """(lang, doc_id, n_tokens, start_off, start_seq, offset_in_seq,
    end_seq): absolute token offsets and sequence span of every document
    in the per-language concat-and-chunk stream ordered by doc_id.
    Zero-token docs occupy no stream space (end_seq = start_seq)."""
    slim = docs.map_batches(
        lambda df: _slim_batch(df, bucket_span),
        batch_format="pandas").materialize()

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "bucket"], sort=False)["n_tokens"] \
            .sum().reset_index()
        g["n_tokens"] = g["n_tokens"].astype(np.int64)
        return g

    totals = (slim.map_batches(bucket_partial, batch_format="pandas")
              .groupby(["lang", "bucket"])
              .aggregate(Sum("n_tokens", alias_name="n_tokens"))
              .to_pandas())
    # exclusive prefix per language over bucket order — #buckets rows,
    # tiny by construction (bucket_span is sized for that)
    totals = totals.sort_values(["lang", "bucket"], kind="stable")
    totals["prefix"] = (totals.groupby("lang", sort=False)["n_tokens"]
                        .cumsum() - totals["n_tokens"])
    offsets = ray.put({(l, int(b)): int(p) for l, b, p in
                       zip(totals["lang"], totals["bucket"],
                           totals["prefix"])})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets)
        g = g.sort_values(["lang", "bucket", "doc_id"], kind="stable")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        # within-(lang,bucket) exclusive cumsum, vectorized across the
        # whole coarse partition
        cum = (g.groupby(["lang", "bucket"], sort=False)["n_tokens"]
               .cumsum().to_numpy(dtype=np.int64)) - n
        base = np.fromiter(
            (off[(l, int(b))] for l, b in zip(g["lang"], g["bucket"])),
            dtype=np.int64, count=len(g))
        start = base + cum
        end = start + n
        end_seq = np.where(n > 0, (end - 1) // seq_len, start // seq_len)
        return pd.DataFrame({
            "lang": g["lang"].to_numpy(dtype=object),
            "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
            "n_tokens": n,
            "start_off": start,
            "start_seq": start // seq_len,
            "offset_in_seq": start % seq_len,
            "end_seq": end_seq,
        })

    parts = slim.map_batches(
        lambda df: df.assign(part=(df["bucket"] % N_PACK_PARTS)
                             .astype(np.int32)),
        batch_format="pandas")
    return parts.groupby("part").map_groups(
        lambda g: assign(g.drop(columns=["part"])), batch_format="pandas")


# ---- deterministic training-order shuffle (shard + position) ----

# A training run wants the corpus in a reproducible pseudo-random order,
# cut into shards a data loader can consume independently. Shard choice
# and within-shard order both derive from one md5 key, so the layout is
# stable under corpus appends and across reruns (same property as
# ``corpus.stratified_sample``). 60-bit keys (15 md5 hex chars) keep the
# value inside BIGINT so the DuckDB mirror needs no unsigned casts.
N_SHUFFLE_SHARDS = 16
SHUFFLE_KEY_HEX = 15
SHUFFLE_SALT = "shuf-"
SHUFFLE_BUCKET_BITS = 8      # 256 key-range buckets per shard
N_SHUFFLE_PARTS = 32


def _shuffle_keys(ids: np.ndarray) -> np.ndarray:
    from hashlib import md5
    return np.fromiter(
        (int(md5((SHUFFLE_SALT + str(i)).encode())
             .hexdigest()[:SHUFFLE_KEY_HEX], 16) for i in ids),
        dtype=np.int64, count=len(ids))


def shuffle_shards(docs: ray.data.Dataset,
                   n_shards: int = N_SHUFFLE_SHARDS) -> ray.data.Dataset:
    """(doc_id, shuffle_key, shard, pos_in_shard): deterministic global
    shuffle of the corpus into ``n_shards`` training shards. ``shard`` =
    key % n_shards; ``pos_in_shard`` ranks the shard by (key, doc_id).

    Scale shape — the same distributed two-level prefix sum as
    ``pack_sequences``, never a global sort: keys are uniform, so the
    top ``SHUFFLE_BUCKET_BITS`` bits of the key are a pre-sorted range
    bucket. Per-(shard, bucket) counts (combiner → tiny aggregate of
    ≤ shards×2^bits rows) prefix-sum on the driver; one slim
    co-partition pass ranks within each bucket vectorized and adds the
    bucket base. Raw text never enters the pipeline (doc_id-only slim).
    """
    shift = 4 * SHUFFLE_KEY_HEX - SHUFFLE_BUCKET_BITS

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        key = _shuffle_keys(ids)
        return pd.DataFrame({
            "doc_id": ids,
            "shuffle_key": key,
            "shard": key % np.int64(n_shards),
            "bucket": key >> np.int64(shift)})

    slim_ds = docs.select_columns(["doc_id"]) \
        .map_batches(slim, batch_format="pandas").materialize()

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["shard", "bucket"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    totals = (slim_ds.map_batches(counts, batch_format="pandas")
              .groupby(["shard", "bucket"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    totals = totals.sort_values(["shard", "bucket"], kind="stable")
    totals["prefix"] = (totals.groupby("shard", sort=False)["n"]
                        .cumsum() - totals["n"])
    base_ref = ray.put({(int(s), int(b)): int(p) for s, b, p in
                        zip(totals["shard"], totals["bucket"],
                            totals["prefix"])})

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(base_ref)
        g = g.sort_values(["shard", "bucket", "shuffle_key", "doc_id"],
                          kind="stable")
        within = (g.groupby(["shard", "bucket"], sort=False)
                  .cumcount().to_numpy(dtype=np.int64))
        off = np.fromiter(
            (base[(int(s), int(b))] for s, b in zip(g["shard"],
                                                    g["bucket"])),
            dtype=np.int64, count=len(g))
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
            "shuffle_key": g["shuffle_key"].to_numpy(dtype=np.int64),
            "shard": g["shard"].to_numpy(dtype=np.int64),
            "pos_in_shard": off + within})

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        combo = ((df["shard"].to_numpy(dtype=np.int64)
                  << np.int64(SHUFFLE_BUCKET_BITS))
                 + df["bucket"].to_numpy(dtype=np.int64))
        return df.assign(
            part=(combo % np.int64(N_SHUFFLE_PARTS)).astype(np.int32))

    parts = slim_ds.map_batches(add_part, batch_format="pandas")
    return parts.groupby("part").map_groups(
        lambda g: rank_part(g.drop(columns=["part"])),
        batch_format="pandas")


# ---- context-budget truncation stats ----

TRUNC_BUDGET = 48                # tokens per document


def truncation_stats(docs: ray.data.Dataset,
                     budget: int = TRUNC_BUDGET) -> pd.DataFrame:
    """(lang, n_docs, n_truncated, tokens_kept, tokens_lost): what a
    hard per-document token budget (context length / max_seq_len) costs
    per language — the "how much text do we throw away at L tokens"
    readout that decides between truncation and the ``pack_sequences``
    concat-and-chunk path. All integer.

    Scale shape: per-batch per-lang sum combiner (≤ #langs rows per
    batch) → driver fold; text never shuffles."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].astype(str).str.count(r"[^\s]+")
             .to_numpy(np.int64))
        kept = np.minimum(n, budget)
        out = pd.DataFrame({
            "lang": df["lang"].astype(str),
            "n_docs": 1,
            "n_truncated": (n > budget).astype(np.int64),
            "tokens_kept": kept, "tokens_lost": n - kept})
        return out.groupby("lang", sort=False, as_index=False).sum()

    rows = (docs.select_columns(["lang", "text"])
            .map_batches(partial, batch_format="pandas")
            .to_pandas())                    # ≤ #langs × #blocks rows
    out = rows.groupby("lang", sort=True).sum().reset_index()
    for c in ("n_docs", "n_truncated", "tokens_kept", "tokens_lost"):
        out[c] = out[c].astype(np.int64)
    out["lang"] = out["lang"].astype(object)
    return out


# ---- best-fit-decreasing whole-doc packing ----

def pack_best_fit(docs: ray.data.Dataset,
                  seq_len: int = SEQ_LEN) -> ray.data.Dataset:
    """(lang, doc_id, n_tokens, bin_id, truncated): whole-document
    bin packing into ``seq_len``-token training sequences by
    best-fit-decreasing — the packing used when documents must NOT be
    split across sequences (instruction tuning, contrastive pairs),
    trading some fill efficiency of ``pack_sequences``' concat-chunk
    stream for document integrity. Docs longer than ``seq_len`` get a
    bin of their own with ``truncated`` set; zero-token docs are
    dropped. Deterministic: docs considered by (n_tokens desc, doc_id
    asc); best fit = the open bin with the SMALLEST remaining capacity
    that still fits (ties → smallest bin_id); bin ids are per-language
    creation order.

    Scale shape: one slim (lang, doc_id, n_tokens) projection →
    per-LANGUAGE co-partition; the greedy is inherently sequential, so
    it runs shard-locally (bisect-maintained open-bin list, O(n log n)
    compares). Past per-lang feasibility, shard further by length band
    and accept per-band bin independence — bins never cross shards
    either way. No oracle SQL (stateful greedy); invariants pinned in
    pytest."""
    import bisect

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"].to_numpy(object),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tokens": df["text"].astype(str)
            .str.count(r"[^\s]+").to_numpy(np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["n_tokens"] > 0]
        g = g.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True], kind="stable")
        lang = g["lang"].iloc[0] if len(g) else ""
        open_bins: list[tuple[int, int]] = []   # (remaining, bin_id)
        next_bin = 0
        bin_ids = np.empty(len(g), dtype=np.int64)
        trunc = np.zeros(len(g), dtype=bool)
        for i, n in enumerate(g["n_tokens"].to_numpy(np.int64)):
            if n >= seq_len:
                bin_ids[i] = next_bin
                trunc[i] = n > seq_len
                next_bin += 1
                continue
            j = bisect.bisect_left(open_bins, (int(n), -1))
            if j < len(open_bins):
                rem, bid = open_bins.pop(j)
                bin_ids[i] = bid
                if rem - int(n) > 0:
                    bisect.insort(open_bins, (rem - int(n), bid))
            else:
                bin_ids[i] = next_bin
                bisect.insort(open_bins,
                              (seq_len - int(n), next_bin))
                next_bin += 1
        return pd.DataFrame({
            "lang": np.full(len(g), lang, dtype=object),
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": g["n_tokens"].to_numpy(np.int64),
            "bin_id": bin_ids, "truncated": trunc})

    return (docs.select_columns(["doc_id", "text", "lang"])
            .map_batches(slim, batch_format="pandas")
            .groupby("lang").map_groups(fold, batch_format="pandas"))
