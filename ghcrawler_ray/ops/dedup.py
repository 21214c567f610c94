"""Deduplication family over the ``documents`` table: exact content hash,
MinHash+LSH, SimHash, and exact n-gram Jaccard pairs.

Ray-Data-first shapes (and their 100 TB scale paths):
- exact: md5(text) in ``map_batches`` → ``groupby(content_hash)`` keep-min —
  one hash-partition shuffle of slim (hash, id) rows, the same
  hash-partition + first-per-group pattern as the crawl's etag dedup
  (`providers/fetcher/githubFetcher.js:26-84` analogue).
- MinHash-LSH: shingle → 64 minhashes → 8 bands × 8 rows; explode to
  (band, band_hash, doc_id) rows → ``groupby(band, band_hash)`` emits
  candidate pairs, deduped across bands with an AGGREGATE (one Python
  task per reduce partition, never per pair). The verify stage never
  materializes shingle sets: only the candidate PAIR LIST (output-sized)
  is broadcast; documents stream once more emitting slim
  (pair_id, shingle_hash) rows, and two aggregates compute exact
  intersection/union counts → Jaccard. No ``take_all`` of corpus data.
- SimHash: 64-bit sign-sum signature in ``map_batches``; candidates via
  4 × 16-bit chunk buckets (Hamming ≤ 3 ⇒ some chunk equal by pigeonhole
  over 4 chunks), verified by exact Hamming distance; cross-chunk pair
  dedup is an aggregate (Min), not a per-pair group task.
- n-gram Jaccard: exact all-pairs within (lang, shingle-count band)
  blocks. Geometric (power-of-2) bands are COMPLETE for the threshold:
  J(A,B) ≥ t ⇒ |A|/|B| ≤ 1/t ≤ 2, so every qualifying pair falls in the
  same or adjacent band; each doc is emitted to its own and the next
  band, and a pair is evaluated only in block max(band_a, band_b).

All hashing is md5-derived (deterministic across processes, no RNG) so
every stage — minhash seeds, band keys, simhash bits — is reproducible
bit-for-bit by the DuckDB oracle (`('0x'||substr(md5(s),1,16))::UBIGINT`
plus HUGEINT mod-2^64 affine arithmetic); minhash_lsh_pairs and
simhash_pairs therefore get FULL value-hash correctness checks, not
rows-only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from .text import WS_TOKEN_RE

SHINGLE_K = 3            # 3-token shingles (standard for web-text dedup)
N_MINHASH = 64
LSH_BANDS = 8            # 8 bands x 8 rows
JACCARD_THRESHOLD = 0.5
SIMHASH_CHUNKS = 4       # 4 x 16-bit chunks -> catches Hamming <= 3
HAMMING_THRESHOLD = 3

_WS_RE = re.compile(WS_TOKEN_RE)


# ---- shared scalar kernels ----

def shingle_set(text: str, k: int = SHINGLE_K) -> set[str]:
    """Distinct k-token shingles of lowercased ws-tokens — mirrored by the
    DuckDB oracle's list_transform/range expression (1:1 token windows)."""
    toks = _WS_RE.findall(text.lower())
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _hash64_str(values: list[str]) -> np.ndarray:
    """First 8 bytes of md5 as big-endian uint64 — the one string-hash
    primitive shared by minhash/simhash, chosen because DuckDB computes
    the identical value as ('0x' || substr(md5(s),1,16))::UBIGINT, which
    makes the whole LSH family SQL-oracle-checkable."""
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(v.encode()).digest()[:8], "big")
         for v in values), dtype=np.uint64, count=len(values))


def _affine_seeds() -> tuple[np.ndarray, np.ndarray]:
    """Per-minhash affine coefficients h_i = (A_i*h + B_i) mod 2^64.
    A_i odd and < 2^32 (so A*h < 2^96 fits DuckDB's HUGEINT exactly),
    derived deterministically from md5 — no RNG."""
    a = _hash64_str([f"minhash-A-{i}" for i in range(N_MINHASH)])
    b = _hash64_str([f"minhash-B-{i}" for i in range(N_MINHASH)])
    mask = np.uint64(0xFFFFFFFF)
    return (a & mask) | np.uint64(1), b & mask


MINHASH_A, MINHASH_B = _affine_seeds()


def minhash_signature(shingles: set[str]) -> np.ndarray:
    """64 minhashes: one md5 per shingle, then 64 affine universal hashes
    (A_i*h+B_i mod 2^64) vectorized in numpy wrap-around uint64 — the
    exact arithmetic the DuckDB mirror reproduces with HUGEINT % 2^64."""
    if not shingles:
        return np.full(N_MINHASH, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    h = _hash64_str(sorted(shingles))
    with np.errstate(over="ignore"):
        x = h[:, None] * MINHASH_A[None, :] + MINHASH_B[None, :]
    return x.min(axis=0)


def simhash64(text: str) -> int:
    toks = _WS_RE.findall(text.lower())
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    h = _hash64_str(list(uniq))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    score = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    sig = np.uint64(0)
    for i in np.flatnonzero(score > 0):
        sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ---- exact dedup ----

def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(content_hash, keep_doc_id, n_copies): keep-first (min doc_id) per
    md5(text). Partial per-batch hashing, one slim groupby shuffle."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        ch = pd.Series([hashlib.md5(t.encode()).hexdigest()
                        for t in df["text"].astype(str)])
        # coarse int co-partition (md5-STRING groupbys sort-shuffle the
        # full text key space; the int fold is 5x faster at sf0.1)
        return pd.DataFrame({
            "part": (_hash64_str(ch.tolist()).view(np.int64) % 64)
            .astype(np.int32),
            "content_hash": ch.to_numpy(),
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", sort=False).agg(
            keep_doc_id=("doc_id", "min"),
            n_copies=("doc_id", "size")).reset_index()
        out["keep_doc_id"] = out["keep_doc_id"].astype(np.int64)
        out["n_copies"] = out["n_copies"].astype(np.int64)
        return out[["content_hash", "keep_doc_id", "n_copies"]]

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(add_hash, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- MinHash + LSH ----

def _band_rows(df: pd.DataFrame) -> pd.DataFrame:
    """documents batch → exploded (band, band_hash, doc_id) rows."""
    rows_per_band = N_MINHASH // LSH_BANDS
    ids, bands, bhashes = [], [], []
    for doc_id, text in zip(df["doc_id"].astype(np.int64), df["text"].astype(str)):
        sig = minhash_signature(shingle_set(text))
        for b in range(LSH_BANDS):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            # band key = md5_u64 of the comma-joined decimal minhashes,
            # >>1 to stay in signed int64 — mirrored by the SQL oracle's
            # string_agg(mh, ',' ORDER BY seed)
            key = ",".join(str(int(v)) for v in chunk)
            ids.append(doc_id)
            bands.append(b)
            bhashes.append(int(_hash64_str([key])[0] >> np.uint64(1)))
    return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                         "band": np.array(bands, dtype=np.int32),
                         "band_hash": np.array(bhashes, dtype=np.int64)})


N_BUCKET_PARTS = 64      # coarse shuffle key: bucket-hash % parts

#: Bounded local verify (the engine's local_wave_threshold pattern):
#: candidate pairs are OUTPUT-sized, so when they touch at most this
#: many docs, one remote task verifies them against the candidate docs'
#: texts (gathered as slim filtered Arrow blocks, no shuffle) instead of
#: paying the streaming verify's explode + groupby barrier. The
#: streaming path below remains the scale path.
VERIFY_LOCAL_MAX_DOCS = 100_000

#: Candidate-pair driver ceiling. The pair list is output-sized in the
#: common case, but on a duplication-heavy crawl it is the LARGEST
#: intermediate — above this bound the candidates never leave the
#: cluster: cross-band dedup happens via a (doc_a, doc_b) AGGREGATE and
#: a tagged-union co-partition join on doc_id feeds the streaming
#: verify with no driver round-trip (``_minhash_verify_streaming``).
#: ``test_scale_paths`` pins the dormant path output-equal.
PAIR_LOCAL_MAX = 5_000_000


@ray.remote
def _verify_pairs_local(pairs: np.ndarray, threshold: float,
                        *blocks) -> pd.DataFrame:
    """Single-task exact-Jaccard verify: same int intersection/union
    counts and the same one float division as the streaming verify —
    bit-identical output."""
    texts: dict[int, str] = {}
    for t in blocks:
        df = t.to_pandas()
        texts.update(zip(df["doc_id"].astype(np.int64),
                         df["text"].astype(str)))
    sh_cache: dict[int, set[str]] = {}

    def sh(d: int) -> set[str]:
        if d not in sh_cache:
            sh_cache[d] = shingle_set(texts[d])
        return sh_cache[d]

    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        j = jaccard(sh(int(a)), sh(int(b)))
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(j)
    return pd.DataFrame({"doc_a": np.array(out_a, dtype=np.int64),
                         "doc_b": np.array(out_b, dtype=np.int64),
                         "jaccard": np.array(out_j, dtype=np.float64)})


def _bucket_part_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One COARSE partition = many LSH buckets; pairs are emitted with a
    python loop over bucket SEGMENTS (numpy triu inside each), never one
    Ray task per bucket — per-(band,band_hash) map_groups ran one Python
    task per distinct bucket (~8×n_docs tasks, the project's measured
    per-group-task pitfall; 18.6 s for 5 k docs at sf0.1)."""
    g = g.sort_values(["band", "band_hash", "doc_id"],
                      kind="stable").reset_index(drop=True)
    band = g["band"].to_numpy(dtype=np.int64)
    bh = g["band_hash"].to_numpy(dtype=np.int64)
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    new_seg = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        new_seg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(new_seg)
    ends = np.concatenate([starts[1:], [len(g)]])
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        seg = np.unique(ids[s:e])
        if len(seg) < 2:
            continue
        ia, ib = np.triu_indices(len(seg), k=1)
        out_a.append(seg[ia])
        out_b.append(seg[ib])
    if not out_a:
        return pd.DataFrame({"doc_a": np.empty(0, np.int64),
                             "doc_b": np.empty(0, np.int64)})
    return pd.DataFrame({"doc_a": np.concatenate(out_a),
                         "doc_b": np.concatenate(out_b)})


def _add_bpart(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bpart"] = (df["band_hash"].to_numpy(dtype=np.int64)
                   % N_BUCKET_PARTS).astype(np.int32)
    return df


def lsh_candidate_pairs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Unique MinHash-LSH candidate pairs (doc_a < doc_b): band explode →
    coarse-partition segment-vectorized bucket all-pairs → cross-band
    dedup via AGGREGATE (no per-pair, no per-bucket task).
    ``minhash_lsh_pairs`` inlines the same stages but dedups the pair
    list driver-side (it materializes the candidates anyway)."""
    return (docs.select_columns(["doc_id", "text"])
            .map_batches(_band_rows, batch_format="pandas")
            .map_batches(_add_bpart, batch_format="pandas")
            # materialize the slim band rows: fusing the doc scan with
            # the bucket all-to-all in one execution runs several times
            # slower than two executions (the repo's measured pattern)
            .materialize()
            .groupby("bpart")
            .map_groups(_bucket_part_pairs, batch_format="pandas")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="n_bands")))


def _pair_vpart(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic coarse verify partition for a (doc_a, doc_b) pair —
    an int mix (golden-ratio multiply + xor-shift) so hot doc_a values
    don't skew one partition."""
    x = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
        ^ b.astype(np.uint64)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(N_BUCKET_PARTS)).astype(np.int32)


def _minhash_verify_streaming(docs: ray.data.Dataset,
                              cand_ds: ray.data.Dataset,
                              threshold: float) -> ray.data.Dataset:
    """Dormant scale path of :func:`minhash_lsh_pairs` (pair count >
    ``PAIR_LOCAL_MAX``): candidates never leave the cluster. Cross-band
    pair dedup is a (doc_a, doc_b) AGGREGATE; then a tagged-union
    co-partition on ``doc_id % N_BUCKET_PARTS`` joins each candidate
    doc's shingle hashes onto its pair sides (pairs × shingles merge
    per partition, vectorized), and the verify regroups by pair
    (``_pair_vpart``) running the identical duplicated-count
    inter/union math keyed by (doc_a, doc_b) — bit-identical jaccard.
    Non-candidate docs' shingle rows are dropped at the join; on a
    dup-heavy corpus (the only regime that reaches this path) the
    candidate docs dominate, so the extra shuffled volume is small."""
    pairs = cand_ds.groupby(["doc_a", "doc_b"]) \
        .aggregate(Count(alias_name="n_bands"))

    def sides(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        did = np.concatenate([a, b])
        return pd.DataFrame({
            "dpart": (did % N_BUCKET_PARTS).astype(np.int32),
            "doc_id": did,
            "doc_a": np.concatenate([a, a]),
            "doc_b": np.concatenate([b, b]),
            "kind": np.zeros(len(did), np.int8),
            "sh_hash": np.zeros(len(did), np.int64)})

    def shingles(df: pd.DataFrame) -> pd.DataFrame:
        ids_out, hs_out = [], []
        for doc_id, text in zip(df["doc_id"].astype(np.int64),
                                df["text"].astype(str)):
            sh = sorted(shingle_set(text))
            if not sh:
                continue
            hs = _hash64_str(sh).view(np.int64)
            ids_out.append(np.full(len(hs), doc_id, np.int64))
            hs_out.append(hs)
        did = np.concatenate(ids_out) if ids_out else np.empty(0, np.int64)
        hs = np.concatenate(hs_out) if hs_out else np.empty(0, np.int64)
        return pd.DataFrame({
            "dpart": (did % N_BUCKET_PARTS).astype(np.int32),
            "doc_id": did,
            "doc_a": np.zeros(len(did), np.int64),
            "doc_b": np.zeros(len(did), np.int64),
            "kind": np.ones(len(did), np.int8),
            "sh_hash": hs})

    tagged = pairs.map_batches(sides, batch_format="pandas").union(
        docs.select_columns(["doc_id", "text"])
        .map_batches(shingles, batch_format="pandas"))

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        side = g[g["kind"] == 0]
        sh = g[g["kind"] == 1]
        if not len(side) or not len(sh):
            return pd.DataFrame({"vpart": np.empty(0, np.int32),
                                 "doc_a": np.empty(0, np.int64),
                                 "doc_b": np.empty(0, np.int64),
                                 "sh_hash": np.empty(0, np.int64)})
        m = side[["doc_id", "doc_a", "doc_b"]].merge(
            sh[["doc_id", "sh_hash"]], on="doc_id")
        a = m["doc_a"].to_numpy(np.int64)
        b = m["doc_b"].to_numpy(np.int64)
        return pd.DataFrame({"vpart": _pair_vpart(a, b),
                             "doc_a": a, "doc_b": b,
                             "sh_hash": m["sh_hash"].to_numpy(np.int64)})

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        """Same math as the broadcast path's verify_part, keyed by the
        pair itself instead of a driver-assigned pair_id."""
        inter_hit = g.duplicated(["doc_a", "doc_b", "sh_hash"]).to_numpy()
        per = pd.DataFrame({"doc_a": g["doc_a"].to_numpy(np.int64),
                            "doc_b": g["doc_b"].to_numpy(np.int64),
                            "inter": inter_hit.astype(np.int64)}) \
            .groupby(["doc_a", "doc_b"], sort=False).agg(
                inter=("inter", "sum"), total=("inter", "size"))
        inter = per["inter"].to_numpy(dtype=np.int64)
        union = per["total"].to_numpy(dtype=np.int64) - inter
        ok = union > 0
        j = np.zeros(len(per), dtype=np.float64)
        j[ok] = inter[ok] / union[ok]
        keep = ok & (j >= threshold)
        idx = per.index.to_frame(index=False)
        return pd.DataFrame({
            "doc_a": idx["doc_a"].to_numpy(np.int64)[keep],
            "doc_b": idx["doc_b"].to_numpy(np.int64)[keep],
            "jaccard": j[keep]})

    return (tagged.groupby("dpart")
            .map_groups(join_part, batch_format="pandas")
            .groupby("vpart")
            .map_groups(verify_part, batch_format="pandas"))


def minhash_lsh_pairs(docs: ray.data.Dataset,
                      threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard) pairs with exact-verified 3-token-shingle
    Jaccard ≥ threshold, candidates from 8x8 MinHash-LSH banding.

    Scale shape: the only driver-side materialization is the candidate
    PAIR LIST — output-sized in the common case, and GATED by
    ``PAIR_LOCAL_MAX``: above the bound the pairs stay a Dataset and
    :func:`_minhash_verify_streaming` runs the whole op cluster-side
    (aggregate dedup + co-partition join), no driver round-trip.
    Shingle sets are never collected: documents
    stream once more, emitting (pair_id, shingle_hash) rows only for docs
    that appear in a candidate pair; ONE co-partitioned group pass
    (``pair_id % N_BUCKET_PARTS``) then computes |A∩B| (hashes seen from
    both sides) and |A∪B| = |A|+|B|−|A∩B| vectorized across all of a
    partition's pairs, and jaccard = inter/union in one int/int division
    (bit-identical to the scalar form). Cross-band pair dedup happens on
    the already-materialized candidate list (a set-dedup of output-sized
    data), so the whole op is exactly two shuffle executions: the LSH
    bucket groupby and the verify groupby."""
    cand_ds = (docs.select_columns(["doc_id", "text"])
               .map_batches(_band_rows, batch_format="pandas")
               .map_batches(_add_bpart, batch_format="pandas")
               .materialize()       # see lsh_candidate_pairs note
               .groupby("bpart")
               .map_groups(_bucket_part_pairs, batch_format="pandas")
               .materialize())
    if cand_ds.count() > PAIR_LOCAL_MAX:
        return _minhash_verify_streaming(docs, cand_ds, threshold)
    cand = cand_ds.take_all()
    if not cand:
        return ray.data.from_pandas(pd.DataFrame(
            {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64),
             "jaccard": np.empty(0, np.float64)}))
    pairs = sorted({(int(r["doc_a"]), int(r["doc_b"])) for r in cand})

    # bounded local verify: candidate pairs touch few docs → gather the
    # candidate docs' (doc_id, text) as filtered Arrow block refs (one
    # streaming pass, no shuffle) and verify in one task
    cand_ids = np.unique(np.array(pairs, dtype=np.int64).ravel())
    if len(cand_ids) <= VERIFY_LOCAL_MAX_DOCS:
        ids_ref = ray.put(cand_ids)

        def keep_cand(df: pd.DataFrame):
            # return a typed Arrow table: Ray's pandas block-size
            # estimator np.vectorize()s object columns and warns on
            # every empty (fully filtered) block; Arrow sizing is exact
            if len(df):
                ids = ray.get(ids_ref)
                d = df["doc_id"].to_numpy(np.int64)
                pos = np.searchsorted(ids, d)
                np.minimum(pos, len(ids) - 1, out=pos)
                df = df.loc[ids[pos] == d]
            else:
                df = df.iloc[0:0]
            return pa.table({
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64),
                                   type=pa.int64()),
                "text": pa.array(df["text"].astype(str).tolist(),
                                 type=pa.string())})

        blocks = (docs.select_columns(["doc_id", "text"])
                  .map_batches(keep_cand, batch_format="pandas")
                  .to_arrow_refs())
        return ray.data.from_pandas_refs([_verify_pairs_local.remote(
            np.array(pairs, dtype=np.int64), threshold, *blocks)])

    doc_pairs: dict[int, list[int]] = {}
    for pid, (a, b) in enumerate(pairs):
        doc_pairs.setdefault(a, []).append(pid)
        doc_pairs.setdefault(b, []).append(pid)
    dp_ref = ray.put(doc_pairs)

    pairs_ref = ray.put(np.array(pairs, dtype=np.int64))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        dp = ray.get(dp_ref)
        pid_out, hash_out = [], []
        for doc_id, text in zip(df["doc_id"].astype(np.int64),
                                df["text"].astype(str)):
            pids = dp.get(int(doc_id))
            if not pids:
                continue
            hs = _hash64_str(sorted(shingle_set(text))).view(np.int64)
            for pid in pids:
                pid_out.append(np.full(len(hs), pid, dtype=np.int64))
                hash_out.append(hs)
        if not pid_out:
            return pd.DataFrame({"vpart": np.empty(0, np.int32),
                                 "pair_id": np.empty(0, np.int64),
                                 "sh_hash": np.empty(0, np.int64)})
        pid = np.concatenate(pid_out)
        return pd.DataFrame({"vpart": (pid % N_BUCKET_PARTS).astype(np.int32),
                             "pair_id": pid,
                             "sh_hash": np.concatenate(hash_out)})

    def verify_part(g: pd.DataFrame, _pairs=pairs_ref) -> pd.DataFrame:
        """One coarse partition = all shingle rows of many pairs.
        total = |A|+|B| rows per pair; inter = hashes contributed by
        BOTH sides (each side's hashes are distinct, so a (pair, hash)
        seen twice is an intersection hit) — all vectorized."""
        pairs_arr = ray.get(_pairs)
        inter_hit = g.duplicated(["pair_id", "sh_hash"]).to_numpy()
        per = pd.DataFrame({"pair_id": g["pair_id"].to_numpy(np.int64),
                            "inter": inter_hit.astype(np.int64)}) \
            .groupby("pair_id", sort=False).agg(
                inter=("inter", "sum"), total=("inter", "size"))
        pid = per.index.to_numpy(dtype=np.int64)
        inter = per["inter"].to_numpy(dtype=np.int64)
        union = per["total"].to_numpy(dtype=np.int64) - inter
        ok = union > 0
        j = np.zeros(len(per), dtype=np.float64)
        j[ok] = inter[ok] / union[ok]
        keep = ok & (j >= threshold)
        return pd.DataFrame({"doc_a": pairs_arr[pid[keep], 0],
                             "doc_b": pairs_arr[pid[keep], 1],
                             "jaccard": j[keep]})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(explode, batch_format="pandas")
            .groupby("vpart")
            .map_groups(verify_part, batch_format="pandas"))


# ---- SimHash ----

def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "simhash": np.array([simhash64(t) for t in df["text"].astype(str)],
                                dtype=np.uint64).view(np.int64),
        })
    return docs.select_columns(["doc_id", "text"]).map_batches(
        sig_batch, batch_format="pandas")


def simhash_pairs(docs: ray.data.Dataset,
                  max_hamming: int = HAMMING_THRESHOLD) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming) with Hamming(simhash) ≤ max_hamming.
    Candidates: equal 16-bit chunk (pigeonhole over 4 chunks ⇒ complete
    for Hamming ≤ 3); verify exact popcount."""
    sigs = simhash_signatures(docs)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = df["simhash"].to_numpy().view(np.uint64)
        out = []
        for c in range(SIMHASH_CHUNKS):
            chunk = ((s >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                                     "simhash": df["simhash"],
                                     "chunk": np.int32(c), "chunk_val": chunk,
                                     "cpart": (chunk % N_BUCKET_PARTS)
                                     .astype(np.int32)}))
        return pd.concat(out, ignore_index=True)

    def bucket_part(g: pd.DataFrame) -> pd.DataFrame:
        """COARSE partition = many (chunk, chunk_val) buckets; exact
        popcount verify per bucket segment, vectorized — never one Ray
        task per bucket (same pitfall as the minhash bucket stage)."""
        g = g.drop_duplicates(["chunk", "chunk_val", "doc_id"]) \
            .sort_values(["chunk", "chunk_val", "doc_id"],
                         kind="stable").reset_index(drop=True)
        ck = g["chunk"].to_numpy(dtype=np.int64)
        cv = g["chunk_val"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sig = g["simhash"].to_numpy().view(np.uint64)
        new_seg = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_seg[1:] = (ck[1:] != ck[:-1]) | (cv[1:] != cv[:-1])
        starts = np.flatnonzero(new_seg)
        ends = np.concatenate([starts[1:], [len(g)]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            ia, ib = np.triu_indices(n, k=1)
            x = sig[s:e][ia] ^ sig[s:e][ib]
            ham = np.array([bin(int(v)).count("1") for v in x],
                           dtype=np.int64)
            keep = ham <= max_hamming
            out_a.append(ids[s:e][ia[keep]])
            out_b.append(ids[s:e][ib[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame({"doc_a": np.empty(0, np.int64),
                                 "doc_b": np.empty(0, np.int64),
                                 "hamming": np.empty(0, np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    def drop_aux(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_a", "doc_b", "hamming"]]

    # cross-chunk pair dedup is an AGGREGATE (a pair found in several
    # chunk buckets has the same hamming everywhere, so Min == the value);
    # the round-1 groupby().map_groups(head) ran one Python task per pair
    return (sigs.map_batches(explode, batch_format="pandas")
            .groupby("cpart")
            .map_groups(bucket_part, batch_format="pandas")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming"))
            .map_batches(drop_aux, batch_format="pandas"))


# ---- exact n-gram Jaccard pairs (verification-path dedup) ----

def ngram_jaccard_pairs(docs: ray.data.Dataset,
                        threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard ≥ threshold), exact, within same ``lang``.
    SQL-oracle-checkable: the DuckDB mirror builds the same shingle lists
    with list_transform and joins on lang only — the extra length-band
    blocking here changes NOTHING in the output, it only bounds block
    size:

    J(A,B) ≥ t ⇒ |A|/|B| ≤ 1/t ≤ 2 (t ≥ 0.5), so with geometric bands
    band = floor(log2(n_shingles)) every qualifying pair lies in the same
    or adjacent band. Each doc is emitted into its own band and the next
    one, and a pair is evaluated only in block max(band_a, band_b), so
    each pair is counted exactly once and no qualifying pair is missed.
    Block key = (lang, band): all-pairs work is O(Σ block²) instead of
    O(Σ lang-block²)."""
    assert threshold >= 0.5, "geometric banding assumes |A|/|B| <= 2"

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype(np.int64)
        texts = df["text"].astype(str)
        sets = [sorted(shingle_set(t)) for t in texts]
        n = np.array([max(len(s), 1) for s in sets], dtype=np.int64)
        band = np.floor(np.log2(n)).astype(np.int32)
        out = pd.DataFrame({"doc_id": ids, "lang": df["lang"].astype(str),
                            "band": band, "own_band": band, "sh": sets})
        up = out.copy()
        up["band"] = up["band"] + 1
        return pd.concat([out, up], ignore_index=True)

    def block(g: pd.DataFrame) -> pd.DataFrame:
        blk = int(g["band"].iloc[0])
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        own = g["own_band"].to_numpy(dtype=np.int64)
        sets = [set(s) for s in g["sh"]]
        rows = []
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                if ids[i] == ids[k] or max(own[i], own[k]) != blk:
                    continue  # evaluated in the pair's own max-band block
                j = jaccard(sets[i], sets[k])
                if j >= threshold:
                    rows.append((ids[i], ids[k], j))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) \
            if rows else pd.DataFrame({"doc_a": np.empty(0, np.int64),
                                       "doc_b": np.empty(0, np.int64),
                                       "jaccard": np.empty(0, np.float64)})

    return (docs.select_columns(["doc_id", "lang", "text"])
            .map_batches(to_bands, batch_format="pandas")
            .groupby(["lang", "band"]).map_groups(block, batch_format="pandas"))


# ---- near-dup clustering: connected components over the LSH pair graph ----

CC_MAX_ROUNDS = 32        # safety bound ≫ any real dup-cluster diameter
N_NODE_PARTS = 16         # co-partition key count — a FIXED job parameter
                          # (like the engine's n_polite_parts): per-shuffle
                          # fixed cost scales with it, so it is sized for
                          # the sandbox; a real cluster raises it


#: Bounded local fold (the engine's local_wave_threshold pattern): the
#: pair graph is OUTPUT-sized (verified near-dup pairs), so below this
#: many edges one remote task computes components directly — the BSP
#: path below exists for when the dup graph itself is distributed-scale.
CC_LOCAL_MAX_EDGES = 4_000_000


@ray.remote
def _cc_local(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Single-task min-label connected components: edge relaxation +
    pointer jumping (labels are node ids, so a label can be chased one
    hop per round) until fixpoint — identical labels to the BSP path
    (min doc_id of the component)."""
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    label = nodes.copy()
    while True:
        m = np.minimum(label[ia], label[ib])
        new = label.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        new = np.minimum(new, label[np.searchsorted(nodes, new)])
        if np.array_equal(new, label):
            break
        label = new
    return pd.DataFrame({"node": nodes, "label": label})


def _cc_labels(edges_df: ray.data.Dataset,
               n_edges: int | None = None) -> ray.data.Dataset:
    """Distributed min-label propagation over (doc_a, doc_b) edges →
    (node, label) with label = min doc_id of the node's component.

    Below ``CC_LOCAL_MAX_EDGES`` (pair graphs are output-sized) the fold
    runs in ONE remote task (`_cc_local`) instead of paying ~2 barrier
    executions per BSP round on a few hundred rows.

    Delta-based BSP with ONE shuffle per round: every row — current
    labels, edge endpoints, and in-flight messages — is keyed by
    ``part = node % N_NODE_PARTS``, so a single ``groupby('part')``
    co-locates a node's label, its adjacency AND the candidates sent to
    it. Inside the group (all vectorized pandas, no per-node Python):
    fold candidates into labels with a min; nodes whose label DECREASED
    emit their new label to their neighbors (addressed to the
    neighbor's part — next round's shuffle delivers it). Messages stop
    flowing exactly at convergence, so the loop exits when a round
    emits none (rounds ≈ component diameter + 1; LSH dup clusters are
    near-cliques, so 2-3 in practice).

    Everything here is #dup-endpoint-sized (output scale), never corpus
    scale; per-round state is materialized (slim int columns) to keep
    each round one execution instead of a growing lineage chain."""
    if n_edges is None:
        n_edges = edges_df.count()
    if n_edges <= CC_LOCAL_MAX_EDGES:
        pairs = edges_df.to_pandas()
        return ray.data.from_pandas_refs([_cc_local.remote(
            pairs["doc_a"].to_numpy(np.int64),
            pairs["doc_b"].to_numpy(np.int64))])

    def init_state(df: pd.DataFrame) -> pd.DataFrame:
        """Edge rows + an initial self-label message per endpoint (no
        label rows yet ⇒ round 1 treats every fold as a decrease and
        seeds the propagation)."""
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        node = np.concatenate([a, b])
        other = np.concatenate([b, a])
        edges = pd.DataFrame({
            "part": (node % N_NODE_PARTS).astype(np.int32),
            "node": node, "other": other,
            "label": np.full(len(node), -1, dtype=np.int64),
            "is_msg": np.zeros(len(node), dtype=np.int8)})
        seeds = pd.DataFrame({
            "part": edges["part"], "node": node,
            "other": np.full(len(node), -1, dtype=np.int64),
            "label": node,
            "is_msg": np.ones(len(node), dtype=np.int8)})
        return pd.concat([edges, seeds], ignore_index=True)

    state = edges_df.map_batches(init_state, batch_format="pandas") \
        .materialize()

    def step(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["other"] >= 0]
        cand = g[g["other"] < 0]             # label rows ∪ messages
        folded = cand.groupby("node", sort=False)["label"].min()
        old = cand[cand["is_msg"] == 0].set_index("node")["label"]
        old = old.reindex(folded.index)      # NaN ⇒ node had no label yet
        dec = folded[old.isna() | (folded < old)]
        n = len(folded)
        labels_out = pd.DataFrame({
            "part": (folded.index.to_numpy(dtype=np.int64)
                     % N_NODE_PARTS).astype(np.int32),
            "node": folded.index.to_numpy(dtype=np.int64),
            "other": np.full(n, -1, dtype=np.int64),
            "label": folded.to_numpy(dtype=np.int64),
            "is_msg": np.zeros(n, dtype=np.int8)})
        m = e[["node", "other"]].merge(
            dec.rename("label"), left_on="node", right_index=True)
        msgs_out = pd.DataFrame({
            "part": (m["other"].to_numpy(dtype=np.int64)
                     % N_NODE_PARTS).astype(np.int32),
            "node": m["other"].to_numpy(dtype=np.int64),
            "other": np.full(len(m), -1, dtype=np.int64),
            "label": m["label"].to_numpy(dtype=np.int64),
            "is_msg": np.ones(len(m), dtype=np.int8)})
        return pd.concat(
            [e[["part", "node", "other", "label", "is_msg"]],
             labels_out, msgs_out], ignore_index=True)

    for _ in range(CC_MAX_ROUNDS):
        state = state.groupby("part") \
            .map_groups(step, batch_format="pandas").materialize()
        if state.sum("is_msg") == 0:
            break

    def final_labels(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[(df["other"] < 0) & (df["is_msg"] == 0)]
        return pd.DataFrame({"node": lab["node"].astype(np.int64),
                             "label": lab["label"].astype(np.int64)})

    return state.map_batches(final_labels, batch_format="pandas")


def dup_clusters(docs: ray.data.Dataset,
                 threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """(doc_id, cluster_id, cluster_size, keep): near-duplicate clusters
    = connected components of the verified MinHash-LSH pair graph
    (jaccard ≥ threshold), cluster_id = min doc_id of the component,
    keep = 1 iff the doc is its cluster's canonical representative —
    the standard "near-dedup then keep one per cluster" corpus pass.
    Docs in no pair are size-1 clusters of themselves.

    Two shuffles after the component labels: (1) docs ∪ labels
    co-partitioned by doc_id hash assigns every doc its cluster_id;
    (2) re-keying by cluster_id co-locates whole clusters, so
    cluster_size and the keep flag are computed INSIDE that one group
    pass (no separate size aggregate + join-back).

    Mirrored by a recursive-CTE DuckDB oracle (transitive-closure min
    label), so the whole chain — banding, verification, clustering — is
    value-checked end to end."""
    edges = minhash_lsh_pairs(docs, threshold) \
        .select_columns(["doc_a", "doc_b"]).materialize()
    n_edges = edges.count()
    has_edges = n_edges > 0
    labels = _cc_labels(edges, n_edges) if has_edges else None

    # broadcast fast path: the label table is output-sized (one row per
    # dup-graph ENDPOINT, not per doc). Below the bound, ship it once
    # via ray.put and assign cluster_id/size/keep in a single streaming
    # pass over docs — zero shuffles. Cluster sizes are derivable from
    # the label table alone: labeled clusters count their endpoint rows,
    # everything else is a size-1 singleton of itself.
    if not has_edges or labels.count() <= CC_LOCAL_MAX_EDGES:
        if has_edges:
            lab = labels.to_pandas().sort_values("node")
            node_arr = lab["node"].to_numpy(np.int64)
            label_arr = lab["label"].to_numpy(np.int64)
            lab_u, lab_sz = np.unique(label_arr, return_counts=True)
        else:
            node_arr = label_arr = lab_u = np.empty(0, np.int64)
            lab_sz = np.empty(0, np.int64)
        ref = ray.put((node_arr, label_arr, lab_u,
                       lab_sz.astype(np.int64)))

        def assign_bcast(df: pd.DataFrame) -> pd.DataFrame:
            nodes, labs, lu, lsz = ray.get(ref)
            d = df["doc_id"].to_numpy(np.int64)
            if len(nodes):
                pos = np.searchsorted(nodes, d)
                np.minimum(pos, len(nodes) - 1, out=pos)
                found = nodes[pos] == d
                cid = np.where(found, labs[pos], d)
                sz = np.ones(len(d), dtype=np.int64)
                sz[found] = lsz[np.searchsorted(lu, cid[found])]
            else:
                cid = d
                sz = np.ones(len(d), dtype=np.int64)
            return pd.DataFrame({
                "doc_id": d, "cluster_id": cid, "cluster_size": sz,
                "keep": (d == cid).astype(np.int64)})

        return docs.select_columns(["doc_id"]) \
            .map_batches(assign_bcast, batch_format="pandas")

    # shuffle 1: assign cluster_id (docs ∪ labels co-keyed by doc id)
    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"part": (d % N_NODE_PARTS).astype(np.int32),
                             "doc_id": d,
                             "label": np.full(len(d), -1, dtype=np.int64)})

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        n = df["node"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"part": (n % N_NODE_PARTS).astype(np.int32),
                             "doc_id": n,
                             "label": df["label"].to_numpy(dtype=np.int64)})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["label"] >= 0, ["doc_id", "label"]]
        d = g.loc[g["label"] < 0, ["doc_id"]]
        m = d.merge(lab, on="doc_id", how="left")
        cid = m["label"].fillna(m["doc_id"]).astype(np.int64)
        return pd.DataFrame({
            "cpart": (cid.to_numpy() % N_NODE_PARTS).astype(np.int32),
            "doc_id": m["doc_id"].astype(np.int64),
            "cluster_id": cid})

    tagged = docs.select_columns(["doc_id"]) \
        .map_batches(tag_docs, batch_format="pandas")
    if has_edges:
        tagged = tagged.union(
            labels.map_batches(tag_labels, batch_format="pandas"))
    assigned = tagged.groupby("part") \
        .map_groups(assign, batch_format="pandas")

    # shuffle 2: whole clusters co-located ⇒ size + keep inside the group
    def attach(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby("cluster_id", sort=False)["doc_id"] \
            .transform("size").to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "cluster_id": g["cluster_id"].astype(np.int64),
            "cluster_size": sz,
            "keep": (g["doc_id"] == g["cluster_id"])
            .to_numpy().astype(np.int64)})

    return assigned.groupby("cpart") \
        .map_groups(attach, batch_format="pandas")


# ---- incremental (cross-corpus) exact dedup ----

INC_NEW_MOD = 5          # doc_id % INC_NEW_MOD == 0 ⇒ the "incoming" slice
INC_PARTS = 64


def incremental_dedup(docs: ray.data.Dataset,
                      new_mod: int = INC_NEW_MOD) -> ray.data.Dataset:
    """Dedup a fresh crawl increment against an existing corpus: for
    every INCOMING document (``doc_id % new_mod == 0`` — the
    deterministic stand-in for "this batch's new crawl"), report
    ``dup_of`` = the smallest existing doc_id with byte-identical
    md5(text) (−1 if none) and ``keep = 1`` iff no existing copy. The
    production shape for continuous crawling: the existing corpus is
    NEVER rewritten, only the increment is filtered.

    Scale shape: both sides collapse to slim (doc_id, md5, is_new)
    rows in one streaming pass; ONE int co-partition shuffle on
    ``hash64(md5) % INC_PARTS`` co-locates every copy of a text, and
    the membership check is a vectorized merge inside each coarse
    partition. Text never shuffles; no broadcast of the (100 TB-scale)
    existing side."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        ch = pd.Series([hashlib.md5(t.encode()).hexdigest()
                        for t in df["text"].astype(str)])
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "part": (_hash64_str(ch.tolist()).view(np.int64) % INC_PARTS)
            .astype(np.int32),
            "content_hash": ch.to_numpy(),
            "doc_id": ids,
            "is_new": (ids % np.int64(new_mod) == 0).astype(np.int8)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ex = g[g["is_new"] == 0].groupby("content_hash", sort=False) \
            ["doc_id"].min().rename("dup_of").reset_index()
        new = g[g["is_new"] == 1]
        m = new.merge(ex, on="content_hash", how="left")
        dup = m["dup_of"].fillna(-1).astype(np.int64)
        return pd.DataFrame({
            "doc_id": m["doc_id"].to_numpy(dtype=np.int64),
            "dup_of": dup,
            "keep": (dup < 0).to_numpy().astype(np.int64)})

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(add_hash, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- keep-BEST near-dedup resolution (quality-aware representative) ----

KEEP_BEST_PARTS = 64


def dedup_keep_best(docs: ray.data.Dataset,
                    threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """(doc_id, cluster_id, cluster_size, quality_score, keep): the
    keep-best resolution of near-dedup — within each ``dup_clusters``
    component keep the member with the HIGHEST composite quality score
    (ties → smallest doc_id) instead of blindly keeping min doc_id.
    This is how production corpus passes resolve near-dup clusters:
    dropping the boilerplate-heavy mirror and keeping the clean copy.

    Scale shape: cluster labels and quality scores are both slim
    doc_id-keyed rows (the text never re-shuffles — quality is computed
    in its own streaming pass). They co-partition ONCE by
    doc_id % KEEP_BEST_PARTS for the score attach (tagged union +
    vectorized merge, the ops/relational join shape), then re-key by
    cluster_id % KEEP_BEST_PARTS so every component resolves its winner
    inside one group pass, vectorized across a partition's clusters."""
    from .text import quality_scores

    cl = dup_clusters(docs, threshold) \
        .select_columns(["doc_id", "cluster_id", "cluster_size"])
    qs = quality_scores(docs).select_columns(["doc_id", "quality_score"])
    P = KEEP_BEST_PARTS

    def tag_cl(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "part": (ids % P).astype(np.int32), "doc_id": ids,
            "cluster_id": df["cluster_id"].to_numpy(dtype=np.int64),
            "cluster_size": df["cluster_size"].to_numpy(dtype=np.int64),
            "quality_score": np.full(len(ids), np.nan)})

    def tag_qs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "part": (ids % P).astype(np.int32), "doc_id": ids,
            "cluster_id": np.full(len(ids), -1, dtype=np.int64),
            "cluster_size": np.zeros(len(ids), dtype=np.int64),
            "quality_score": df["quality_score"].to_numpy(dtype=np.float64)})

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_cl = g["cluster_id"].to_numpy(dtype=np.int64) >= 0
        left = g.loc[is_cl, ["doc_id", "cluster_id", "cluster_size"]]
        right = g.loc[~is_cl, ["doc_id", "quality_score"]]
        out = left.merge(right, on="doc_id", how="inner")
        out["cpart"] = (out["cluster_id"].to_numpy(dtype=np.int64)
                        % P).astype(np.int32)
        return out

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "quality_score", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        g["keep"] = (~g["cluster_id"].duplicated(keep="first")) \
            .to_numpy().astype(np.int64)
        g["doc_id"] = g["doc_id"].astype(np.int64)
        g["cluster_id"] = g["cluster_id"].astype(np.int64)
        g["cluster_size"] = g["cluster_size"].astype(np.int64)
        return g[["doc_id", "cluster_id", "cluster_size",
                  "quality_score", "keep"]]

    return (cl.map_batches(tag_cl, batch_format="pandas")
            .union(qs.map_batches(tag_qs, batch_format="pandas"))
            .materialize()
            .groupby("part").map_groups(attach, batch_format="pandas")
            .groupby("cpart").map_groups(resolve, batch_format="pandas"))


# ---- dedup evaluation: LSH recall against exact ground truth ----

DEDUP_EVAL_FP = 10 ** 6
N_EVAL_PARTS = 16


def dedup_eval(docs: ray.data.Dataset) -> pd.DataFrame:
    """One-row scorecard for the MinHash-LSH detector against the exact
    lang-blocked all-pairs Jaccard ground truth at the same threshold:
    (n_pred, n_truth, n_hit, precision_fp, recall_fp), fixed-point 1e6.

    recall < FP quantifies LSH banding loss (pairs the bucketing never
    surfaced); precision < FP counts detector pairs outside the blocked
    truth (e.g. cross-lang dups the lang blocking excludes by design).
    The dedup-quality regression gate a corpus pipeline runs after any
    change to shingling / banding parameters.

    Scale shape: both inputs are verified pair lists (output-sized, far
    smaller than the corpus). The sides are tagged and unioned as slim
    int rows; ONE pair-hash co-partition counts hits where each pair
    lands (a pair's two tags meet in exactly one partition), and the
    driver folds #parts partial rows into the single scorecard row —
    the pair lists never gather whole on any node."""
    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            a = df["doc_a"].to_numpy(dtype=np.int64)
            b = df["doc_b"].to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "ppart": ((a * 1_000_003 + b) % N_EVAL_PARTS)
                .astype(np.int32),
                "doc_a": a, "doc_b": b,
                "pred": np.full(len(a), 1 - side, dtype=np.int64),
                "truth": np.full(len(a), side, dtype=np.int64)})
        return fn

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["doc_a", "doc_b"], sort=False).agg(
            pred=("pred", "max"), truth=("truth", "max"))
        return pd.DataFrame({
            "n_pred": [int(per["pred"].sum())],
            "n_truth": [int(per["truth"].sum())],
            "n_hit": [int((per["pred"] & per["truth"]).sum())]})

    pred = minhash_lsh_pairs(docs).select_columns(["doc_a", "doc_b"])
    truth = ngram_jaccard_pairs(docs).select_columns(["doc_a", "doc_b"])
    parts = (pred.map_batches(tag(0), batch_format="pandas")
             .union(truth.map_batches(tag(1), batch_format="pandas"))
             .groupby("ppart")
             .map_groups(lambda g: count_part(g.drop(columns=["ppart"])),
                         batch_format="pandas")
             .aggregate(Sum("n_pred", alias_name="n_pred"),
                        Sum("n_truth", alias_name="n_truth"),
                        Sum("n_hit", alias_name="n_hit")))
    n_pred = int(parts["n_pred"] or 0)
    n_truth = int(parts["n_truth"] or 0)
    n_hit = int(parts["n_hit"] or 0)
    return pd.DataFrame({
        "n_pred": [n_pred], "n_truth": [n_truth], "n_hit": [n_hit],
        "precision_fp": [(n_hit * DEDUP_EVAL_FP) // n_pred
                         if n_pred else 0],
        "recall_fp": [(n_hit * DEDUP_EVAL_FP) // n_truth
                      if n_truth else 0]}).astype(np.int64)
