"""Similarity search over the ``embeddings`` table
``(vec_id, embedding: list<float>, label)``.

- ``ann_topk``: brute-force cosine top-k. The query matrix is broadcast
  ONCE via ``ray.put`` (read per task, never re-shipped per batch); each
  batch computes a float64 matmul against it and emits only its local
  top-k per query; a final per-query reduce keeps the global top-k — the
  shuffle moves k·n_queries slim rows per block, never embeddings.
- ``ann_topk_ivf``: the partitioned scale path — search only the query's
  coarse cell (here the given ``label`` as the cell id; at scale: k-means
  cell assignment) via ``groupby(label)``, a single co-partitioning
  shuffle.
- ``embedding_dup_pairs``: cosine ≥ threshold near-duplicate pairs.
- ``embedding_lsh_pairs``: random-hyperplane LSH bucketing (deterministic
  seeded planes) → within-bucket exact cosine — the 10^10-row path where
  the all-pairs matmul is infeasible.

Cosines are computed in float64 and rounded to 6 dp to match the DuckDB
oracle (list_cosine_similarity on DOUBLE[]) despite summation-order
differences.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

TOPK = 10
N_QUERIES = 8            # queries = vec_id < N_QUERIES
DUP_COS_THRESHOLD = 0.4  # synthetic embeddings have no planted dups; 0.4
                         # keeps the pair set small but non-trivial
LSH_PLANES = 8
EMB_DIM = 64
LSH_COS_THRESHOLD = 0.3


def lsh_planes(dim: int = EMB_DIM, n_planes: int = LSH_PLANES) -> np.ndarray:
    """Deterministic seeded hyperplanes — shared by the Ray op and the
    SQL-oracle literal generator in __ray_entry__."""
    return np.random.RandomState(1234).randn(dim, n_planes)


def _mat(df: pd.DataFrame) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def _normed(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _load_queries(emb: ray.data.Dataset, n_queries: int):
    """Small side: filter + take → ray.put once (broadcast pattern)."""
    q = (emb.filter(expr=f"vec_id < {n_queries}")
         .select_columns(["vec_id", "embedding"]).take_all())
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    order = np.argsort(qids)
    qm = _normed(np.stack([np.asarray(q[i]["embedding"], dtype=np.float64)
                           for i in order]))
    return ray.put((qids[order], qm))


def _topk_of_group(k: int):
    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cos"] = g["cos"].round(6)
        return g[["query_id", "neighbor_id", "rank", "cos"]]
    return top


def ann_topk(emb: ray.data.Dataset, k: int = TOPK,
             n_queries: int = N_QUERIES) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank, cos): global cosine top-k per query,
    self-matches excluded. Ties broken by neighbor_id asc."""
    q_ref = _load_queries(emb, n_queries)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, qm = ray.get(q_ref)
        m = _normed(_mat(df))
        sims = m @ qm.T                       # (batch, n_queries)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        out = []
        for qi, qid in enumerate(qids):
            s = sims[:, qi]
            mask = ids != qid                 # exclude self
            bi = np.flatnonzero(mask)
            order = bi[np.lexsort((ids[bi], -s[bi]))][:k]
            out.append(pd.DataFrame({
                "query_id": np.full(len(order), qid, dtype=np.int64),
                "neighbor_id": ids[order],
                "cos": s[order]}))
        return pd.concat(out, ignore_index=True)

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(local_topk, batch_format="pandas", batch_size=4096)
            .groupby("query_id")
            .map_groups(_topk_of_group(k), batch_format="pandas"))


def ann_topk_ivf(emb: ray.data.Dataset, k: int = 5,
                 n_queries: int = N_QUERIES) -> ray.data.Dataset:
    """Partitioned ANN: only the query's own ``label`` cell is searched
    (coarse-quantizer cell stand-in). One groupby(label) shuffle."""
    q = (emb.filter(expr=f"vec_id < {n_queries}")
         .select_columns(["vec_id", "embedding", "label"]).take_all())
    by_label: dict[int, list] = {}
    for r in q:
        by_label.setdefault(int(r["label"]), []).append(
            (int(r["vec_id"]), np.asarray(r["embedding"], dtype=np.float64)))
    q_ref = ray.put(by_label)

    def cell(g: pd.DataFrame) -> pd.DataFrame:
        queries = ray.get(q_ref).get(int(g["label"].iloc[0]), [])
        if not queries:
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 "neighbor_id": np.empty(0, np.int64),
                                 "rank": np.empty(0, np.int64),
                                 "cos": np.empty(0, np.float64)})
        m = _normed(_mat(g))
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        out = []
        for qid, qv in queries:
            s = m @ (qv / np.linalg.norm(qv))
            mask = ids != qid
            bi = np.flatnonzero(mask)
            order = bi[np.lexsort((ids[bi], -s[bi]))][:k]
            out.append(pd.DataFrame({
                "query_id": np.full(len(order), qid, dtype=np.int64),
                "neighbor_id": ids[order],
                "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                "cos": np.round(s[order], 6)}))
        return pd.concat(out, ignore_index=True)

    return (emb.select_columns(["vec_id", "embedding", "label"])
            .groupby("label").map_groups(cell, batch_format="pandas"))


#: rows the driver may hold at once for the block-broadcast exact join
DUP_CHUNK = 4096

#: route-by-default guard: above this row count the exact-quadratic op
#: refuses to run blind (n/DUP_CHUNK streaming passes over n rows — at
#: corpus scale that is months of matmuls) and points at the
#: sub-quadratic :func:`embedding_lsh_pairs`; ``force=True`` overrides
#: for a deliberate exact run
EXACT_PAIRS_MAX = 1 << 17


def embedding_dup_pairs(emb: ray.data.Dataset,
                        threshold: float = DUP_COS_THRESHOLD,
                        force: bool = False) -> ray.data.Dataset:
    """(vec_a, vec_b, cos ≥ threshold), vec_a < vec_b — exact all-pairs as
    a block-broadcast nested-loop join: vectors are hash-split into chunks
    of ≤DUP_CHUNK rows; each chunk is broadcast once (``ray.put``) and the
    full table streams against it (one matmul per batch). The driver never
    holds more than one chunk (the round-1 version ``take_all()``-ed the
    entire table). Pair (a, b) is emitted exactly once — by the chunk that
    contains ``a`` (the broadcast-side id must be the smaller one).

    Exact quadratic work is inherent to the op: n/DUP_CHUNK streaming
    passes. The sub-quadratic scale path is :func:`embedding_lsh_pairs`;
    above ``EXACT_PAIRS_MAX`` rows this op refuses to run unless
    ``force=True`` so it cannot be invoked blind at corpus scale."""
    n = emb.count()
    if n > EXACT_PAIRS_MAX and not force:
        raise ValueError(
            f"embedding_dup_pairs is exact-quadratic and the input has "
            f"{n:,} rows (> EXACT_PAIRS_MAX={EXACT_PAIRS_MAX:,}): use "
            f"embedding_lsh_pairs (sub-quadratic LSH-bucketed scale "
            f"path), or pass force=True for a deliberate exact run")
    n_chunks = max(1, -(-n // DUP_CHUNK))
    parts = []
    for c in range(n_chunks):
        chunk = (emb.select_columns(["vec_id", "embedding"])
                 .map_batches(lambda df, _c=c: df[df["vec_id"].to_numpy(
                     dtype=np.int64) % n_chunks == _c],
                     batch_format="pandas")
                 .take_all())
        if not chunk:
            continue
        ids = np.array([r["vec_id"] for r in chunk], dtype=np.int64)
        order = np.argsort(ids)
        ref = ray.put((ids[order],
                       _normed(np.stack([np.asarray(chunk[i]["embedding"],
                                                    dtype=np.float64)
                                         for i in order]))))

        def pairs(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c_ids, c_m = ray.get(_ref)
            m = _normed(_mat(df))
            ids_b = df["vec_id"].to_numpy(dtype=np.int64)
            sims = m @ c_m.T                      # (batch, chunk)
            bi, aj = np.nonzero((sims >= threshold)
                                & (c_ids[None, :] < ids_b[:, None]))
            return pd.DataFrame({"vec_a": c_ids[aj], "vec_b": ids_b[bi],
                                 "cos": np.round(sims[bi, aj], 6)})

        parts.append(emb.select_columns(["vec_id", "embedding"]).map_batches(
            pairs, batch_format="pandas", batch_size=4096))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def embedding_lsh_pairs(emb: ray.data.Dataset, threshold: float = LSH_COS_THRESHOLD,
                        n_planes: int = LSH_PLANES, dim: int = EMB_DIM) -> ray.data.Dataset:
    """Scale path: random-hyperplane signature (seeded, deterministic) →
    groupby(signature) buckets → exact cosine within bucket. Recall is
    partial by design (documented LSH trade-off); at 10^10 rows, multiple
    plane sets / band rotations raise recall."""
    planes = lsh_planes(dim, n_planes)
    p_ref = ray.put(planes)

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        # RAW dot products (sign is invariant under normalization) so the
        # DuckDB oracle can recompute the signature with list_dot_product
        bits = (_mat(df) @ ray.get(p_ref)) > 0
        s = (bits.astype(np.uint64)
             << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        return pd.DataFrame({"vec_id": df["vec_id"].astype(np.int64),
                             "sig": s.astype(np.int64),
                             "embedding": df["embedding"]})

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": np.empty(0, np.int64),
                                 "vec_b": np.empty(0, np.int64),
                                 "cos": np.empty(0, np.float64)})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = _normed(_mat(g))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"vec_a": ids[ia][keep], "vec_b": ids[ib][keep],
                             "cos": np.round(sims[ia, ib][keep], 6)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(sig, batch_format="pandas")
            .groupby("sig").map_groups(bucket, batch_format="pandas"))


# ---- per-cell centroids (the IVF training primitive) ----

#: fixed-point scale for exact (order-independent) centroid sums: float
#: summation order differs between Ray's per-batch partials and a serial
#: scan, so sums are taken over floor(x·2^20) int64 values instead —
#: associative, overflow-safe (|x| ≤ 1, 10^10 rows ≪ 2^43 headroom)
CENTROID_FP = 1 << 20


def embedding_centroids(emb: ray.data.Dataset) -> ray.data.Dataset:
    """(label, dim, sum_fp, n_vecs, centroid): per-cell mean vector in
    fixed-point — partial per-batch sums inside ``map_batches`` (the
    combiner), then a #cells×dim-sized reduce: folded driver-side (the
    sidecar pattern — exact order-independent int64 sums, O(blocks ×
    cells × dim) slim rows) when the input block count is bounded,
    through a distributed ``groupby.aggregate(Sum)`` otherwise — the
    aggregation a distributed k-means / IVF trainer runs every
    iteration."""
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        m = _mat(df)                                  # (B, dim) float64
        fp = np.floor(m * float(CENTROID_FP)).astype(np.int64)
        lab = df["label"].to_numpy(dtype=np.int64)
        out = []
        for lb in np.unique(lab):
            s = fp[lab == lb].sum(axis=0)
            out.append(pd.DataFrame({
                "label": np.full(len(s), lb, dtype=np.int64),
                "dim": np.arange(len(s), dtype=np.int64),
                "fp_part": s,
                "n_part": np.full(len(s), int((lab == lb).sum()),
                                  dtype=np.int64)}))
        return pd.concat(out, ignore_index=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["centroid"] = (df["sum_fp"].to_numpy(dtype=np.float64)
                          / float(CENTROID_FP)) \
            / df["n_vecs"].to_numpy(dtype=np.int64)
        return df[["label", "dim", "sum_fp", "n_vecs", "centroid"]]

    parts = emb.select_columns(["label", "embedding"]) \
        .map_batches(partials, batch_format="pandas")
    if emb.count() <= CENTROIDS_DRIVER_FOLD_MAX:    # metadata count
        agg = parts.to_pandas().groupby(
            ["label", "dim"], sort=False, as_index=False).agg(
                sum_fp=("fp_part", "sum"), n_vecs=("n_part", "sum"))
        return ray.data.from_pandas(finish(agg))
    return (parts.groupby(["label", "dim"])
            .aggregate(Sum("fp_part", alias_name="sum_fp"),
                       Sum("n_part", alias_name="n_vecs"))
            .map_batches(finish, batch_format="pandas"))


# ---- distributed k-means (Lloyd) over the embedding table ----

#: k-means runs in EXACT integer arithmetic so the result is bit-identical
#: regardless of batch/block order AND reproducible by the DuckDB oracle:
#: every vector is quantized once to q_d = floor((x_d + 1) * 2^20) (the +1
#: offset keeps all values non-negative, making DuckDB's truncating `//`
#: and Python's flooring `//` agree), distances are int64 sums of squared
#: differences (≤ 2^42 · dim ≪ 2^63), and centroid updates are integer
#: floor divisions of exact partial sums.
KMEANS_FP = 1 << 20
KMEANS_OFFSET = 1.0
KMEANS_K = 8
KMEANS_ITERS = 3
#: driver-fold bound for per-round partials (blocks × k × dim int rows);
#: above it the reduce goes through a distributed groupby instead.
KMEANS_DRIVER_FOLD_MAX = 4_000_000

#: embedding_centroids' driver-fold bound (input rows; combiner output is
#: blocks × cells × dim rows). Same sidecar-vs-distributed switch.
CENTROIDS_DRIVER_FOLD_MAX = 4_000_000


def _quantize(m: np.ndarray) -> np.ndarray:
    return np.floor((m + KMEANS_OFFSET) * float(KMEANS_FP)).astype(np.int64)


def kmeans_fit(emb: ray.data.Dataset, k: int = KMEANS_K,
               iters: int = KMEANS_ITERS) -> pd.DataFrame:
    """(cluster, dim, c_fp, n_vecs): centroids after ``iters`` Lloyd
    rounds — the full IVF / semantic-dedup coarse-quantizer trainer
    (embedding_centroids is its single aggregation step).

    Per round: centroids (k×dim int64, a few KB) are broadcast once via
    ``ray.put``; one streaming ``map_batches`` pass assigns every vector
    to its nearest centroid (ties → lowest cluster id) and emits per-batch
    partial sums (≤ k×dim rows per batch). The partials are folded the
    sidecar way (the wave engine's pattern): driver work is
    O(blocks × k × dim) integer rows — order-independent int64 sums, so
    the fold is exact — below ``KMEANS_DRIVER_FOLD_MAX`` rows, falling
    back to a distributed ``groupby.aggregate(Sum)`` above it. The input
    is materialized ONCE so the 3 rounds re-scan object-store blocks,
    not the parquet source. Nothing quadratic exists — per round cost is
    one scan + one k×dim-sized reduce, the canonical distributed-k-means
    shape at 10^10 rows.

    Initial centroids are the quantized vectors with ``vec_id < k``
    (deterministic seeding); clusters that lose all members keep their
    previous centroid. Reference parity: this is OUR scale op (no
    ghcrawler analogue) — the coarse quantizer feeding ann_topk_ivf's
    per-cell search."""
    from ray.data.aggregate import Sum

    src = emb.select_columns(["vec_id", "embedding"]).materialize()
    init = sorted(src.filter(expr=f"vec_id < {k}").take_all(),
                  key=lambda r: int(r["vec_id"]))
    cents = _quantize(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                                for r in init]))          # (k, dim) int64
    dim = cents.shape[1]
    n_vecs = np.zeros(k, dtype=np.int64)
    driver_fold = src.num_blocks() * k * dim <= KMEANS_DRIVER_FOLD_MAX

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c = ray.get(_ref)                             # (k, dim)
            q = _quantize(_mat(df))                       # (B, dim)
            diff = q[:, None, :] - c[None, :, :]
            dist = np.einsum("bkd,bkd->bk", diff, diff)   # (B, k) int64
            assign = dist.argmin(axis=1)                  # ties → lowest id
            out = []
            for cl in np.unique(assign):
                sel = q[assign == cl]
                out.append(pd.DataFrame({
                    "cluster": np.full(dim, cl, dtype=np.int64),
                    "dim": np.arange(dim, dtype=np.int64),
                    "s_part": sel.sum(axis=0),
                    "n_part": np.full(dim, len(sel), dtype=np.int64)}))
            return pd.concat(out, ignore_index=True)

        parts = src.map_batches(partials, batch_format="pandas",
                                batch_size=2048)
        if driver_fold:
            agg = parts.to_pandas().groupby(
                ["cluster", "dim"], sort=False, as_index=False).agg(
                    s=("s_part", "sum"), n=("n_part", "sum"))
        else:
            agg = (parts.groupby(["cluster", "dim"])
                   .aggregate(Sum("s_part", alias_name="s"),
                              Sum("n_part", alias_name="n"))
                   .to_pandas())                          # ≤ k×dim rows
        n_vecs = np.zeros(k, dtype=np.int64)
        for cl, g in agg.groupby("cluster"):
            cl = int(cl)
            g = g.sort_values("dim")
            n = int(g["n"].iloc[0])
            n_vecs[cl] = n
            cents[cl] = g["s"].to_numpy(dtype=np.int64) // n

    return pd.DataFrame({
        "cluster": np.repeat(np.arange(k, dtype=np.int64), dim),
        "dim": np.tile(np.arange(dim, dtype=np.int64), k),
        "c_fp": cents.reshape(-1),
        "n_vecs": np.repeat(n_vecs, dim),
    })


def kmeans_cells(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment in the trainer's exact integer metric
    (ties → lowest cluster id) — shared by training, indexing and query
    routing so they can never disagree."""
    q = _quantize(m)
    diff = q[:, None, :] - cents[None, :, :]
    return np.einsum("bkd,bkd->bk", diff, diff).argmin(axis=1)


def ann_topk_kmeans(emb: ray.data.Dataset, k: int = 5,
                    n_queries: int = N_QUERIES) -> ray.data.Dataset:
    """IVF ANN with LEARNED cells: the coarse quantizer is
    :func:`kmeans_fit`'s centroid table (instead of ``ann_topk_ivf``'s
    given ``label``), queries are routed to their own cell, and only
    that cell is searched — the complete train→index→search path a
    10^10-row vector store runs. One ``groupby(cell)`` co-partitioning
    shuffle; centroids (k×dim ints) broadcast once via ``ray.put``."""
    cf = kmeans_fit(emb)
    kk = int(cf["cluster"].max()) + 1
    dim = int(cf["dim"].max()) + 1
    cents = np.zeros((kk, dim), dtype=np.int64)
    cents[cf["cluster"].to_numpy(), cf["dim"].to_numpy()] = \
        cf["c_fp"].to_numpy()
    c_ref = ray.put(cents)

    q = (emb.filter(expr=f"vec_id < {n_queries}")
         .select_columns(["vec_id", "embedding"]).take_all())
    q_ids = np.array([int(r["vec_id"]) for r in q], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                      for r in q])
    q_cells = kmeans_cells(q_mat, cents)
    by_cell: dict[int, list] = {}
    for qid, qc, qv in zip(q_ids, q_cells, q_mat):
        by_cell.setdefault(int(qc), []).append((int(qid), qv))
    q_ref = ray.put(by_cell)

    def assign(df: pd.DataFrame, _c=c_ref) -> pd.DataFrame:
        df = df.copy()
        df["cell"] = kmeans_cells(_mat(df), ray.get(_c)).astype(np.int32)
        return df

    def cell_search(g: pd.DataFrame, _q=q_ref) -> pd.DataFrame:
        queries = ray.get(_q).get(int(g["cell"].iloc[0]), [])
        empty = pd.DataFrame({"query_id": np.empty(0, np.int64),
                              "neighbor_id": np.empty(0, np.int64),
                              "rank": np.empty(0, np.int64),
                              "cos": np.empty(0, np.float64)})
        if not queries:
            return empty
        m = _normed(_mat(g))
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        out = []
        for qid, qv in queries:
            s = m @ (qv / np.linalg.norm(qv))
            bi = np.flatnonzero(ids != qid)
            order = bi[np.lexsort((ids[bi], -s[bi]))][:k]
            out.append(pd.DataFrame({
                "query_id": np.full(len(order), qid, dtype=np.int64),
                "neighbor_id": ids[order],
                "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                "cos": np.round(s[order], 6)}))
        return pd.concat(out, ignore_index=True) if out else empty

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(assign, batch_format="pandas")
            .groupby("cell").map_groups(cell_search, batch_format="pandas"))


SEMDUP_COS_THRESHOLD = 0.4


def semantic_dup_pairs(emb: ray.data.Dataset,
                       threshold: float = SEMDUP_COS_THRESHOLD
                       ) -> ray.data.Dataset:
    """(vec_a, vec_b, cos): SemDeDup-shaped near-duplicate detection —
    cluster the embedding space with :func:`kmeans_fit`, then compare
    ONLY within each learned cell (exact cosine, vec_a < vec_b). The
    quadratic term shrinks from n² to Σ|cell|²; recall misses only
    cross-cell pairs (the documented trade-off; more clusters + soft
    assignment raise it at scale). One ``groupby(cell)`` shuffle after
    a streaming assignment pass; centroids broadcast once."""
    cf = kmeans_fit(emb)
    kk = int(cf["cluster"].max()) + 1
    dim = int(cf["dim"].max()) + 1
    cents = np.zeros((kk, dim), dtype=np.int64)
    cents[cf["cluster"].to_numpy(), cf["dim"].to_numpy()] = \
        cf["c_fp"].to_numpy()
    c_ref = ray.put(cents)

    def assign(df: pd.DataFrame, _c=c_ref) -> pd.DataFrame:
        df = df.copy()
        df["cell"] = kmeans_cells(_mat(df), ray.get(_c)).astype(np.int32)
        return df

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": np.empty(0, np.int64),
                                 "vec_b": np.empty(0, np.int64),
                                 "cos": np.empty(0, np.float64)})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = _normed(_mat(g))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"vec_a": ids[ia][keep], "vec_b": ids[ib][keep],
                             "cos": np.round(sims[ia, ib][keep], 6)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(assign, batch_format="pandas")
            .groupby("cell").map_groups(cell_pairs, batch_format="pandas"))


# ---- int8 scalar quantization (index-compression pass) ----

# Per-dimension affine quantization to [0, 255] — the scalar-quantizer
# compression step a vector index runs before storing 100 TB of
# embeddings (4 bytes/dim -> 1). Exploded (vec_id, dim, q) output so the
# DuckDB mirror value-checks every cell; a production sink would keep
# the list layout.
QUANT_LEVELS = 255


def _dim_minmax(emb: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, span) via a per-batch combiner + one
    EMB_DIM-group aggregate — the dims-bounded stats pass shared by the
    quantizer-family ops."""
    from ray.data.aggregate import Max, Min

    def partial_minmax(df: pd.DataFrame) -> pd.DataFrame:
        m = _mat(df)
        return pd.DataFrame({
            "dim": np.arange(m.shape[1], dtype=np.int64),
            "mn": m.min(axis=0), "mx": m.max(axis=0)})

    stats = (emb.select_columns(["embedding"])
             .map_batches(partial_minmax, batch_format="pandas")
             .groupby("dim")
             .aggregate(Min("mn", alias_name="mn"),
                        Max("mx", alias_name="mx"))
             .to_pandas().sort_values("dim"))
    mn = stats["mn"].to_numpy(dtype=np.float64)
    mx = stats["mx"].to_numpy(dtype=np.float64)
    return mn, mx - mn


def _quantize_mat(m: np.ndarray, mn: np.ndarray,
                  span: np.ndarray) -> np.ndarray:
    """floor((x − min_d)·255 / span_d) capped at 255, constant dims → 0
    — the exact IEEE expression tree of the SQL mirror."""
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor((m - mn) * np.float64(QUANT_LEVELS) / span)
    return np.where(span > 0,
                    np.minimum(q, QUANT_LEVELS), 0.0).astype(np.int64)


def quantize_embeddings(emb: ray.data.Dataset) -> ray.data.Dataset:
    """(vec_id, dim, q): q = floor((x - min_d) * 255 / (max_d - min_d))
    capped at 255; constant dimensions quantize to 0. The float
    expression tree matches the SQL mirror exactly (same IEEE-double
    left-associated ops), so values are bit-exact.

    Scale shape: pass 1 reduces to EMB_DIM rows per batch (per-batch
    min/max combiner) and one EMB_DIM-group aggregate; the (min, max)
    table is dims-bounded and broadcast in the closure; pass 2 is one
    streaming vectorized map_batches — embeddings never shuffle."""
    mn, span = _dim_minmax(emb)

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        m = _mat(df)
        q = _quantize_mat(m, mn, span)
        n, d = m.shape
        return pd.DataFrame({
            "vec_id": np.repeat(df["vec_id"].to_numpy(dtype=np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "q": q.reshape(-1)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(quant, batch_format="pandas"))


def embedding_covariance(emb: ray.data.Dataset) -> pd.DataFrame:
    """(dim_i, dim_j, cov_num): exact population-covariance NUMERATORS
    ``n·Σ(q_i q_j) − Σq_i·Σq_j`` over the quantized grid — the
    distributed Gram/covariance pass PCA and whitening start from
    (divide by n² and eigendecompose the D×D result on the driver;
    D = EMB_DIM so that step is trivially bounded).

    Scale shape: each batch reduces to ONE D×D int64 matmul (QᵀQ) plus
    per-dim sums — D²+D+1 slim partial rows per batch regardless of
    batch size — and a single int-keyed Sum aggregate folds them; the
    embeddings themselves never shuffle. All sums are exact int64
    (q ≤ 255, so n·Σq_iq_j fits until n ≈ 3.7e8 vectors; carry hi/lo
    pairs beyond that)."""
    from ray.data.aggregate import Sum

    mn, span = _dim_minmax(emb)
    d = len(mn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_mat(_mat(df), mn, span)
        qq = (q.T @ q).reshape(-1)           # D×D exact int64
        ij = np.arange(d * d, dtype=np.int64)
        extra = np.concatenate([q.sum(axis=0),
                                [np.int64(len(q))]])
        return pd.DataFrame({
            "ij": np.concatenate([ij, d * d + np.arange(d + 1,
                                                        dtype=np.int64)]),
            "s": np.concatenate([qq, extra])})

    agg = (emb.select_columns(["vec_id", "embedding"])
           .map_batches(partial, batch_format="pandas")
           .groupby("ij").aggregate(Sum("s", alias_name="s"))
           .to_pandas()                 # D²+D+1 rows — dims-bounded
           .sort_values("ij"))
    s = agg["s"].to_numpy(dtype=np.int64)
    qq = s[:d * d].reshape(d, d)
    colsum = s[d * d:d * d + d]
    n = s[-1]
    cov = n * qq - np.outer(colsum, colsum)
    ii, jj = np.meshgrid(np.arange(d, dtype=np.int64),
                         np.arange(d, dtype=np.int64), indexing="ij")
    return pd.DataFrame({"dim_i": ii.reshape(-1), "dim_j": jj.reshape(-1),
                         "cov_num": cov.reshape(-1)})


# ---- seeded ±1 (JL) projection of quantized embeddings ----

#: output dimensionality of the sparse-JL sketch (64 → 16)
JL_OUT_DIM = 16
JL_SALT = "jl"


def jl_signs(dim: int = EMB_DIM, out_dim: int = JL_OUT_DIM) -> np.ndarray:
    """Deterministic ±1 projection matrix (dim × out_dim): sign(i,j) =
    +1 iff the first md5 hex digit of ``jl:i:j`` is even — seeded from
    content, so every worker (and the SQL mirror) regenerates the same
    matrix instead of shipping one."""
    m = hashlib.md5
    s = np.empty((dim, out_dim), dtype=np.int64)
    for i in range(dim):
        for j in range(out_dim):
            s[i, j] = 1 if int(m(f"{JL_SALT}:{i}:{j}".encode())
                               .hexdigest()[0], 16) % 2 == 0 else -1
    return s


def project_embeddings(emb: ray.data.Dataset,
                       out_dim: int = JL_OUT_DIM) -> ray.data.Dataset:
    """(vec_id, out_dim, proj): Johnson–Lindenstrauss ±1 projection of
    the int8-QUANTIZED embeddings — the dimensionality-reduction sketch
    an ANN index applies after scalar quantization (Achlioptas-style
    database-friendly random projection), 64 int8 cells → 16 int64
    sums per vector.

    Exactness: quantization is the same floor-of-IEEE expression as
    ``quantize_embeddings``; the projection is then pure int64 matmul
    (order-free), so the DuckDB mirror reproduces every cell.

    Scale shape: one EMB_DIM-row min/max combiner pass (same as
    quantize), then ONE streaming map_batches with the 64×16 sign
    matrix regenerated per actor — embeddings never shuffle, nothing
    is broadcast but a dims-bounded stats table."""
    from ray.data.aggregate import Max, Min

    def partial_minmax(df: pd.DataFrame) -> pd.DataFrame:
        m = _mat(df)
        return pd.DataFrame({
            "dim": np.arange(m.shape[1], dtype=np.int64),
            "mn": m.min(axis=0), "mx": m.max(axis=0)})

    stats = (emb.select_columns(["embedding"])
             .map_batches(partial_minmax, batch_format="pandas")
             .groupby("dim")
             .aggregate(Min("mn", alias_name="mn"),
                        Max("mx", alias_name="mx"))
             .to_pandas().sort_values("dim"))
    mn = stats["mn"].to_numpy(dtype=np.float64)
    mx = stats["mx"].to_numpy(dtype=np.float64)
    span = mx - mn
    signs = jl_signs(len(mn), out_dim)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        m = _mat(df)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((m - mn) * np.float64(QUANT_LEVELS) / span)
        q = np.where(span > 0,
                     np.minimum(q, QUANT_LEVELS), 0.0).astype(np.int64)
        p = q @ signs                      # int64-exact, order-free
        n = len(df)
        return pd.DataFrame({
            "vec_id": np.repeat(df["vec_id"].to_numpy(dtype=np.int64),
                                out_dim),
            "out_dim": np.tile(np.arange(out_dim, dtype=np.int64), n),
            "proj": p.reshape(-1)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(project, batch_format="pandas"))


# ---- k-NN graph over learned cells ----

KNN_K = 3


def knn_graph(emb: ray.data.Dataset, k: int = KNN_K) -> ray.data.Dataset:
    """(vec_id, neighbor_id, rank, cos): approximate k-nearest-neighbor
    graph over EVERY vector — the SemDeDup / cluster-pruning /
    graph-clustering building block. Same IVF approximation as
    :func:`semantic_dup_pairs`: neighbors are searched only within the
    vector's learned k-means cell (recall misses cross-cell edges; more
    cells + soft assignment raise it at scale), so the quadratic term is
    Σ|cell|², never n².

    One streaming assignment pass (centroids broadcast once) + one
    ``groupby(cell)`` shuffle; per-cell top-k is a single vectorized
    stable argsort (ties by ascending neighbor_id, matching the SQL
    window order)."""
    cf = kmeans_fit(emb)
    kk = int(cf["cluster"].max()) + 1
    dim = int(cf["dim"].max()) + 1
    cents = np.zeros((kk, dim), dtype=np.int64)
    cents[cf["cluster"].to_numpy(), cf["dim"].to_numpy()] = \
        cf["c_fp"].to_numpy()
    c_ref = ray.put(cents)

    def assign(df: pd.DataFrame, _c=c_ref) -> pd.DataFrame:
        df = df.copy()
        df["cell"] = kmeans_cells(_mat(df), ray.get(_c)).astype(np.int32)
        return df

    def cell_knn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": np.empty(0, np.int64),
                              "neighbor_id": np.empty(0, np.int64),
                              "rank": np.empty(0, np.int64),
                              "cos": np.empty(0, np.float64)})
        if len(g) < 2:
            return empty
        g = g.sort_values("vec_id")          # columns ascend by id →
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = _normed(_mat(g))
        sims = m @ m.T
        np.fill_diagonal(sims, -2.0)         # exclude self (cos ≥ -1)
        kk = min(k, len(g) - 1)
        # stable argsort on -sims: ties resolve to the earlier column =
        # the smaller neighbor_id (same rule as the mirror's window)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(len(g)), kk)
        cols = order.reshape(-1)
        return pd.DataFrame({
            "vec_id": ids[rows],
            "neighbor_id": ids[cols],
            "rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), len(g)),
            "cos": np.round(sims[rows, cols], 6)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(assign, batch_format="pandas")
            .groupby("cell").map_groups(cell_knn, batch_format="pandas"))


# ---- product quantization: per-block codebooks + code assignment ----

PQ_BLOCKS = 8             # M sub-vectors (64 dims -> 8 x 8)
PQ_K = 8                  # codebook size per block
PQ_ITERS = 2              # Lloyd rounds per block codebook


def pq_codes(emb: ray.data.Dataset, m: int = PQ_BLOCKS, k: int = PQ_K,
             iters: int = PQ_ITERS) -> ray.data.Dataset:
    """(vec_id, block, code): product-quantization codes — each vector's
    ``m`` sub-vectors assigned to per-block codebooks trained by ``iters``
    integer Lloyd rounds (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search") — the memory-bound compression step of a
    10^10-vector ANN index (64 float dims → m 3-bit codes here).

    Same exact-integer discipline as :func:`kmeans_fit` (shared
    ``_quantize`` fixed-point grid, argmin ties → lowest code, centroid
    update by non-negative integer division, empty code keeps its old
    centroid), so the DuckDB mirror reproduces every code bit-for-bit
    and training is bit-identical under any batch order.

    Scale shape: codebooks are m×k×(dim/m) int64 (a few KB) broadcast
    once per round via ``ray.put``; each round is ONE streaming pass
    emitting ≤ m·k·dim partial-sum rows per batch, folded driver-side
    below the same ``KMEANS_DRIVER_FOLD_MAX`` bound (distributed Sum
    above it); the final code assignment is one stateless pass. The
    input is materialized once so rounds re-scan object-store blocks,
    not the parquet source."""
    src = emb.select_columns(["vec_id", "embedding"]).materialize()
    cents = _pq_train(src, m, k, iters)
    sub = cents.shape[2]
    final_ref = ray.put(cents)

    def assign_codes(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(final_ref)
        q3 = _quantize(_mat(df)).reshape(-1, m, sub)
        code = _pq_dists(q3, c).argmin(axis=2)           # (B, m)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "vec_id": np.repeat(ids, m),
            "block": np.tile(np.arange(m, dtype=np.int64), len(ids)),
            "code": code.reshape(-1).astype(np.int64)})

    return src.map_batches(assign_codes, batch_format="pandas")


def _pq_dists(q3: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(B, m, k) integer squared distances of every sub-vector to every
    per-block centroid."""
    diff = q3[:, :, None, :] - c[None, :, :, :]          # (B, m, k, sub)
    return np.einsum("bmks,bmks->bmk", diff, diff)


def _pq_train(src: ray.data.Dataset, m: int, k: int,
              iters: int) -> np.ndarray:
    """Per-block integer Lloyd codebooks (m, k, dim/m) — the shared
    trainer behind :func:`pq_codes` and :func:`pq_topk`."""
    from ray.data.aggregate import Sum

    init = sorted(src.filter(expr=f"vec_id < {k}").take_all(),
                  key=lambda r: int(r["vec_id"]))
    seed = _quantize(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                               for r in init]))          # (k, dim)
    dim = seed.shape[1]
    sub = dim // m
    cents = seed.reshape(k, m, sub).transpose(1, 0, 2).copy()  # (m, k, sub)
    driver_fold = src.num_blocks() * m * k * sub <= KMEANS_DRIVER_FOLD_MAX

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c = ray.get(_ref)                            # (m, k, sub)
            q3 = _quantize(_mat(df)).reshape(-1, m, sub)
            assign = _pq_dists(q3, c).argmin(axis=2)     # (B, m)
            out = []
            for blk in range(m):
                for cl in np.unique(assign[:, blk]):
                    sel = q3[assign[:, blk] == cl, blk]  # (n, sub)
                    out.append(pd.DataFrame({
                        "blk": np.full(sub, blk, dtype=np.int64),
                        "cluster": np.full(sub, cl, dtype=np.int64),
                        "sdim": np.arange(sub, dtype=np.int64),
                        "s_part": sel.sum(axis=0),
                        "n_part": np.full(sub, len(sel), dtype=np.int64)}))
            return pd.concat(out, ignore_index=True)

        parts = src.map_batches(partials, batch_format="pandas",
                                batch_size=2048)
        if driver_fold:
            agg = parts.to_pandas().groupby(
                ["blk", "cluster", "sdim"], sort=False, as_index=False).agg(
                    s=("s_part", "sum"), n=("n_part", "sum"))
        else:
            agg = (parts.groupby(["blk", "cluster", "sdim"])
                   .aggregate(Sum("s_part", alias_name="s"),
                              Sum("n_part", alias_name="n"))
                   .to_pandas())                         # ≤ m·k·sub rows
        for (blk, cl), g in agg.groupby(["blk", "cluster"]):
            g = g.sort_values("sdim")
            cents[int(blk), int(cl)] = \
                g["s"].to_numpy(dtype=np.int64) // int(g["n"].iloc[0])

    return cents


PQ_TOPK = 5


def pq_topk(emb: ray.data.Dataset, topk: int = PQ_TOPK,
            n_queries: int = N_QUERIES) -> pd.DataFrame:
    """(query_id, neighbor_id, rank, adc_dist): approximate top-k by
    PQ Asymmetric Distance Computation — each query precomputes an
    m×k lookup table of integer squared distances to every per-block
    centroid, and a database vector's distance is the SUM of m table
    lookups on its codes (Jégou et al. 2011 §III-B). The search never
    touches the original vectors: it streams the (vec, code) rows —
    the whole point of PQ at 10^10 vectors, where the float vectors
    don't fit and the codes do.

    Exact-integer end to end (training grid, LUT entries, sums), so
    ranks are deterministic (ties → lowest neighbor_id) and the DuckDB
    mirror reproduces the exact neighbor sets.

    Scale shape: codebooks + Q×m×k LUTs broadcast once via ``ray.put``;
    one streaming pass over the materialized source assigns codes and
    emits each batch's LOCAL top-k per query (≤ k·Q rows per batch);
    the driver folds ≤ k·Q·#blocks slim rows — the ann_topk reduce
    shape."""
    m, k = PQ_BLOCKS, PQ_K
    src = emb.select_columns(["vec_id", "embedding"]).materialize()
    cents = _pq_train(src, m, k, PQ_ITERS)
    sub = cents.shape[2]

    qrows = sorted(src.filter(expr=f"vec_id < {n_queries}").take_all(),
                   key=lambda r: int(r["vec_id"]))
    q_ids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    q3 = _quantize(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                             for r in qrows])).reshape(-1, m, sub)
    lut = _pq_dists(q3, cents)                           # (Q, m, k) int64
    state = ray.put((cents, lut, q_ids))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        c, tbl, qids = ray.get(state)
        v3 = _quantize(_mat(df)).reshape(-1, m, sub)
        code = _pq_dists(v3, c).argmin(axis=2)           # (B, m)
        # gather: dist[b, q] = Σ_blk tbl[q, blk, code[b, blk]]
        g = tbl[:, np.arange(m)[None, :], code]          # (Q, B, m)
        dist = g.sum(axis=2).T                           # (B, Q)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        out = []
        for qi, qid in enumerate(qids):
            d = dist[:, qi]
            keep = ids != qid                            # exclude self
            order = np.lexsort((ids[keep], d[keep]))[:topk]
            out.append(pd.DataFrame({
                "query_id": np.full(len(order), qid, dtype=np.int64),
                "neighbor_id": ids[keep][order],
                "adc_dist": d[keep][order]}))
        return pd.concat(out, ignore_index=True)

    cand = (src.map_batches(local_topk, batch_format="pandas")
            .to_pandas())                                # ≤ k·Q·#blocks
    cand = cand.sort_values(["query_id", "adc_dist", "neighbor_id"],
                            kind="stable").groupby("query_id", sort=True) \
        .head(topk).reset_index(drop=True)
    cand["rank"] = cand.groupby("query_id", sort=False).cumcount() \
        .to_numpy(dtype=np.int64) + 1
    return cand[["query_id", "neighbor_id", "rank", "adc_dist"]]


# ---- MMR: maximal-marginal-relevance diversified selection ----

MMR_K = 5                 # results to select
MMR_CAND = 20             # relevance shortlist size
MMR_QUERY_ID = 0          # fixed query vector


def mmr_select(emb: ray.data.Dataset, k: int = MMR_K,
               n_cand: int = MMR_CAND,
               query_id: int = MMR_QUERY_ID) -> pd.DataFrame:
    """(rank, vec_id, mmr2): k results for the query vector chosen by
    Maximal Marginal Relevance (Carbonell & Goldstein 1998) with
    λ = 1/2 — each step takes the candidate maximizing
    2·MMR = rel(c) − max_{s∈selected} sim(c, s), ties → lowest vec_id.
    The diversified-retrieval answer to "top-k, but not five copies of
    the same page".

    Exact-integer discipline: rel and sim are int64 dot products on the
    shared ``_quantize`` grid, so selection is deterministic and the
    DuckDB mirror (k unrolled argmax CTEs) reproduces every pick.

    Scale shape: stage 1 is the ann_topk reduce — ONE streaming pass
    emits each batch's local top-``n_cand`` by rel (slim int rows),
    driver folds ≤ n_cand·#blocks of them; stage 2 gathers ONLY the
    shortlist's vectors (n_cand rows) and runs the O(k·n_cand²) greedy
    loop driver-side — bounded by construction, never corpus-sized."""
    src = emb.select_columns(["vec_id", "embedding"]).materialize()
    qrow = src.filter(expr=f"vec_id == {query_id}").take_all()
    qv = _quantize(np.stack(
        [np.asarray(qrow[0]["embedding"], dtype=np.float64)]))[0]
    q_ref = ray.put(qv)

    def local_cand(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        v = _quantize(_mat(df))
        rel = v @ q                                  # int64 exact
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        keep = ids != query_id
        order = np.lexsort((ids[keep], -rel[keep]))[:n_cand]
        return pd.DataFrame({"vec_id": ids[keep][order],
                             "rel": rel[keep][order]})

    cand = (src.map_batches(local_cand, batch_format="pandas")
            .to_pandas())                            # ≤ n_cand·#blocks
    cand = cand.sort_values(["rel", "vec_id"], ascending=[False, True],
                            kind="stable").head(n_cand)
    cand_ids = np.sort(cand["vec_id"].to_numpy(dtype=np.int64))
    ids_ref = ray.put(set(int(i) for i in cand_ids))

    short = (src.map_batches(
        lambda df, _r=ids_ref: df[df["vec_id"].isin(ray.get(_r))],
        batch_format="pandas").take_all())           # n_cand rows only
    short = sorted(short, key=lambda r: int(r["vec_id"]))
    sids = np.array([int(r["vec_id"]) for r in short], dtype=np.int64)
    sv = _quantize(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                             for r in short]))
    rel = sv @ qv                                    # (n_cand,)
    sim = sv @ sv.T                                  # (n_cand, n_cand)

    chosen: list[int] = []
    remaining = list(range(len(sids)))
    out_rows = []
    for rank in range(1, min(k, len(sids)) + 1):
        best_i, best_score = None, None
        for i in remaining:
            div = max((int(sim[i, j]) for j in chosen), default=0)
            score = int(rel[i]) - div
            if best_score is None or score > best_score or \
                    (score == best_score and sids[i] < sids[best_i]):
                best_i, best_score = i, score
        chosen.append(best_i)
        remaining.remove(best_i)
        out_rows.append((rank, int(sids[best_i]), best_score))
    return pd.DataFrame(out_rows, columns=["rank", "vec_id", "mmr2"]) \
        .astype(np.int64)


# ---- ANN index-quality evaluation: IVF recall vs exact ground truth ----

ANN_EVAL_FP = 10 ** 6
ANN_EVAL_K = 5


def ann_recall_eval(emb: ray.data.Dataset,
                    k: int = ANN_EVAL_K) -> pd.DataFrame:
    """(query_id, n_hit, recall_fp): per-query recall@k of the
    learned-cell IVF index (:func:`ann_topk_kmeans`) against the exact
    brute-force top-k (:func:`ann_topk`) — the regression gate an ANN
    index runs after retraining the coarse quantizer (cell-boundary
    neighbors are exactly what IVF loses; this measures how many).

    Both sides are k·Q-row result sets (bounded), so the hit count is
    a driver-side merge — the expensive work is inside the two ops
    being compared, each already scale-shaped."""
    exact = ann_topk(emb, k=k).to_pandas()[["query_id", "neighbor_id"]]
    approx = ann_topk_kmeans(emb, k=k).to_pandas()[
        ["query_id", "neighbor_id"]]
    hit = exact.merge(approx, on=["query_id", "neighbor_id"])
    per_q = (exact.groupby("query_id").size().rename("n_exact")
             .to_frame()
             .join(hit.groupby("query_id").size().rename("n_hit"))
             .fillna(0).reset_index())
    return pd.DataFrame({
        "query_id": per_q["query_id"].to_numpy(np.int64),
        "n_hit": per_q["n_hit"].to_numpy(np.int64),
        "recall_fp": (per_q["n_hit"].to_numpy(np.int64) * ANN_EVAL_FP)
        // per_q["n_exact"].to_numpy(np.int64)})


# ---- hard-negative mining (retrieval / embedding training) ----

HARDNEG_K = 5


def hard_negatives(emb: ray.data.Dataset, k: int = HARDNEG_K,
                   n_queries: int = N_QUERIES) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank, cos): for each query, the top-k
    most-similar vectors with a DIFFERENT label — the hard negatives a
    contrastive embedding trainer mines (high-similarity, wrong-class
    examples are the gradient-rich ones; random negatives are too easy).

    Same broadcast + local-topk + slim-reduce shape as :func:`ann_topk`
    with the label-exclusion mask applied inside each batch, so the
    corpus streams once and only k·Q rows per block move."""
    q = (emb.filter(expr=f"vec_id < {n_queries}")
         .select_columns(["vec_id", "embedding", "label"]).take_all())
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    order = np.argsort(qids)
    qlab = np.array([int(q[i]["label"]) for i in order], dtype=np.int64)
    qm = _normed(np.stack([np.asarray(q[i]["embedding"], dtype=np.float64)
                           for i in order]))
    ref = ray.put((qids[order], qlab, qm))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, lab_q, m_q = ray.get(ref)
        m = _normed(_mat(df))
        sims = m @ m_q.T                       # (batch, Q)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        lab = df["label"].to_numpy(dtype=np.int64)
        out = []
        for qi, qid in enumerate(ids_q):
            s = sims[:, qi]
            mask = lab != lab_q[qi]            # different class only
            bi = np.flatnonzero(mask)
            sel = bi[np.lexsort((ids[bi], -s[bi]))][:k]
            out.append(pd.DataFrame({
                "query_id": np.full(len(sel), qid, dtype=np.int64),
                "neighbor_id": ids[sel],
                "cos": s[sel]}))
        return pd.concat(out, ignore_index=True)

    return (emb.select_columns(["vec_id", "embedding", "label"])
            .map_batches(local_topk, batch_format="pandas",
                         batch_size=4096)
            .groupby("query_id")
            .map_groups(_topk_of_group(k), batch_format="pandas"))


# ---- sign-binarized Hamming ANN (binary embedding search) ----

def hamming_topk(emb: ray.data.Dataset, k: int = TOPK,
                 n_queries: int = N_QUERIES) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank, hamming): top-k nearest neighbors
    under the HAMMING distance between sign-binarized embeddings (bit i
    = x_i >= 0) — Charikar-style binary codes: 64-dim floats collapse
    to a 64-bit signature (32× smaller than float32), and at serving
    scale the XOR+popcount scan replaces the float matmul. This is the
    1-bit-quantization endpoint of the quantize_embeddings (int8) /
    pq_codes (PQ) storage ladder.

    Exactness: distances are small INTEGERS, so ties at the k-th rank
    are common and ordering matters — ranked by (hamming asc,
    neighbor_id asc), reproduced exactly by the SQL mirror's
    row_number(). Self-matches excluded.

    Scale shape: queries' sign matrix broadcast once (``ray.put``);
    each batch compares vectorized bool matrices ((batch×1×D) !=
    (1×Q×D) summed over D — no packing needed at bench scale; pack to
    uint64 words + popcount when D grows); per-batch local top-k then a
    k·Q·#blocks-row reduce — the corpus never leaves its blocks."""
    q = (emb.filter(expr=f"vec_id < {n_queries}")
         .select_columns(["vec_id", "embedding"]).take_all())
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    order = np.argsort(qids)
    qbits = np.stack([np.asarray(q[i]["embedding"], dtype=np.float64) >= 0
                      for i in order])
    q_ref = ray.put((qids[order], qbits))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, qb = ray.get(q_ref)
        bits = _mat(df) >= 0                        # (batch, D) bool
        ham = (bits[:, None, :] != qb[None, :, :]).sum(axis=2,
                                                       dtype=np.int64)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        out = []
        for qi, qid in enumerate(qids):
            h = ham[:, qi]
            bi = np.flatnonzero(ids != qid)         # exclude self
            sel = bi[np.lexsort((ids[bi], h[bi]))][:k]
            out.append(pd.DataFrame({
                "query_id": np.full(len(sel), qid, dtype=np.int64),
                "neighbor_id": ids[sel],
                "hamming": h[sel]}))
        return pd.concat(out, ignore_index=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hamming", "neighbor_id"],
                          ascending=[True, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "hamming"]]

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(local_topk, batch_format="pandas", batch_size=4096)
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pandas"))


# ---- reciprocal-rank fusion of two retrievers ----

RRF_K = 60                       # Cormack et al. 2009 constant
RRF_FP = 10 ** 6


def rrf_fuse(emb: ray.data.Dataset, k: int = TOPK,
             n_queries: int = N_QUERIES) -> pd.DataFrame:
    """(query_id, neighbor_id, rrf_fp, rank): reciprocal-rank fusion
    (Cormack, Clarke & Buettcher 2009) of the full-precision cosine
    ranker (``ann_topk``) and the 1-bit Hamming ranker
    (``hamming_topk``) — the standard way a serving stack combines a
    cheap binary first-pass with an exact scorer without calibrating
    their incomparable scores: score = Σ_lists 1/(60+rank), here as the
    exact integer RRF_FP // (60 + rank). Fused rank breaks ties by
    neighbor_id.

    Scale shape: both input rankers already reduce to k·Q rows; the
    fusion is a driver-side fold of two bounded lists (never a corpus
    operation). The corpus is scanned twice (once per ranker) — at
    scale the two local-topk passes share one scan trivially."""
    a = ann_topk(emb, k=k, n_queries=n_queries).to_pandas()
    b = hamming_topk(emb, k=k, n_queries=n_queries).to_pandas()
    fp = np.int64(RRF_FP)
    a = a[["query_id", "neighbor_id"]].assign(
        s_a=fp // (RRF_K + a["rank"].to_numpy(np.int64)))
    b = b[["query_id", "neighbor_id"]].assign(
        s_b=fp // (RRF_K + b["rank"].to_numpy(np.int64)))
    m = a.merge(b, on=["query_id", "neighbor_id"], how="outer")
    m["rrf_fp"] = (m["s_a"].fillna(0).astype(np.int64)
                   + m["s_b"].fillna(0).astype(np.int64))
    m = m.sort_values(["query_id", "rrf_fp", "neighbor_id"],
                      ascending=[True, False, True], kind="stable")
    m["rank"] = m.groupby("query_id", sort=False).cumcount() + 1
    out = m[m["rank"] <= k].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "neighbor_id", "rrf_fp", "rank"]]


# ---- Matryoshka-style dimension-truncation recall eval ----

TRUNC_DIM = 16
TRUNC_FP = 10 ** 6


def dim_truncation_recall(emb: ray.data.Dataset, k: int = TOPK,
                          n_queries: int = N_QUERIES,
                          dim: int = TRUNC_DIM) -> pd.DataFrame:
    """(query_id, n_hits, recall_fp): recall@k of cosine search over the
    FIRST ``dim`` embedding dimensions against full-dimension exact
    search — the Matryoshka-truncation evaluation (Kusupati et al.
    2022) a serving stack runs before shipping shortened vectors (4×
    fewer floats at what recall?). Companion to ``ann_recall_eval``
    (IVF error) and ``quantize_embeddings``/``pq_codes`` (precision
    error): this one isolates DIMENSION error.

    Scale shape: two ``ann_topk``-shaped passes (broadcast queries,
    per-batch local top-k, k·Q-row reduce) — the truncated pass slices
    inside the batch, so the corpus never rewrites; the recall join is
    a driver fold of two k·Q lists."""
    full = ann_topk(emb, k=k, n_queries=n_queries).to_pandas()

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "embedding": [np.asarray(v, dtype=np.float64)[:dim]
                          for v in df["embedding"]]})

    trunc = ann_topk(emb.select_columns(["vec_id", "embedding"])
                     .map_batches(cut, batch_format="pandas"),
                     k=k, n_queries=n_queries).to_pandas()
    f = full.groupby("query_id")["neighbor_id"].apply(set)
    t = trunc.groupby("query_id")["neighbor_id"].apply(set)
    qids = sorted(f.index)
    hits = np.array([len(f[q] & t.get(q, set())) for q in qids],
                    dtype=np.int64)
    return pd.DataFrame({
        "query_id": np.array(qids, dtype=np.int64),
        "n_hits": hits,
        "recall_fp": np.int64(TRUNC_FP) * hits // np.int64(k)})


# ---- k-means cluster purity vs ground-truth labels ----

PURITY_FP = 10 ** 6


def kmeans_purity(emb: ray.data.Dataset) -> pd.DataFrame:
    """(cell, n_vectors, majority_label, n_majority, purity_fp): purity
    of each learned k-means cell against the embeddings' ground-truth
    ``label`` column — the standard external clustering evaluation
    (majority-label share per cluster; overall purity = Σ n_majority /
    Σ n_vectors falls out of the rows). The quality gate a re-trained
    coarse quantizer passes before it replaces the serving one, next to
    ``ann_recall_eval``'s retrieval-recall gate. Ties → smallest label.

    Scale shape: one broadcast-centroid assign pass (kmeans_fit's
    trainer already streamed the corpus); per-batch (cell, label) count
    combiner → ≤ k × #labels × #blocks slim rows folded on the
    driver."""
    cf = kmeans_fit(emb)
    kk = int(cf["cluster"].max()) + 1
    dim = int(cf["dim"].max()) + 1
    cents = np.zeros((kk, dim), dtype=np.int64)
    cents[cf["cluster"].to_numpy(), cf["dim"].to_numpy()] = \
        cf["c_fp"].to_numpy()
    c_ref = ray.put(cents)

    def counts(df: pd.DataFrame, _c=c_ref) -> pd.DataFrame:
        cell = kmeans_cells(_mat(df), ray.get(_c)).astype(np.int64)
        out = pd.DataFrame({"cell": cell,
                            "label": df["label"].to_numpy(np.int64)})
        g = out.groupby(["cell", "label"], sort=False,
                        as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["cell", "label", "n"]]

    rows = (emb.select_columns(["vec_id", "embedding", "label"])
            .map_batches(counts, batch_format="pandas")
            .to_pandas())                # ≤ k × #labels × #blocks rows
    agg = rows.groupby(["cell", "label"], sort=True)["n"].sum() \
        .reset_index()
    out = []
    for cell, g in agg.groupby("cell", sort=True):
        g = g.sort_values(["n", "label"], ascending=[False, True],
                          kind="stable")
        n_vec = int(g["n"].sum())
        maj_l, maj_n = int(g["label"].iloc[0]), int(g["n"].iloc[0])
        out.append((int(cell), n_vec, maj_l, maj_n,
                    PURITY_FP * maj_n // n_vec))
    return pd.DataFrame({
        "cell": np.array([o[0] for o in out], dtype=np.int64),
        "n_vectors": np.array([o[1] for o in out], dtype=np.int64),
        "majority_label": np.array([o[2] for o in out], dtype=np.int64),
        "n_majority": np.array([o[3] for o in out], dtype=np.int64),
        "purity_fp": np.array([o[4] for o in out], dtype=np.int64)})


# ---- per-dimension range audit (quantization calibration QC) ----

def embedding_dim_ranges(vecs: ray.data.Dataset) -> ray.data.Dataset:
    """(dim, min_val, max_val, range_val): exact per-dimension min/max
    over the embedding table — the calibration table an int8 scalar
    quantizer derives its scales from, and the drift/outlier QC that
    catches a bad encoder batch (one dimension's range exploding).
    min/max are order-independent (no float summation), so the values
    are EXACT and the DuckDB mirror matches bit-for-bit; float32 inputs
    widen exactly to float64 on output.

    Scale shape: each batch folds to one (dim, min, max) partial matrix
    (vectorized axis-0 reduce) → a ≤ dim-group Min/Max groupby."""
    from ray.data.aggregate import Max, Min

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arr = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = arr.shape[1]
        return pd.DataFrame({
            "dim": np.arange(d, dtype=np.int64),
            "mn": arr.min(axis=0), "mx": arr.max(axis=0)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mn = df["min_val"].to_numpy(np.float64)
        mx = df["max_val"].to_numpy(np.float64)
        return pd.DataFrame({
            "dim": df["dim"].astype(np.int64),
            "min_val": mn, "max_val": mx, "range_val": mx - mn})

    return (vecs.select_columns(["embedding"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=16384)
            .groupby("dim")
            .aggregate(Min("mn", alias_name="min_val"),
                       Max("mx", alias_name="max_val"))
            .map_batches(finish, batch_format="pandas"))


# ---- cross-modal: text quality per embedding label ----

CLUSTERQ_FP = 10 ** 6


def label_quality_profile(docs: ray.data.Dataset,
                          vecs: ray.data.Dataset) -> pd.DataFrame:
    """(label, n_docs, sum_quality_fp, mean_quality_fp): mean TEXT
    quality of the documents inside each embedding label group — the
    cross-modal QC join (text table × vector table on the shared
    doc/vec id) that answers "is this embedding cluster full of junk
    text?" before cluster-level corpus decisions (SemDeDup-style
    pruning keeps/drops whole clusters). Quality doubles are bit-exact
    and floored to fixed point BEFORE summing (order-independent).

    Scale shape: the docs side folds to (id, quality_fp) slim rows in
    its scan; the vecs side to (id, label); both co-partition under ONE
    shared ``id % 64`` tagged-union shuffle; the per-partition merge
    emits ≤ #labels partials → driver fold."""
    from .text import quality_batch

    P = 64

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(df)
        fp = np.floor(q["quality_score"].to_numpy(np.float64)
                      * CLUSTERQ_FP).astype(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "id": ids, "part": (ids % P).astype(np.int32),
            "side": np.zeros(len(ids), dtype=np.int8),
            "label": np.zeros(len(ids), dtype=np.int64), "fp": fp})

    def tag_vecs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "id": ids, "part": (ids % P).astype(np.int32),
            "side": np.ones(len(ids), dtype=np.int8),
            "label": df["label"].to_numpy(np.int64),
            "fp": np.zeros(len(ids), dtype=np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0][["id", "fp"]]
        v = g[g["side"] == 1][["id", "label"]]
        m = d.merge(v, on="id", how="inner")
        out = m.groupby("label", sort=False, as_index=False).agg(
            n=("id", "size"), s=("fp", "sum"))
        out["n"] = out["n"].astype(np.int64)
        out["s"] = out["s"].astype(np.int64)
        return out

    parts = (docs.select_columns(["doc_id", "text"])
             .map_batches(tag_docs, batch_format="pandas")
             .union(vecs.select_columns(["vec_id", "label"])
                    .map_batches(tag_vecs, batch_format="pandas"))
             .groupby("part").map_groups(fold, batch_format="pandas")
             .to_pandas())              # ≤ labels × parts rows
    out = parts.groupby("label", sort=True, as_index=False).agg(
        n_docs=("n", "sum"), sum_quality_fp=("s", "sum"))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_quality_fp"] = out["sum_quality_fp"].astype(np.int64)
    out["mean_quality_fp"] = (out["sum_quality_fp"].to_numpy(np.int64)
                              // np.maximum(out["n_docs"]
                                            .to_numpy(np.int64), 1))
    out["label"] = out["label"].astype(np.int64)
    return out[["label", "n_docs", "sum_quality_fp",
                "mean_quality_fp"]]


# ---- embedding similarity histogram (corpus-geometry QC) ----

SIM_HIST_STRIDES = (1, 17)     # deterministic pair lattice: (i, i+s)
SIM_Q = 10 ** 6                # component quantization (1e-6 grid)
SIM_BUCKET_DIV = 10 ** 11      # dot_e12 → ~21 buckets over [-1, 1]
SIM_PAIR_PARTS = 64


def embedding_sim_histogram(emb: ray.data.Dataset) -> ray.data.Dataset:
    """(stride, bucket, n_pairs): distribution of pairwise similarity
    over the deterministic pair lattice (vec_id, vec_id+stride) — the
    corpus-geometry QC readout (a healthy embedding space is centered
    near 0; a collapsed encoder shows a spike near 1) without an O(n²)
    pass or RNG.

    Exactness: components quantize to the 1e-6 integer grid; the dot
    product is a pure int64 sum (64 dims × 1e12 « 2⁶³), and the bucket
    is truncating division ``sign·(|dot|//1e11)`` — DuckDB's ``//``
    truncates toward zero, numpy floors, so the kernel matches DuckDB
    explicitly.

    Scale shape: each vector ships to its pair partitions (2·|strides|
    slim quantized copies, role-tagged); ONE pair-key co-partition
    aligns (left=i, right=i+s) rows; the dot is one stacked matmul per
    partition; output partials are ≤ strides × buckets rows. No
    driver-side matrix, no all-pairs."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(m * SIM_Q + 0.5).astype(np.int64)
        outs = []
        for s in SIM_HIST_STRIDES:
            for role, key in ((0, ids), (1, ids - s)):
                o = pd.DataFrame({
                    "pk": key, "stride": np.int64(s),
                    "role": np.int8(role),
                    "part": ((key % SIM_PAIR_PARTS + SIM_PAIR_PARTS)
                             % SIM_PAIR_PARTS).astype(np.int32)})
                o["vec"] = list(q)
                outs.append(o)
        return pd.concat(outs, ignore_index=True)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s in SIM_HIST_STRIDES:
            gs = g[g["stride"] == s]
            l = gs[gs["role"] == 0][["pk", "vec"]]
            r = gs[gs["role"] == 1][["pk", "vec"]]
            m = l.merge(r, on="pk", how="inner", suffixes=("_l", "_r"))
            if not len(m):
                continue
            a = np.stack(m["vec_l"].to_numpy())
            b = np.stack(m["vec_r"].to_numpy())
            dot = (a * b).sum(axis=1)
            bucket = np.sign(dot) * (np.abs(dot) // SIM_BUCKET_DIV)
            h = pd.DataFrame({"bucket": bucket.astype(np.int64)}) \
                .groupby("bucket", as_index=False).size()
            h["stride"] = np.int64(s)
            outs.append(pd.DataFrame({
                "stride": h["stride"].to_numpy(np.int64),
                "bucket": h["bucket"].to_numpy(np.int64),
                "n_pairs": h["size"].to_numpy(np.int64)}))
        if not outs:
            return pd.DataFrame({"stride": np.empty(0, np.int64),
                                 "bucket": np.empty(0, np.int64),
                                 "n_pairs": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    from ray.data.aggregate import Sum
    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(tag, batch_format="pandas", batch_size=8192)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby(["stride", "bucket"])
            .aggregate(Sum("n_pairs", alias_name="n_pairs")))


# ---- cross-modal coverage audit (docs ∖ embeddings anti-join) ----

COVERAGE_FP = 10 ** 6


def embedding_coverage(docs: ray.data.Dataset,
                       emb: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs, n_with_embedding, coverage_fp): per language, how
    many documents have an embedding row (doc_id = vec_id) — the
    before-training audit that catches a failed embed shard (a corpus
    slice silently missing from the index is the classic production
    hole a coverage join finds).

    Scale shape: both sides slim to id-keyed tagged rows (docs carry
    lang, embeddings carry presence only); ONE id-hash co-partition
    resolves membership with a sorted-array probe per partition and
    folds to ≤ langs partials; final Sum groupby is tiny."""
    P = 64

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": ids, "part": (ids % P).astype(np.int32),
            "side": np.zeros(len(ids), dtype=np.int8),
            "lang": df["lang"].to_numpy(dtype=object)})

    def tag_emb(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": ids, "part": (ids % P).astype(np.int32),
            "side": np.ones(len(ids), dtype=np.int8),
            "lang": np.full(len(ids), "", dtype=object)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        have = np.unique(g.loc[g["side"] == 1, "k"].to_numpy(np.int64))
        d = g[g["side"] == 0]
        kk = d["k"].to_numpy(np.int64)
        if len(have):
            pos = np.searchsorted(have, kk)
            pos[pos == len(have)] = 0
            hit = have[pos] == kk
        else:
            hit = np.zeros(len(kk), dtype=bool)
        t = pd.DataFrame({"lang": d["lang"].to_numpy(dtype=object),
                          "hit": hit.astype(np.int64)})
        agg = t.groupby("lang", as_index=False).agg(
            n_docs=("hit", "size"), n_with=("hit", "sum"))
        return pd.DataFrame({
            "lang": agg["lang"].to_numpy(dtype=object),
            "n_docs": agg["n_docs"].to_numpy(np.int64),
            "n_with_embedding": agg["n_with"].to_numpy(np.int64)})

    from ray.data.aggregate import Sum

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_docs"].to_numpy(np.int64)
        w = df["n_with_embedding"].to_numpy(np.int64)
        return pd.DataFrame({
            "lang": df["lang"].to_numpy(dtype=object),
            "n_docs": n, "n_with_embedding": w,
            "coverage_fp": np.int64(COVERAGE_FP) * w
            // np.maximum(n, 1)})

    return (docs.select_columns(["doc_id", "lang"])
            .map_batches(tag_docs, batch_format="pandas",
                         batch_size=65536)
            .union(emb.select_columns(["vec_id"])
                   .map_batches(tag_emb, batch_format="pandas",
                                batch_size=65536))
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_with_embedding",
                           alias_name="n_with_embedding"))
            .map_batches(finish, batch_format="pandas"))


def pq_recall_eval(emb: ray.data.Dataset,
                   k: int = PQ_TOPK) -> pd.DataFrame:
    """(query_id, n_hit, recall_fp): per-query recall@k of the PQ-ADC
    code search (:func:`pq_topk`) against the exact brute-force cosine
    top-k (:func:`ann_topk`) — the QUANTIZATION-loss regression gate,
    companion to :func:`ann_recall_eval`'s cell-boundary-loss gate (a
    production index retrains codebooks and cells independently; each
    needs its own recall alarm).

    Both sides are k·Q-row bounded result sets, so the hit count is a
    driver-side merge — the expensive work is inside the two searches,
    each already scale-shaped."""
    exact = ann_topk(emb, k=k).to_pandas()[["query_id", "neighbor_id"]]
    approx = pq_topk(emb, topk=k)[["query_id", "neighbor_id"]]
    hit = exact.merge(approx, on=["query_id", "neighbor_id"])
    per_q = (exact.groupby("query_id").size().rename("n_exact")
             .to_frame()
             .join(hit.groupby("query_id").size().rename("n_hit"))
             .fillna(0).reset_index())
    return pd.DataFrame({
        "query_id": per_q["query_id"].to_numpy(np.int64),
        "n_hit": per_q["n_hit"].to_numpy(np.int64),
        "recall_fp": (per_q["n_hit"].to_numpy(np.int64) * ANN_EVAL_FP)
        // per_q["n_exact"].to_numpy(np.int64)})


# ---- nearest-class-mean probe (linear-probe label-quality eval) ----

def nearest_centroid_confusion(emb: ray.data.Dataset) -> ray.data.Dataset:
    """(label, pred_label, n_vecs): confusion matrix of the
    nearest-class-mean classifier — train = per-label mean vector
    (exact fixed-point sums via :func:`embedding_centroids`), predict =
    argmin squared distance to the class means, ties to the lowest
    label. The standard cheap "linear probe": how separable the label
    classes are in embedding space, and which pairs confuse — the
    label-quality / embedding-quality eval a curation pipeline runs
    before trusting either for filtering.

    Exactness: class means are floored fixed-point integers
    (``sum_fp // n``, numpy floor division mirrored by an explicit
    posmod floor in SQL), vectors quantize at the same power-of-two
    scale (the float64 multiply is exact), and all distances are int64
    (max |x_fp| ~ 2^20 → d² ≤ dim·2^42 — no overflow), so the argmin
    and its tie-break are bit-deterministic.

    Scale shape: pass 1 is the centroids' partial-sum reduce; the ≤
    labels×dim mean matrix broadcasts via ``ray.put``; pass 2 is a
    map-only scoring stream (int64 matmul per batch, B×L distances)
    folding to ≤ labels² partial count rows per batch → tiny Sum."""
    from ray.data.aggregate import Sum

    cent = embedding_centroids(emb).to_pandas()     # ≤ labels×dim rows
    cent = cent.sort_values(["label", "dim"])
    labels = np.sort(cent["label"].unique()).astype(np.int64)
    dim = int(cent["dim"].max()) + 1
    s = cent["sum_fp"].to_numpy(np.int64).reshape(len(labels), dim)
    n = cent["n_vecs"].to_numpy(np.int64).reshape(len(labels), dim)
    mu = s // n                                     # floor division
    ref = ray.put((labels, mu))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        labels_, mu_ = ray.get(ref)
        x = np.floor(_mat(df) * float(CENTROID_FP)).astype(np.int64)
        xx = (x * x).sum(axis=1)                    # (B,)
        cc = (mu_ * mu_).sum(axis=1)                # (L,)
        d2 = xx[:, None] + cc[None, :] - 2 * (x @ mu_.T)
        pred = labels_[np.argmin(d2, axis=1)]       # first min = lowest
        g = pd.DataFrame({"label": df["label"].to_numpy(np.int64),
                          "pred_label": pred,
                          "n_vecs": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["label", "pred_label"], as_index=False).sum()

    return (emb.select_columns(["label", "embedding"])
            .map_batches(score, batch_format="pandas")
            .groupby(["label", "pred_label"])
            .aggregate(Sum("n_vecs", alias_name="n_vecs")))


# ---- label-MRR retrieval eval (embedding + label quality gate) ----

def ann_label_mrr(emb: ray.data.Dataset, k: int = TOPK,
                  n_queries: int = N_QUERIES) -> pd.DataFrame:
    """(query_id, query_label, first_hit_rank, mrr_fp): for each query
    vector, the rank of the FIRST exact-cosine top-``k`` neighbor that
    shares the query's label (0 = no hit in the top-k), and the
    fixed-point reciprocal rank ``ANN_EVAL_FP // rank``. The standard
    retrieval eval (MRR) against labels-as-relevance: dropping MRR
    flags embedding OR label degradation before either gates a
    curation run — companion to :func:`ann_recall_eval` (index loss)
    and :func:`nearest_centroid_confusion` (separability).

    Scale shape: the expensive work is :func:`ann_topk`'s distributed
    search (bounded k·Q result); labels attach via a broadcast-id
    filtered stream (≤ Q·(k+1) slim rows — never a whole-table label
    pull); the fold is a driver-side merge over the bounded set.
    Integer reciprocal ranks — exact."""
    topk = ann_topk(emb, k=k, n_queries=n_queries).to_pandas()
    if not len(topk):
        # an empty map_groups output loses its schema — normalize so the
        # zero-top-k degenerate case (single-vector table) still yields
        # the full query-id domain below
        topk = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "cos": pd.Series([], dtype=np.float64)})
    ids = np.sort(np.unique(np.concatenate(
        [topk["query_id"].to_numpy(np.int64),
         topk["neighbor_id"].to_numpy(np.int64)]))) if len(topk) else \
        np.empty(0, np.int64)
    ids_ref = ray.put(ids)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        ids_ = ray.get(ids_ref)
        v = df["vec_id"].to_numpy(np.int64)
        # always keep the query-id domain (vec_id < n_queries) so every
        # query appears in the output even with zero top-k rows — the
        # SQL mirror LEFT JOINs over the full query domain
        ok = v < n_queries
        if len(ids_):
            pos = np.searchsorted(ids_, v)
            np.minimum(pos, len(ids_) - 1, out=pos)
            ok = ok | (ids_[pos] == v)
        return pd.DataFrame({"vec_id": v[ok],
                             "label": df["label"].to_numpy(np.int64)[ok]})

    lab = (emb.select_columns(["vec_id", "label"])
           .map_batches(pick, batch_format="pandas").to_pandas())
    lmap = lab.set_index("vec_id")["label"]
    qids = np.sort(
        lab.loc[lab["vec_id"] < n_queries, "vec_id"].unique()) \
        .astype(np.int64)
    m = topk.copy()
    m["qlab"] = lmap.reindex(m["query_id"].to_numpy(np.int64)) \
        .to_numpy(np.int64)
    m["nlab"] = lmap.reindex(m["neighbor_id"].to_numpy(np.int64)) \
        .to_numpy(np.int64)
    hit = m[m["qlab"] == m["nlab"]]
    first = hit.groupby("query_id")["rank"].min()
    r = first.reindex(qids).fillna(0).to_numpy(np.int64)
    return pd.DataFrame({
        "query_id": qids,
        "query_label": lmap.reindex(qids).to_numpy(np.int64),
        "first_hit_rank": r,
        "mrr_fp": np.where(r > 0, ANN_EVAL_FP // np.maximum(r, 1), 0)
        .astype(np.int64)})


# ---- IVF cell-balance audit (index-health readout) ----

CELL_GINI_FP = 10 ** 6


def ivf_cell_balance(emb: ray.data.Dataset) -> pd.DataFrame:
    """(n_cells, n_vecs, max_cell, min_cell, gini_fp): balance audit of
    the IVF coarse cells (the ``label`` column = cell id, as in
    :func:`ann_topk_ivf`): a skewed cell-size distribution means the
    partitioned search degenerates to brute force on hot cells and the
    per-cell top-k loses recall on starved ones — the index-health gate
    to run after (re)training cells. gini_fp uses the same exact
    integer Gini as ``graph.host_indegree_gini``:
    GINI_FP·Σᵢ(2i−n−1)·xᵢ // (n·Σx) over ascending cell sizes.

    Scale shape: per-batch per-cell count partials → ≤ #cells rows to
    the driver, where the rank sum is one vectorized pass. The vectors
    themselves never move."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"label": df["label"].to_numpy(np.int64),
                          "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby("label", as_index=False).sum()

    per = (emb.select_columns(["label"])
           .map_batches(partial, batch_format="pandas")
           .groupby("label").aggregate(Sum("n", alias_name="n"))
           .to_pandas())                       # <= #cells rows
    if not len(per):
        return pd.DataFrame({"n_cells": [0], "n_vecs": [0],
                             "max_cell": [0], "min_cell": [0],
                             "gini_fp": [0]}).astype(np.int64)
    x = np.sort(per["n"].to_numpy(np.int64))
    n = len(x)
    tot = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    gini = int(CELL_GINI_FP * int(((2 * i - n - 1) * x).sum())
               // (n * tot)) if tot else 0
    return pd.DataFrame({
        "n_cells": np.array([n], np.int64),
        "n_vecs": np.array([tot], np.int64),
        "max_cell": np.array([int(x[-1])], np.int64),
        "min_cell": np.array([int(x[0])], np.int64),
        "gini_fp": np.array([gini], np.int64)})
