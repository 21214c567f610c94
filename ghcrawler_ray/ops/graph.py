"""Distributed PageRank over the crawl's link graph — the canonical
iterative graph op a web-scale pipeline runs on its extracted links
(host/url authority for frontier prioritization; the reference's
weighted queue selection `providers/queuing/queueSet.js:46-65` is the
degenerate one-shot version of "rank, then fetch best-first").

Ray-Data-first shape (per iteration, all rows slim — urls + int64s,
never html):
  1. contributions: co-partition JOIN ranks × (edges⋈outdeg) on src —
     one ``groupby(hash(src) % P)`` shuffle, vectorized pandas merge
     within each coarse partition (same tagged-union pattern as
     ``ops.relational.order_revenue_join``);
  2. in-sums: ``groupby(dst)`` via per-batch partial sums (combiner)
     then one hash aggregate;
  3. next ranks: co-partition LEFT JOIN nodes × in-sums.
The static edge⋈outdeg table is computed once and reused across
iterations. Convergence work is O(E) slim rows per iteration — the
textbook distributed power iteration.

Exactness: ranks are carried as int64 fixed-point (1e-12 units of
probability mass) and every step is INTEGER arithmetic with floor
division — order-independent, bit-identical to the unrolled DuckDB
mirror (`//`), no float summation anywhere. Damping 0.85 is applied as
(85·x)//100; per-edge contribution is r_src // outdeg. Floor-division
remainders and dangling-node mass leak out of the system (total mass
shrinks slightly per iteration) — acceptable for ranking, documented
here, and reproduced exactly by the mirror.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..urls import hash64_array

PR_ITERS = 3
PR_TOTAL = 10 ** 12          # fixed-point scale: 1.0 of rank mass
N_GRAPH_PARTS = 64


def _part_of(urls: pd.Series) -> np.ndarray:
    return (hash64_array(urls) % N_GRAPH_PARTS).astype(np.int32)


def _copart(left: ray.data.Dataset, right: ray.data.Dataset, join):
    """Tagged-union co-partition join: both sides carry (part, side, …);
    ``join`` sees one coarse partition with both sides present."""
    return left.union(right).groupby("part").map_groups(
        join, batch_format="pandas")


def pagerank(links: ray.data.Dataset, nodes: ray.data.Dataset,
             iters: int = PR_ITERS) -> ray.data.Dataset:
    """(url, rank_fp, score) after ``iters`` damped power iterations.
    ``links`` = (src_url, dst_url) rows (multi-edges count once each);
    ``nodes`` = (url) rows; edges whose dst is not a node are dropped
    (rank flows only within the fetched page set). rank_fp is the exact
    int64 fixed-point mass (1e-12 units), score = rank_fp / 1e12."""
    n = nodes.count()
    base = (15 * (PR_TOTAL // n)) // 100
    r0 = PR_TOTAL // n

    # fixed shuffle-partition count, same reasoning as the wave engine
    # (pipelines/wave.py): Ray's default min_parallelism=200 sprays 200
    # reduce partitions per all-to-all, and with two barriers per
    # iteration the fixed cost compounds; the partition count is a JOB
    # parameter, independent of cluster size
    ctx = ray.data.DataContext.get_current()
    prev_par = ctx.min_parallelism
    ctx.min_parallelism = N_GRAPH_PARTS

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"].astype(str),
                             "part": _part_of(df["url"])})

    node_tbl = nodes.map_batches(node_rows, batch_format="pandas") \
        .materialize()

    # ---- static: edges joined with outdeg, keyed by src ----
    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        # co-partition by DST first to keep only edges into the node set
        return pd.DataFrame({"part": _part_of(df["dst_url"]),
                             "side": np.zeros(len(df), dtype=np.int8),
                             "key": df["dst_url"].astype(str),
                             "aux": df["src_url"].astype(str)})

    def node_probe(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part": df["part"],
                             "side": np.ones(len(df), dtype=np.int8),
                             "key": df["url"],
                             "aux": df["url"]})

    def keep_known_dst(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        known = set(g.loc[g["side"] == 1, "key"])
        ok = e["key"].isin(known)
        return pd.DataFrame({"src": e.loc[ok, "aux"].to_numpy(dtype=object),
                             "dst": e.loc[ok, "key"].to_numpy(dtype=object)})

    # materialize: cuts the extraction lineage so the src-keyed
    # re-partition below starts from the slim (src, dst) table.
    edges = _copart(
        links.map_batches(edge_rows, batch_format="pandas"),
        node_tbl.map_batches(node_probe, batch_format="pandas"),
        keep_known_dst).materialize()

    # outdeg: every edge of a src lands in the same src-keyed partition,
    # so the degree is a vectorized transform('size') INSIDE the one
    # co-partition pass — no string-keyed deg aggregate, no deg⋈edges
    # join (the first cut's groupby('src') sort-shuffled ~1M url strings).
    # From here on the loop carries INT64 NODE IDS (hash64(url), the same
    # identity the whole engine keys on) — urls rejoin only at the end,
    # so each iteration shuffles pure-integer rows.
    def edge_tag(df: pd.DataFrame) -> pd.DataFrame:
        sid = hash64_array(df["src"].astype(str))
        return pd.DataFrame({"part": (sid % N_GRAPH_PARTS).astype(np.int32),
                             "src_id": sid,
                             "dst_id": hash64_array(df["dst"].astype(str))})

    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src_id", "dst_id"]].copy()
        g["d"] = g.groupby("src_id", sort=False)["src_id"] \
            .transform("size").to_numpy(dtype=np.int64)
        return g

    # pin block counts: Ray's sort-shuffle emits one output partition
    # per INPUT block, and union concatenates block lists — without the
    # repartitions below every iteration inherits the previous one's
    # blocks and the shuffle fans out further each round (measured
    # 64 -> 640 blocks and 2.5 s -> 24 s per iteration at sf0.1)
    edges_deg = (edges.map_batches(edge_tag, batch_format="pandas")
                 .groupby("part")
                 .map_groups(attach_deg, batch_format="pandas")
                 .repartition(N_GRAPH_PARTS)
                 .materialize())

    def id_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part": df["part"],
                             "nid": hash64_array(df["url"])})

    node_ids = node_tbl.map_batches(id_rows, batch_format="pandas") \
        .materialize()

    # ---- iterate ----
    def rank_init(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["part", "nid"]].copy()
        out["r"] = np.full(len(df), r0, dtype=np.int64)
        return out

    ranks = node_ids.map_batches(rank_init, batch_format="pandas") \
        .materialize()

    def rank_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part": df["part"],
                             "side": np.ones(len(df), dtype=np.int8),
                             "key": df["nid"].to_numpy(dtype=np.int64),
                             "aux": np.zeros(len(df), dtype=np.int64),
                             "aux_i": df["r"].to_numpy(dtype=np.int64)})

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        r = g[g["side"] == 1].set_index("key")["aux_i"]
        rv = e["key"].map(r).to_numpy(dtype=np.int64)
        dv = e["aux_i"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"dst_id": e["aux"].to_numpy(dtype=np.int64),
                             "c": rv // dv})

    def contrib_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("dst_id", sort=False)["c"].sum().reset_index()
        s["c"] = s["c"].astype(np.int64)
        return s

    def insum_tag(df: pd.DataFrame) -> pd.DataFrame:
        d = df["dst_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"part": (d % N_GRAPH_PARTS).astype(np.int32),
                             "side": np.zeros(len(df), dtype=np.int8),
                             "key": d,
                             "aux": np.zeros(len(df), dtype=np.int64),
                             "aux_i": df["c"].to_numpy(dtype=np.int64)})

    def node_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part": df["part"],
                             "side": np.ones(len(df), dtype=np.int8),
                             "key": df["nid"].to_numpy(dtype=np.int64),
                             "aux": np.zeros(len(df), dtype=np.int64),
                             "aux_i": np.zeros(len(df), dtype=np.int64)})

    def next_rank(g: pd.DataFrame) -> pd.DataFrame:
        # side-0 rows are per-BATCH partials (combiner output), so the
        # final per-node in-sum is a vectorized groupby-sum INSIDE this
        # co-partition pass — the first cut ran a separate string-keyed
        # groupby('dst') aggregate per iteration
        nd = g[g["side"] == 1]
        s = g[g["side"] == 0].groupby("key", sort=False)["aux_i"].sum()
        ins = nd["key"].map(s).fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "nid": nd["key"].to_numpy(dtype=np.int64),
            "part": nd["part"].to_numpy(dtype=np.int32),
            "r": base + (85 * ins) // 100})

    for _ in range(iters):
        # edges_deg is tagged side=0 with aux_i=outdeg; ranks side=1
        def edge_retag(df: pd.DataFrame) -> pd.DataFrame:
            sid = df["src_id"].to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "part": (sid % N_GRAPH_PARTS).astype(np.int32),
                "side": np.zeros(len(df), dtype=np.int8),
                "key": sid,
                "aux": df["dst_id"].to_numpy(dtype=np.int64),
                "aux_i": df["d"].to_numpy(dtype=np.int64)})

        # materialize between the two coparts: Ray executes a union of a
        # multi-stage lazy chain with a materialized side poorly (one
        # fused execution with two all-to-alls ran ~15x slower than the
        # two executions separately — measured 35 s vs 2.4 s/stage at
        # sf0.1); the intermediate is slim (dst_id, c) combiner rows
        contribs = _copart(
            edges_deg.map_batches(edge_retag, batch_format="pandas"),
            ranks.map_batches(rank_tag, batch_format="pandas"),
            contrib).map_batches(contrib_partial,
                                 batch_format="pandas") \
            .repartition(N_GRAPH_PARTS).materialize()
        ranks = _copart(
            contribs.map_batches(insum_tag, batch_format="pandas"),
            node_ids.map_batches(node_tag, batch_format="pandas"),
            next_rank).repartition(N_GRAPH_PARTS).materialize()

    ctx.min_parallelism = prev_par

    # map node ids back to urls: one final co-partition join
    def rank_out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part": df["part"],
                             "tag": np.zeros(len(df), dtype=np.int8),
                             "nid": df["nid"].to_numpy(dtype=np.int64),
                             "url": "",
                             "r": df["r"].to_numpy(dtype=np.int64)})

    def url_out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part": df["part"],
                             "tag": np.ones(len(df), dtype=np.int8),
                             "nid": hash64_array(df["url"]),
                             "url": df["url"].astype(str),
                             "r": np.zeros(len(df), dtype=np.int64)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        u = g[g["tag"] == 1].set_index("nid")["url"]
        rk = g[g["tag"] == 0]
        r = rk["r"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"url": rk["nid"].map(u).to_numpy(dtype=object),
                             "rank_fp": r,
                             "score": r / 1e12})

    return (ranks.map_batches(rank_out, batch_format="pandas")
            .union(node_tbl.map_batches(url_out, batch_format="pandas"))
            .groupby("part").map_groups(finish, batch_format="pandas"))


def degree_stats(links: ray.data.Dataset) -> ray.data.Dataset:
    """(url, out_degree, in_degree) over the extracted link graph —
    the first-look authority/hub profile a crawl operator reads (and
    the exact input a HITS/PageRank sanity check wants). One streaming
    explode pass — each edge contributes a (node, is_out) row,
    pre-summed per batch (combiner) — then a single slim
    ``groupby(url)`` aggregate; edge endpoints never move twice and the
    shuffle is #distinct-node-rows sized. Reference context: queue-depth
    / store-count style operator counters (`lib/crawlerService.js`
    stats), generalized per node."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src_url"].astype(str)
        dst = df["dst_url"].astype(str)
        part = pd.DataFrame({
            "url": pd.concat([src, dst], ignore_index=True),
            "out_p": np.concatenate([np.ones(len(src), dtype=np.int64),
                                     np.zeros(len(dst), dtype=np.int64)]),
            "in_p": np.concatenate([np.zeros(len(src), dtype=np.int64),
                                    np.ones(len(dst), dtype=np.int64)])})
        agg = part.groupby("url", sort=False, as_index=False).sum()
        # int shuffle key: a groupby over raw url STRINGS sort-shuffles
        # megabytes of text (measured 136 s vs 3 s at sf0.1); the coarse
        # hash co-partition moves the same combiner rows under an int32
        agg["part"] = _part_of(agg["url"])
        return agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("url", sort=False, as_index=False)[
            ["out_p", "in_p"]].sum()
        return pd.DataFrame({
            "url": out["url"],
            "out_degree": out["out_p"].to_numpy(dtype=np.int64),
            "in_degree": out["in_p"].to_numpy(dtype=np.int64)})

    return (links.select_columns(["src_url", "dst_url"])
            .map_batches(explode, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))
