"""Discovery lineage over the page link graph — the J5/L1 "history
semi-join" family: every URL's shortest discovery path from the seed
list, with hasSeen suppression (a url never re-enters a lineage).

Reference parity: ghcrawler threads a traversal history through each
request (`lib/request.js` context / `lib/visitorMap.js` path navigation,
`lib/crawler.js` seen-check before requeue); the analogue here is the
explicit `lineage` column (seed > ... > url) plus BFS-level dedup.

Ray-Data-first shape: level-synchronous BFS. Each level advance is two
co-partition reduce-side joins expressed as tagged union + ONE
``groupby('part')`` over a COARSE ``hash64(key) % N_LIN_PARTS`` int key,
with the actual join/pick vectorized in pandas across ALL of a
partition's keys. (The first cut grouped by the raw url string — a
string sort-shuffle of the full edge set per level AND one Python group
invocation per distinct url: measured 313 s at sf0.1; this shape runs
the same BFS in a few seconds.)

Each level is materialized once (the BFS frontier, bounded by graph
width) and unioned into the result. At 100 TB the edges dataset should
be hash-partitioned by src once and reused across levels; the per-level
shuffle cost is then O(frontier), not O(E) — documented assumption, the
composition below re-shuffles edges per level for simplicity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .urls import hash64_array

MAX_LINEAGE_DEPTH = 3
SEP = " > "
N_LIN_PARTS = 64

_EMPTY_LEVEL = pd.DataFrame({
    "url": pd.Series(dtype=str), "depth": pd.Series(dtype=np.int64),
    "parent_url": pd.Series(dtype=str), "lineage": pd.Series(dtype=str)})


def _parts(s: pd.Series) -> np.ndarray:
    return (hash64_array(s.astype(str)) % N_LIN_PARTS).astype(np.int32)


def _seed_level(seeds: list[str]) -> pd.DataFrame:
    urls = sorted({s for s in seeds if s.startswith("http")})
    return pd.DataFrame({
        "url": pd.Series(urls, dtype=str),
        "depth": np.zeros(len(urls), dtype=np.int64),
        "parent_url": pd.Series([""] * len(urls), dtype=str),
        "lineage": pd.Series(urls, dtype=str)})


def _join_part(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse partition: level rows (tag P: key=url, lineage) ×
    edge rows (tag C: key=src, child) → (child, parent, plineage),
    vectorized merge across all the partition's urls."""
    p = g.loc[g["tag"] == "P", ["key", "lineage"]]
    c = g.loc[g["tag"] == "C", ["key", "child"]]
    if not len(p) or not len(c):
        return pd.DataFrame({"child": pd.Series(dtype=str),
                             "parent": pd.Series(dtype=str),
                             "plineage": pd.Series(dtype=str)})
    m = c.merge(p, on="key", how="inner")
    return pd.DataFrame({"child": m["child"].astype(str),
                         "parent": m["key"].astype(str),
                         "plineage": m["lineage"].astype(str)})


def _make_pick(depth: int):
    def pick(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse partition: candidate rows (tag C: key=child,
        parent, plineage) minus seen keys (tag S), then min-parent per
        child — sort + drop_duplicates, no per-key Python."""
        seen_keys = g.loc[g["tag"] == "S", "key"]
        c = g[g["tag"] == "C"]
        if not len(c):
            return _EMPTY_LEVEL
        c = c[~c["key"].isin(set(seen_keys))]
        if not len(c):
            return _EMPTY_LEVEL
        best = c.sort_values(["key", "parent"], kind="stable") \
            .drop_duplicates("key", keep="first")
        url = best["key"].astype(str)
        return pd.DataFrame({
            "url": url,
            "depth": np.full(len(best), depth, dtype=np.int64),
            "parent_url": best["parent"].astype(str).to_numpy(),
            "lineage": (best["plineage"].astype(str) + SEP + url)
            .to_numpy()})
    pick.__name__ = f"pick_level_{depth}"
    return pick


def discovery_lineage(links: ray.data.Dataset, seeds: list[str],
                      max_depth: int = MAX_LINEAGE_DEPTH) -> ray.data.Dataset:
    """BFS lineage table (url, depth, parent_url, lineage) from ``seeds``
    over ``links`` (columns src_url, dst_url), depth ≤ ``max_depth``.
    Parent tie-break = lexicographic min parent url (deterministic, and
    expressible as ``min(src)`` in the DuckDB mirror)."""
    level = ray.data.from_pandas(_seed_level(seeds)).materialize()
    out = [level]
    seen = level.select_columns(["url"]).materialize()

    def as_edges(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src_url"].astype(str)
        return pd.DataFrame({"part": _parts(src), "key": src,
                             "child": df["dst_url"].astype(str),
                             "lineage": "", "tag": "C"})

    # materialize once: a lazy `edges` would re-run the upstream link
    # extraction every level (Ray Data does not dedupe shared sub-DAGs);
    # the table is slim (part, src, dst, lineage-tag columns)
    edges = links.map_batches(as_edges, batch_format="pandas") \
        .repartition(N_LIN_PARTS).materialize()

    for d in range(1, max_depth + 1):
        lvl_keyed = level.map_batches(
            lambda df: pd.DataFrame({"part": _parts(df["url"]),
                                     "key": df["url"].astype(str),
                                     "child": "", "lineage": df["lineage"],
                                     "tag": "P"}), batch_format="pandas")
        # materialize between the two coparts: a fused execution of two
        # chained union+groupby all-to-alls runs far slower than the two
        # executions separately (measured in ops/graph.pagerank); the
        # intermediate is slim (child, parent, plineage) rows
        children = (edges.union(lvl_keyed)
                    .groupby("part")
                    .map_groups(_join_part, batch_format="pandas")
                    .repartition(N_LIN_PARTS)
                    .materialize())
        cand = children.map_batches(
            lambda df: pd.DataFrame({"part": _parts(df["child"]),
                                     "key": df["child"].astype(str),
                                     "parent": df["parent"],
                                     "plineage": df["plineage"], "tag": "C"}),
            batch_format="pandas")
        seen_keyed = seen.map_batches(
            lambda df: pd.DataFrame({"part": _parts(df["url"]),
                                     "key": df["url"].astype(str),
                                     "parent": "", "plineage": "",
                                     "tag": "S"}), batch_format="pandas")
        # repartition pins block counts (Ray shuffles emit one output
        # partition per input block and unions concatenate block lists;
        # see ops/graph.pagerank for the measured blow-up)
        level = (cand.union(seen_keyed)
                 .groupby("part")
                 .map_groups(_make_pick(d), batch_format="pandas")
                 .repartition(N_LIN_PARTS)
                 .materialize())
        if not level.count():
            break
        out.append(level)
        seen = seen.union(level.select_columns(["url"])) \
            .repartition(N_LIN_PARTS).materialize()

    res = out[0]
    for lv in out[1:]:
        res = res.union(lv)
    return res
