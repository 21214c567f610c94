"""Discovery lineage over the page link graph — the J5/L1 "history
semi-join" family: every URL's shortest discovery path from the seed
list, with per-lineage hasSeen suppression (a url never re-enters its
own ancestry).

Reference parity: ghcrawler threads a traversal history through each
request (`lib/request.js` context / `lib/visitorMap.js` path navigation,
`lib/crawler.js` seen-check before requeue); the analogue here is the
explicit `lineage` column (seed > ... > url) plus BFS-level dedup.

Ray-Data-first shape: level-synchronous BFS. Each level advance is two
co-partition reduce-side joins expressed as union + groupby — no driver
materialization of the graph:

  1. children:   union(level rows keyed by url, edges keyed by src)
                 → groupby(key) → emit (child, parent, parent_lineage)
  2. next level: union(children keyed by child, seen urls)
                 → groupby(key) → drop if seen, else keep the MIN parent
                 (deterministic tie-break) and extend its lineage.

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

MAX_LINEAGE_DEPTH = 3
SEP = " > "

_EMPTY_LEVEL = pd.DataFrame({
    "url": pd.Series(dtype=str), "depth": pd.Series(dtype=np.int64),
    "parent_url": pd.Series(dtype=str), "lineage": pd.Series(dtype=str)})


def _seed_level(seeds: list[str]) -> pd.DataFrame:
    urls = sorted({s for s in seeds if s.startswith("http")})
    return pd.DataFrame({
        "url": pd.Series(urls, dtype=str),
        "depth": np.zeros(len(urls), dtype=np.int64),
        "parent_url": pd.Series([""] * len(urls), dtype=str),
        "lineage": pd.Series(urls, dtype=str)})


def _emit_children(g: pd.DataFrame) -> pd.DataFrame:
    """Join group: P row = this url is on the current level; C rows = its
    out-edges. Emits (child, parent, parent lineage)."""
    p = g[g["tag"] == "P"]
    c = g[g["tag"] == "C"]
    if not len(p) or not len(c):
        return pd.DataFrame({"child": pd.Series(dtype=str),
                             "parent": pd.Series(dtype=str),
                             "plineage": pd.Series(dtype=str)})
    lineage = p["lineage"].iloc[0]        # url unique within a level
    key = p["key"].iloc[0]
    return pd.DataFrame({"child": c["child"].astype(str),
                         "parent": key,
                         "plineage": lineage})


def _make_pick(depth: int):
    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if (g["tag"] == "S").any():       # per-lineage/global hasSeen
            return _EMPTY_LEVEL
        c = g[g["tag"] == "C"]
        if not len(c):
            return _EMPTY_LEVEL
        best = c.sort_values("parent", kind="stable").iloc[0]
        url = str(best["key"])
        return pd.DataFrame({
            "url": [url], "depth": np.array([depth], dtype=np.int64),
            "parent_url": [str(best["parent"])],
            "lineage": [str(best["plineage"]) + SEP + url]})
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
        return pd.DataFrame({"key": df["src_url"].astype(str),
                             "child": df["dst_url"].astype(str),
                             "lineage": "", "tag": "C"})

    edges = links.map_batches(as_edges, batch_format="pandas")

    for d in range(1, max_depth + 1):
        lvl_keyed = level.map_batches(
            lambda df: pd.DataFrame({"key": df["url"].astype(str),
                                     "child": "", "lineage": df["lineage"],
                                     "tag": "P"}), batch_format="pandas")
        children = (edges.union(lvl_keyed)
                    .groupby("key")
                    .map_groups(_emit_children, batch_format="pandas"))
        cand = children.map_batches(
            lambda df: pd.DataFrame({"key": df["child"].astype(str),
                                     "parent": df["parent"],
                                     "plineage": df["plineage"], "tag": "C"}),
            batch_format="pandas")
        seen_keyed = seen.map_batches(
            lambda df: pd.DataFrame({"key": df["url"].astype(str),
                                     "parent": "", "plineage": "",
                                     "tag": "S"}), batch_format="pandas")
        level = (cand.union(seen_keyed)
                 .groupby("key")
                 .map_groups(_make_pick(d), batch_format="pandas")
                 .materialize())
        if not level.count():
            break
        out.append(level)
        seen = seen.union(level.select_columns(["url"])).materialize()

    res = out[0]
    for lv in out[1:]:
        res = res.union(lv)
    return res
