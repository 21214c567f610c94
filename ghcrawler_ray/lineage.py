"""Discovery lineage over the page link graph — the J5/L1 "history
semi-join" family: every URL's shortest discovery path from the seed
list, with hasSeen suppression (a url never re-enters a lineage).

Reference parity: ghcrawler threads a traversal history through each
request (`lib/request.js` context / `lib/visitorMap.js` path navigation,
`lib/crawler.js` seen-check before requeue); the analogue here is the
explicit `lineage` column (seed > ... > url) plus BFS-level dedup.

Architecture (the same partition-actor shape as `ops/graph.pagerank` —
the one case the Dataset API can't express well, because a Dataset
shuffle cannot PIN the static edge table in place across BFS levels; the
previous Dataset-only composition re-shuffled all O(E) edges per level,
~2 barriers × 2-3 s of fixed all-to-all cost each):

  setup: ONE streaming ``map_batches`` pass over links slices each batch
  by ``hash64(src) % P`` and pushes the (src, dst) slices straight into
  that partition's ``_LinShard`` actor (task→actor object-store
  transfer, never via the driver). Seeds are scattered the same way by
  ``hash64(url) % P``.
  per level: each shard joins its own frontier × its own edges (both
  live on the shard — frontier urls and edge srcs share the hash
  partitioning), scatters candidate (child, parent, parent-lineage)
  slices to the child's shard as ``ray.put`` refs; the child's shard
  drops already-seen children (its local seen set IS the hasSeen
  suppression), picks the lexicographic-min parent per child, extends
  the lineage string, and the survivors become its next frontier.
  Per-level traffic is O(frontier-adjacent candidates); edges never
  move again.
  output: shards emit their accumulated (url, depth, parent_url,
  lineage) rows → ``from_pandas_refs`` — no final join.

Partitioning assumption: P shards each hold E/P edges + the seen/result
rows of V/P urls — the same per-core working set a reduce task would
hold, but persistent; size P to the cluster like reduce partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .urls import hash64_array

MAX_LINEAGE_DEPTH = 3
SEP = " > "
N_LIN_PARTS = 64

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


def _slice_by_part(part: np.ndarray, n_parts: int, *cols: np.ndarray):
    order = np.argsort(part, kind="stable")
    sp = part[order]
    cols = [c[order] for c in cols]
    bounds = np.searchsorted(sp, np.arange(n_parts + 1))
    for p in range(n_parts):
        lo, hi = bounds[p], bounds[p + 1]
        if lo != hi:
            yield p, *(c[lo:hi] for c in cols)


@ray.remote(num_cpus=0)
class _LinShard:
    """One BFS partition: static edges keyed by hash(src)%P, plus the
    partition's seen set, current frontier and accumulated result rows
    for urls keyed by hash(url)%P (src- and url-partitioning coincide,
    so a shard's frontier joins its own edges locally)."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts
        self._edge_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.seen: set[str] = set()
        self.frontier = pd.DataFrame({"url": pd.Series(dtype=str),
                                      "lineage": pd.Series(dtype=str)})
        self.results: list[pd.DataFrame] = []

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._edge_chunks.append((src, dst))
        return len(src)

    def seal_edges(self) -> None:
        if self._edge_chunks:
            src = np.concatenate([c[0] for c in self._edge_chunks])
            dst = np.concatenate([c[1] for c in self._edge_chunks])
        else:
            src = np.empty(0, dtype=object)
            dst = np.empty(0, dtype=object)
        self._edge_chunks = []
        self.edges = pd.DataFrame({
            "src": pd.Series(src, dtype=object),
            "dst": pd.Series(dst, dtype=object),
            "dpart": (hash64_array(pd.Series(dst, dtype=str))
                      % self.n_parts).astype(np.int32)
            if len(dst) else np.empty(0, dtype=np.int32)})

    def add_seeds(self, level: pd.DataFrame) -> None:
        self.seen.update(level["url"])
        self.frontier = level[["url", "lineage"]].reset_index(drop=True)
        self.results.append(level)

    def expand(self) -> dict:
        """Join own frontier × own edges; scatter (child, parent,
        parent-lineage) candidate slices to the child's shard."""
        if not len(self.frontier) or not len(self.edges):
            self.frontier = self.frontier.iloc[:0]
            return {}
        m = self.edges.merge(self.frontier.rename(
            columns={"url": "src", "lineage": "plineage"}), on="src")
        self.frontier = self.frontier.iloc[:0]
        if not len(m):
            return {}
        return {p: ray.put((c, par, pl)) for p, c, par, pl in
                _slice_by_part(m["dpart"].to_numpy(np.int64), self.n_parts,
                               m["dst"].to_numpy(dtype=object),
                               m["src"].to_numpy(dtype=object),
                               m["plineage"].to_numpy(dtype=object))}

    def absorb(self, depth: int, refs: list) -> int:
        """Fold inbound candidates: drop seen children (hasSeen
        suppression), min-parent tie-break, extend lineage; survivors
        are this shard's next frontier."""
        if not refs:
            return 0
        parts = ray.get(list(refs))
        c = pd.DataFrame({
            "key": np.concatenate([p[0] for p in parts]),
            "parent": np.concatenate([p[1] for p in parts]),
            "plineage": np.concatenate([p[2] for p in parts])})
        c = c[~c["key"].isin(self.seen)]
        if not len(c):
            return 0
        best = c.sort_values(["key", "parent"], kind="stable") \
            .drop_duplicates("key", keep="first")
        url = best["key"].astype(str)
        level = pd.DataFrame({
            "url": url,
            "depth": np.full(len(best), depth, dtype=np.int64),
            "parent_url": best["parent"].astype(str).to_numpy(),
            "lineage": (best["plineage"].astype(str) + SEP + url)
            .to_numpy()})
        self.seen.update(level["url"])
        self.frontier = level[["url", "lineage"]].reset_index(drop=True)
        self.results.append(level)
        return len(level)

    def result_rows(self) -> pd.DataFrame:
        if not self.results:
            return _EMPTY_LEVEL
        return pd.concat(self.results, ignore_index=True)


def discovery_lineage(links: ray.data.Dataset, seeds: list[str],
                      max_depth: int = MAX_LINEAGE_DEPTH) -> ray.data.Dataset:
    """BFS lineage table (url, depth, parent_url, lineage) from ``seeds``
    over ``links`` (columns src_url, dst_url), depth ≤ ``max_depth``.
    Parent tie-break = lexicographic min parent url (deterministic, and
    expressible as ``min(src)`` in the DuckDB mirror)."""
    P = N_LIN_PARTS
    shards = [_LinShard.remote(p, P) for p in range(P)]

    def scatter_edges(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src_url"].astype(str).to_numpy(dtype=object)
        dst = df["dst_url"].astype(str).to_numpy(dtype=object)
        spart = (hash64_array(df["src_url"].astype(str)) % P)
        refs = [shards[p].add_edges.remote(s, d) for p, s, d in
                _slice_by_part(spart.astype(np.int64), P, src, dst)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    links.map_batches(scatter_edges, batch_format="pandas").materialize()
    ray.get([s.seal_edges.remote() for s in shards])

    seed_df = _seed_level(seeds)
    spart = (hash64_array(seed_df["url"]) % P).astype(np.int64)
    ray.get([shards[p].add_seeds.remote(
        seed_df[spart == p].reset_index(drop=True))
        for p in np.unique(spart)])

    for d in range(1, max_depth + 1):
        outs = ray.get([s.expand.remote() for s in shards])
        grew = ray.get([shards[q].absorb.remote(
            d, [outs[p][q] for p in range(P) if q in outs[p]])
            for q in range(P)])
        if sum(grew) == 0:
            break

    # materialize while the shards are alive (return values are
    # driver-owned, but this avoids lineage reconstruction needing the
    # by-then-terminated actors)
    out = ray.data.from_pandas_refs(
        [s.result_rows.remote() for s in shards]).materialize()
    for s in shards:        # deterministic teardown: scatter closures
        ray.kill(s)         # hold handles, so GC alone is late
    return out


def depth_profile(lin: ray.data.Dataset) -> pd.DataFrame:
    """(depth, n_urls, n_hosts): discovery volume per BFS depth from the
    lineage table — the frontier-expansion curve (how fast the crawl
    exhausts its seed neighborhoods, where new hosts stop appearing).

    Scale shape: per-batch (depth, host) combiner with in-batch url
    counts; the fold is ≤ depths × #hosts × #blocks slim rows (depth is
    capped at MAX_LINEAGE_DEPTH)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)")[0].str.lower())
        out = pd.DataFrame({"depth": df["depth"].astype(np.int64),
                            "host": host}).dropna()
        g = out.groupby(["depth", "host"], sort=False,
                        as_index=False).size()
        g["n_urls"] = g["size"].astype(np.int64)
        return g[["depth", "host", "n_urls"]]

    rows = (lin.select_columns(["url", "depth"])
            .map_batches(partial, batch_format="pandas")
            .to_pandas())
    agg = rows.groupby(["depth", "host"], sort=True)["n_urls"].sum() \
        .reset_index()
    out = agg.groupby("depth", sort=True).agg(
        n_urls=("n_urls", "sum"), n_hosts=("host", "size")).reset_index()
    for c in ("depth", "n_urls", "n_hosts"):
        out[c] = out[c].astype(np.int64)
    return out
