"""Distributed PageRank over the crawl's link graph — the canonical
iterative graph op a web-scale pipeline runs on its extracted links
(host/url authority for frontier prioritization; the reference's
weighted queue selection `providers/queuing/queueSet.js:46-65` is the
degenerate one-shot version of "rank, then fetch best-first").

Architecture (the "actor pool holding static state" pattern — the one
place the Dataset API genuinely can't express the semantics, because a
Dataset shuffle cannot PIN the static edge table in place across
iterations; a Dataset-only power iteration re-shuffles all O(E) edges
every round, measured 9 s/iteration at sf0.1):

  setup (ZERO Dataset all-to-alls — a sort-shuffle of ~1M tiny-block
  rows cost 11-13 s per barrier at sf0.1, pure fixed overhead):
    1. one streaming ``map_batches`` pass over links: urls hashed to
       int64 node ids in-task, each batch sliced by hash(dst)%P and the
       slices pushed straight into the destination ``_GraphShard``
       actors (object-store transfer task→actor, never via the driver);
    2. one streaming pass over nodes pushing (nid, url) slices the same
       way;
    3. shard-side exchange: each dst-shard drops edges whose dst was
       never fetched (local sorted-membership test) and re-scatters the
       survivors to their hash(src)%P shard as ``ray.put`` partials —
       only ObjectRefs flow through the driver. The src-shard computes
       out-degrees locally (all of a src's edges land in its shard) and
       holds the edge arrays for the whole run.
  per iteration (no Dataset execution, no edge movement):
    each shard vectorizes c = r_src // outdeg over its own edges,
    partial-sums by destination shard, and ``ray.put``s one slim
    (dst_id, c) partial PER TARGET SHARD; P² refs through the driver,
    each shard fetches exactly the O(V/P) partial rows destined for it
    and folds them into next ranks. Per-iteration traffic is O(V)
    combiner rows total vs O(E) for the shuffle shape.
  output: shards kept (nid → url), so they emit finished
    (url, rank_fp, score) Arrow tables → ``from_arrow_refs`` — no final
    join pass either.

Partitioning assumption: P (= N_GRAPH_PARTS) shards each hold E/P
edges + V/P rank entries in memory — the same per-core working set a
sort-shuffle reduce task would hold, but persistent. Size P to the
cluster's aggregate heap at the 10^10-URL design point exactly as you
would size reduce partitions.

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

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..urls import hash64_array

PR_ITERS = 3
PR_TOTAL = 10 ** 12          # fixed-point scale: 1.0 of rank mass
N_GRAPH_PARTS = 64


def _sum_by_key(keys: np.ndarray, vals: np.ndarray):
    """Vectorized groupby-sum over int64 keys: sort + reduceat."""
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = vals[order]
    if len(k) == 0:
        return k, v
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    return k[starts], np.add.reduceat(v, starts)


def _slice_by_part(part: np.ndarray, n_parts: int, *cols: np.ndarray):
    """Yield (p, col-slices...) for each non-empty partition, after one
    stable argsort of the partition keys."""
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    cols = [c[order] for c in cols]
    bounds = np.searchsorted(sorted_part, np.arange(n_parts + 1))
    for p in range(n_parts):
        lo, hi = bounds[p], bounds[p + 1]
        if lo != hi:
            yield p, *(c[lo:hi] for c in cols)


def _empty_graph_table(**cols) -> "ray.data.Dataset":
    """Typed empty result for the zero-node/zero-edge degenerate case."""
    return ray.data.from_arrow(pa.table(
        {k: pa.array([], type=t) for k, t in cols.items()}))


@ray.remote(num_cpus=0)
class _GraphShard:
    """One graph partition: static (src, dst, outdeg) edge arrays, the
    partition's (nid → url) map and its current integer ranks.
    num_cpus=0 like the seen shards — P shards must co-exist on any
    cluster size; per-iteration compute is a few vectorized numpy
    passes over E/P rows."""

    def __init__(self, part: int, n_parts: int, base: int, r0: int):
        self.part = part
        self.n_parts = n_parts
        self.base = base
        self.r0 = r0
        self._basev: np.ndarray | None = None   # per-node base (PPR mode)
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []
        self._edge_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._node_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.nids = np.empty(0, dtype=np.int64)

    def count_seeds(self, seeds_sorted: np.ndarray) -> int:
        """#owned nodes present in the sorted seed-nid array."""
        if not len(self.nids) or not len(seeds_sorted):
            return 0
        pos = np.searchsorted(seeds_sorted, self.nids)
        np.minimum(pos, len(seeds_sorted) - 1, out=pos)
        return int((seeds_sorted[pos] == self.nids).sum())

    def personalize(self, seeds_sorted: np.ndarray, base: int,
                    r0: int) -> None:
        """Switch to seed-personalized teleport (PPR): base/r0 mass
        only on owned nodes in the seed set; call after ``seal``."""
        if len(self.nids) and len(seeds_sorted):
            pos = np.searchsorted(seeds_sorted, self.nids)
            np.minimum(pos, len(seeds_sorted) - 1, out=pos)
            sel = seeds_sorted[pos] == self.nids
        else:
            sel = np.zeros(len(self.nids), dtype=bool)
        self._basev = np.where(sel, np.int64(base), np.int64(0))
        self.r = np.where(sel, np.int64(r0), np.int64(0))

    def add_pending(self, src: np.ndarray, dst: np.ndarray) -> int:
        """Receive raw edges routed by hash(dst)%P (membership filter
        happens here, where this shard's node set lives)."""
        self._pending.append((np.asarray(src, dtype=np.int64),
                              np.asarray(dst, dtype=np.int64)))
        return len(src)

    def add_nodes(self, nids: np.ndarray, urls: np.ndarray) -> int:
        self._node_chunks.append((np.asarray(nids, dtype=np.int64),
                                  np.asarray(urls, dtype=object)))
        return len(nids)

    def seal_nodes(self) -> None:
        if self._node_chunks:
            nid = np.concatenate([c[0] for c in self._node_chunks])
            url = np.concatenate([c[1] for c in self._node_chunks])
            order = np.argsort(nid, kind="stable")
            keep = np.r_[True, nid[order][1:] != nid[order][:-1]]
            self.nids = nid[order][keep]
            self.urls = url[order][keep]
        else:
            self.urls = np.empty(0, dtype=object)
        self._node_chunks = []

    def filter_scatter(self) -> dict:
        """Drop pending edges whose dst was never fetched (local sorted
        membership) and re-scatter survivors to their hash(src)%P shard:
        {src_part: ObjectRef of (src, dst slices)}."""
        if self._pending:
            src = np.concatenate([c[0] for c in self._pending])
            dst = np.concatenate([c[1] for c in self._pending])
        else:
            src = dst = np.empty(0, dtype=np.int64)
        self._pending = []
        if len(self.nids) and len(dst):
            pos = np.searchsorted(self.nids, dst)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == dst
            src, dst = src[ok], dst[ok]
        else:
            src = dst = np.empty(0, dtype=np.int64)
        return {p: ray.put((s, d)) for p, s, d in
                _slice_by_part((src % self.n_parts).astype(np.int64),
                               self.n_parts, src, dst)}

    def recv_edges(self, refs: list) -> None:
        for s, d in ray.get(list(refs)):
            self._edge_chunks.append((s, d))

    def seal(self) -> None:
        """Freeze edges: per-edge out-degrees (every edge of a src lives
        in this shard), edges grouped by destination shard so
        contribution partials slice cheaply; init ranks."""
        if self._edge_chunks:
            src = np.concatenate([c[0] for c in self._edge_chunks])
            dst = np.concatenate([c[1] for c in self._edge_chunks])
        else:
            src = np.empty(0, dtype=np.int64)
            dst = np.empty(0, dtype=np.int64)
        self._edge_chunks = []
        # out-degree per edge row (multi-edges count once each, matching
        # the mirror): group sizes via sort + reduceat
        uk, cnt = _sum_by_key(src, np.ones(len(src), dtype=np.int64))
        deg = cnt[np.searchsorted(uk, src)] if len(src) else \
            np.empty(0, dtype=np.int64)
        dpart = (dst % self.n_parts).astype(np.int64)
        order = np.argsort(dpart, kind="stable")
        self.src = src[order]
        self.dst = dst[order]
        self.deg = deg[order]
        self._bounds = np.searchsorted(dpart[order],
                                       np.arange(self.n_parts + 1))
        self.r = np.full(len(self.nids), self.r0, dtype=np.int64)

    def contrib_refs(self) -> dict:
        """One power-iteration scatter: {dst_part: ObjectRef of
        (dst_id array, partial-sum array)} — each target shard fetches
        only its own slim partial, never the whole contribution set."""
        rank_per_edge = self.r[np.searchsorted(self.nids, self.src)]
        c = rank_per_edge // self.deg
        out = {}
        for p in range(self.n_parts):
            lo, hi = self._bounds[p], self._bounds[p + 1]
            if lo == hi:
                continue
            k, v = _sum_by_key(self.dst[lo:hi], c[lo:hi])
            out[p] = ray.put((k, v))
        return out

    def apply(self, refs: list) -> None:
        """Gather this shard's inbound partials and fold next ranks:
        r = base + (85 · insum) // 100 (insum 0 for no inflow)."""
        ins = np.zeros(len(self.nids), dtype=np.int64)
        if refs:
            parts = ray.get(list(refs))
            k = np.concatenate([p[0] for p in parts])
            v = np.concatenate([p[1] for p in parts])
            uk, sv = _sum_by_key(k, v)
            idx = np.searchsorted(self.nids, uk)
            ins[idx] = sv
        base = self._basev if self._basev is not None else self.base
        self.r = base + (85 * ins) // 100

    def ranks_arrow(self) -> pa.Table:
        return pa.table({
            "url": pa.array(self.urls, type=pa.string()),
            "rank_fp": pa.array(self.r, type=pa.int64()),
            "score": pa.array(self.r / 1e12, type=pa.float64())})


def _part_of(urls: pd.Series) -> np.ndarray:
    return (hash64_array(urls) % N_GRAPH_PARTS).astype(np.int32)


def pagerank(links: ray.data.Dataset, nodes: ray.data.Dataset,
             iters: int = PR_ITERS,
             seed_urls: list | None = None) -> ray.data.Dataset:
    """(url, rank_fp, score) after ``iters`` damped power iterations.
    ``links`` = (src_url, dst_url) rows (multi-edges count once each);
    ``nodes`` = (url) rows; edges whose dst is not a node are dropped
    (rank flows only within the fetched page set). rank_fp is the exact
    int64 fixed-point mass (1e-12 units), score = rank_fp / 1e12.

    ``seed_urls`` switches to seed-personalized PageRank (the
    TrustRank/PPR shape at page level): ALL teleport mass concentrates
    on the fetched members of the seed set (base = 15%·(TOTAL//n_seeds)
    on seeds, 0 elsewhere) — authority relative to the crawl's trusted
    entry points; pages unreachable from any seed score exactly 0. The
    shard machinery is identical; only the base vector changes."""
    n = nodes.count()
    if n == 0:
        return _empty_graph_table(url=pa.string(), rank_fp=pa.int64(),
                                  score=pa.float64())
    base = (15 * (PR_TOTAL // n)) // 100
    r0 = PR_TOTAL // n
    # Shard count scales with |V| (~25k nodes/shard, ≥4, capped at
    # N_GRAPH_PARTS): the iteration exchanges P² rank-partial refs per
    # round, so over-sharding a small graph pays pure RPC latency
    # (64 shards on a 200k-node graph measured 3× slower than 8).
    # The result is partition-count-invariant — exact integer sums.
    P = max(4, min(N_GRAPH_PARTS, n // 25_000 + 1))
    shards = [_GraphShard.remote(p, P, base, r0) for p in range(P)]

    # ---- setup pass 1: stream links, hash urls to int64 node ids
    # in-task, slice each batch by hash(dst)%P and push the slices
    # straight into the destination shards (task→actor object-store
    # transfer; the arrays are deserialized into the actor heap, so
    # nothing depends on the transient map task after it exits) ----
    def scatter_edges(df: pd.DataFrame) -> pd.DataFrame:
        sid = hash64_array(df["src_url"].astype(str))
        did = hash64_array(df["dst_url"].astype(str))
        refs = [shards[p].add_pending.remote(s, d) for p, s, d in
                _slice_by_part((did % P).astype(np.int64), P, sid, did)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    # ---- setup pass 2: stream nodes, push (nid, url) slices; the url
    # strings stay in the owning shard so the output needs no join ----
    def scatter_nodes(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].astype(str).to_numpy(dtype=object)
        nid = hash64_array(df["url"])
        refs = [shards[p].add_nodes.remote(i, u) for p, i, u in
                _slice_by_part((nid % P).astype(np.int64), P, nid, urls)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    links.map_batches(scatter_edges, batch_format="pandas").materialize()
    nodes.map_batches(scatter_nodes, batch_format="pandas").materialize()

    # ---- shard-side exchange: dst-shards drop never-fetched dsts and
    # re-scatter survivors to their src-shard; refs only via driver ----
    ray.get([s.seal_nodes.remote() for s in shards])
    outs = ray.get([s.filter_scatter.remote() for s in shards])
    ray.get([shards[q].recv_edges.remote(
        [outs[p][q] for p in range(P) if q in outs[p]])
        for q in range(P)])
    ray.get([s.seal.remote() for s in shards])

    if seed_urls is not None:
        sids = np.sort(np.unique(hash64_array(
            pd.Series(sorted(set(map(str, seed_urls)))))))
        ns = sum(ray.get([s.count_seeds.remote(sids) for s in shards]))
        if ns:
            r0s = PR_TOTAL // ns
            ray.get([s.personalize.remote(sids, (15 * r0s) // 100, r0s)
                     for s in shards])
        else:                     # no fetched seed → all-zero ranks
            ray.get([s.personalize.remote(sids, 0, 0) for s in shards])

    # ---- iterate: scatter/gather of O(V)-sized rank partials only ----
    for _ in range(iters):
        outs = ray.get([s.contrib_refs.remote() for s in shards])
        ray.get([shards[q].apply.remote(
            [outs[p][q] for p in range(P) if q in outs[p]])
            for q in range(P)])

    # materialize while the shards are alive (the returned tables are
    # driver-owned return values, but materializing avoids any lineage
    # reconstruction needing the by-then-terminated actors)
    out = ray.data.from_arrow_refs(
        [s.ranks_arrow.remote() for s in shards]).materialize()
    for s in shards:        # deterministic teardown: scatter closures
        ray.kill(s)         # hold handles, so GC alone is late
    return out


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


# ---- host-graph connected components (site-cluster discovery) ----

#: 15 hex digits = 60-bit md5-derived node ids (fit int64; the SQL
#: mirror computes the identical value)
HOSTC_HEX = 15
_HOST_RE = r"^https?://([^/?#]+)"


def _host_ids(hosts) -> np.ndarray:
    m = hashlib.md5
    return np.fromiter(
        (int(m(h.encode()).hexdigest()[:HOSTC_HEX], 16) for h in hosts),
        dtype=np.int64, count=len(hosts))


def host_components(links: ray.data.Dataset) -> ray.data.Dataset:
    """(host, node_id, component_id, component_size): weakly-connected
    components of the HOST graph (an edge wherever any page of host A
    links any page of host B) — the site-cluster / link-farm discovery
    pass a crawl runs to group mutually-linking domains.
    component_id = min md5-derived node id in the component.

    Scale shape: page-level edges collapse to distinct host pairs
    INSIDE each batch (the host graph is orders of magnitude smaller
    than the url graph), labels come from the same delta-BSP
    min-label propagation as near-dup clustering
    (``ops.dedup._cc_labels`` — one co-partition shuffle per round,
    single-task fold below its output-scale bound), and the final
    host/label/size merge is a #hosts-bounded driver fold (the same
    O(#hosts) sidecar budget as the politeness and metrics designs).

    Reference context: host/org grouping is the reference's allow-list
    + org-filter unit (`lib/crawler.js:587-589` split of host/org);
    components generalize it to the discovered link structure."""
    from .dedup import _cc_labels

    pairs = _host_pairs_raw(links)
    hosts = sorted(set(pairs["a"]) | set(pairs["b"]))
    ids = _host_ids(hosts)
    id_of = dict(zip(hosts, ids))
    e = pairs[pairs["a"] != pairs["b"]]
    edges = pd.DataFrame({
        "doc_a": e["a"].map(id_of).to_numpy(dtype=np.int64),
        "doc_b": e["b"].map(id_of).to_numpy(dtype=np.int64)})
    if len(edges):
        lab = (_cc_labels(ray.data.from_pandas(edges), len(edges))
               .to_pandas())
        label_of = dict(zip(lab["node"].astype(np.int64),
                            lab["label"].astype(np.int64)))
    else:
        label_of = {}
    comp = np.array([label_of.get(int(i), int(i)) for i in ids],
                    dtype=np.int64)
    sizes = pd.Series(comp).value_counts()
    out = pd.DataFrame({
        "host": np.array(hosts, dtype=object),
        "node_id": ids,
        "component_id": comp,
        "component_size": pd.Series(comp).map(sizes)
        .to_numpy(dtype=np.int64)})
    return ray.data.from_pandas(out)


def host_triangles(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_triangles): per-host triangle participation in the
    undirected HOST graph (edge wherever any page of host A links any
    page of host B, self-loops dropped) — the clustering-structure /
    link-ring signal next to ``host_components``' reachability.

    Scale shape: page-level edges collapse to distinct host pairs
    inside each batch, then one global distinct groupby — the host-pair
    list is orders of magnitude smaller than the url graph (the same
    #hosts-bounded budget as ``host_components``, which pulls the same
    table). The triangle enumeration is two vectorized merges over the
    canonicalized (s < d) edge list: e(a,b) ⋈ e(b,c) ⋈ e(a,c) with
    a < b < c, so each triangle is counted exactly once. At a scale
    where host pairs outgrow one task, the same two joins run as
    hash64(key) co-partition stages (the order_revenue_join shape)."""

    pairs = _host_pairs_raw(links)
    a = pairs["a"].to_numpy(dtype=object)
    b = pairs["b"].to_numpy(dtype=object)
    keep = a != b
    e = pd.DataFrame({"s": np.minimum(a[keep], b[keep]),
                      "d": np.maximum(a[keep], b[keep])}).drop_duplicates()
    m = e.merge(e, left_on="d", right_on="s", suffixes=("_1", "_2"))
    # (a=s_1, b=d_1=s_2, c=d_2) with a<b<c; close with the (a, c) edge
    tri = m.merge(e, left_on=["s_1", "d_2"], right_on=["s", "d"],
                  how="inner")
    hosts = np.concatenate([tri["s_1"].to_numpy(dtype=object),
                            tri["d_1"].to_numpy(dtype=object),
                            tri["d_2"].to_numpy(dtype=object)])
    if not len(hosts):
        return pd.DataFrame({"host": np.empty(0, object),
                             "n_triangles": np.empty(0, np.int64)})
    cnt = pd.Series(hosts, dtype=object).value_counts()
    return pd.DataFrame({"host": cnt.index.to_numpy(dtype=object),
                         "n_triangles": cnt.to_numpy(dtype=np.int64)})


def host_clustering(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, degree, n_triangles, coeff_fp): local clustering
    coefficient of each host in the undirected host graph —
    coeff = 2·triangles / (degree·(degree−1)), carried as an exact
    integer fixed-point ``(2·tri·10⁶) // (deg·(deg−1))`` (0 when
    degree < 2) so the SQL mirror is bit-exact. High-degree hosts with
    near-zero coefficients are hub/spam-farm candidates; near-1
    coefficients mark tight link rings.

    Same #hosts-bounded budget as ``host_triangles``: the page graph
    collapses to distinct host pairs once, and degree (distinct
    neighbors) + triangle participation both come from that canonical
    edge list with vectorized merges."""

    pairs = _host_pairs_raw(links)
    a = pairs["a"].to_numpy(dtype=object)
    b = pairs["b"].to_numpy(dtype=object)
    keep = a != b
    e = pd.DataFrame({"s": np.minimum(a[keep], b[keep]),
                      "d": np.maximum(a[keep], b[keep])}).drop_duplicates()
    deg = pd.Series(np.concatenate([e["s"].to_numpy(dtype=object),
                                    e["d"].to_numpy(dtype=object)]),
                    dtype=object).value_counts()   # distinct neighbors
    m = e.merge(e, left_on="d", right_on="s", suffixes=("_1", "_2"))
    tri = m.merge(e, left_on=["s_1", "d_2"], right_on=["s", "d"],
                  how="inner")
    tcnt = pd.Series(np.concatenate([
        tri["s_1"].to_numpy(dtype=object),
        tri["d_1"].to_numpy(dtype=object),
        tri["d_2"].to_numpy(dtype=object)]) if len(tri)
        else np.empty(0, object), dtype=object).value_counts()
    host = deg.index.to_numpy(dtype=object)
    d_ = deg.to_numpy(dtype=np.int64)
    t_ = tcnt.reindex(host, fill_value=0).to_numpy(dtype=np.int64)
    denom = d_ * (d_ - 1)
    coeff = np.where(denom > 0, (2 * t_ * 10 ** 6) // np.maximum(denom, 1),
                     0).astype(np.int64)
    out = pd.DataFrame({"host": host, "degree": d_, "n_triangles": t_,
                        "coeff_fp": coeff})
    return out.sort_values("host", kind="stable").reset_index(drop=True)


# ---- HITS hubs/authorities over the host graph ----

HITS_ITERS = 2
HITS_FP = 10 ** 6


def host_hits(links: ray.data.Dataset,
              iters: int = HITS_ITERS) -> pd.DataFrame:
    """(host, hub_fp, auth_fp) after ``iters`` integer fixed-point HITS
    iterations on the DIRECTED host graph (edge A→B wherever any page
    of host A links any page of host B, self-loops dropped) — the
    hub/authority complement to ``pagerank``'s single-score authority:
    link farms score as hubs, heavily-cited content hosts as
    authorities.

    Per iteration (Kleinberg's update with L1 normalization, all
    integer so the unrolled-CTE DuckDB mirror is bit-exact)::

        auth_raw[d] = Σ_{(s,d)∈E} hub[s];  auth = auth_raw·FP // Σ auth_raw
        hub_raw[s]  = Σ_{(s,d)∈E} auth[d]; hub  = hub_raw·FP // Σ hub_raw

    Scale shape: page edges collapse to distinct host pairs per batch →
    one global distinct groupby; iterations run on the #hosts-bounded
    canonical edge list (the same budget as ``host_triangles`` /
    ``host_components``), vectorized groupby-sums per round."""

    pairs = _host_pairs_raw(links)
    e = pairs[pairs["a"] != pairs["b"]].reset_index(drop=True)
    hosts = np.array(sorted(set(e["a"]) | set(e["b"])), dtype=object)
    idx = {h: i for i, h in enumerate(hosts)}
    src = e["a"].map(idx).to_numpy(dtype=np.int64)
    dst = e["b"].map(idx).to_numpy(dtype=np.int64)
    fp = np.int64(HITS_FP)
    hub = np.full(len(hosts), fp, dtype=np.int64)
    auth = np.full(len(hosts), fp, dtype=np.int64)
    for _ in range(iters):
        ar = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(ar, dst, hub[src])
        s = ar.sum()
        auth = (ar * fp) // s if s else ar
        hr = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(hr, src, auth[dst])
        s = hr.sum()
        hub = (hr * fp) // s if s else hr
    return pd.DataFrame({"host": hosts, "hub_fp": hub, "auth_fp": auth})


# ---- harmonic closeness centrality over the host graph ----

HC_FP = 10 ** 6


def host_closeness(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_reachable, harmonic_fp): per-host harmonic centrality
    Σ_{d(h,x)>0} FP // d(h,x) over the undirected HOST graph — the
    "how central is this site in the crawl's link structure" readout
    (harmonic form chosen over classic closeness because it is defined
    on disconnected graphs, Boldi & Vigna 2014). Integer fixed-point:
    1/d as FP // d, so every value is exact and the recursive-CTE
    oracle reproduces it bit-for-bit.

    Scale shape: page edges collapse to distinct host pairs per batch
    and one global distinct groupby (the #hosts-bounded table every
    host-graph op here shares); all-sources BFS is vectorized boolean
    frontier expansion over the n×n adjacency — n = #hosts is a
    BOUNDED job parameter (≈10⁵ even web-scale), and past that the
    same expansion runs as the delta-BSP rounds of
    ``host_components``."""
    pairs = _host_pairs_raw(links)
    a = pairs["a"].to_numpy(dtype=object)
    b = pairs["b"].to_numpy(dtype=object)
    keep = a != b
    hosts = np.unique(np.concatenate([a[keep], b[keep]]))
    pos = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    if n > HOST_DENSE_MAX:
        return _host_closeness_anf(a[keep], b[keep], hosts)
    adj = np.zeros((n, n), dtype=bool)
    ai = np.fromiter((pos[x] for x in a[keep]), dtype=np.int64)
    bi = np.fromiter((pos[x] for x in b[keep]), dtype=np.int64)
    adj[ai, bi] = True
    adj[bi, ai] = True                                # undirected

    reached = np.eye(n, dtype=bool)
    frontier = reached.copy()
    harmonic = np.zeros(n, dtype=np.int64)
    d = 0
    while frontier.any() and d < n:
        d += 1
        frontier = (frontier @ adj) & ~reached
        harmonic += frontier.sum(axis=1, dtype=np.int64) \
            * (np.int64(HC_FP) // np.int64(d))
        reached |= frontier
    return pd.DataFrame({
        "host": hosts.astype(object),
        "n_reachable": reached.sum(axis=1, dtype=np.int64) - 1,
        "harmonic_fp": harmonic})


# ---- shared bounded host-edge collapse ----

_PAIR_PARTS = 32
_PAIR_BATCH = 65536


def _host_pairs_raw(links: ray.data.Dataset) -> pd.DataFrame:
    """Distinct directed host pairs (self-loops INCLUDED) — the
    #hosts-bounded table the whole host-graph family starts from.

    Perf shape (measured): the naive ``groupby(["a","b"]).count()``
    sort-shuffled ~1M string-pair partial rows at sf0.1 (77 s) because
    the default ~1k batch size made the per-batch dedup useless. Fix:
    LARGE batches (per-batch dedup collapses 64k url rows to ≤ the
    distinct-pair count) + an int-hash coarse co-partition fold instead
    of a global string sort — same exact result, seconds not minutes,
    and the driver pull stays ≤ #hosts² rows."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = (df["src_url"].astype(str).str.extract(_HOST_RE)[0]
             .str.lower())
        b = (df["dst_url"].astype(str).str.extract(_HOST_RE)[0]
             .str.lower())
        out = pd.DataFrame({"a": a, "b": b}).dropna().drop_duplicates()
        out["part"] = (hash64_array(out["a"] + "\x00" + out["b"])
                       % _PAIR_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    return (links.select_columns(["src_url", "dst_url"])
            .map_batches(pairs, batch_format="pandas",
                         batch_size=_PAIR_BATCH)
            .groupby("part")
            .map_groups(fold, batch_format="pandas")
            .to_pandas())                            # ≤ #hosts² ≪ #urls


def host_edges(links: ray.data.Dataset) -> pd.DataFrame:
    """DIRECTED distinct host-pair edge list (a → b wherever any page of
    host a links any page of host b; self-loops dropped) — see
    ``_host_pairs_raw`` for the collapse's scale/perf shape."""
    e = _host_pairs_raw(links)
    return e[e["a"] != e["b"]].reset_index(drop=True)


# ---- scale paths for the all-pairs host analytics ----

#: Dense-matrix ceiling for the all-pairs host ops (closeness,
#: eccentricity, SCC, bow-tie): an n×n boolean closure is fine for a
#: bounded job parameter (n ≈ 10⁵ hosts → ~1.25 GB of bits) but a
#: 100 TB crawl has 10⁷–10⁸ hosts, where n² is impossible. Above this
#: bound the SAME results come from edge-list machinery: SCC/bow-tie
#: via exact Orzan-coloring label rounds + frontier BFS (the delta-BSP
#: shape — each round is one vectorized edge gather, mapping 1:1 onto
#: ``_cc_labels``-style co-partition exchanges when the edge list
#: outgrows one machine), closeness/eccentricity via the HyperANF
#: register machinery (``neighborhood_function`` run on the host
#: graph — per-host HLL registers, O(V·m) bytes per round).
#: ``test_scale_paths`` pins both alternates against the dense path.
#:
#: Driver ceilings of the alternates (documented, not hidden): the
#: ANF curves fold cluster-side (``_host_anf_fold`` — driver holds only
#: the n-row result), but ``_scc_labels_edge``/``_edge_reach`` still run
#: single-machine numpy over the full HOST edge list: ~16 bytes/edge →
#: ~16 GB at 10⁹ host edges, the practical driver bound. Past that the
#: Orzan coloring rounds map 1:1 onto the ``_cc_labels`` delta-BSP
#: co-partition exchanges (each inner step is one keyed edge gather);
#: that port is mechanical and deliberately deferred until a deployment
#: actually exceeds the edge-list bound.
HOST_DENSE_MAX = 65_536

#: HyperANF rounds for the approximate closeness/eccentricity path —
#: covers the effective diameter of web host graphs (≈16 hops, Broder
#: WWW 2000); hosts farther out contribute ≤ 1/24 per pair to harmonic
#: centrality, inside the HLL error band anyway.
HOST_ANF_ROUNDS = 24


def _edge_reach(seed: np.ndarray, ai: np.ndarray, bi: np.ndarray,
                n: int) -> np.ndarray:
    """Boolean reach-from-seed-set over the edge LIST (ai → bi), one
    vectorized frontier gather per BFS level — O(E) per round, never
    an n×n matrix."""
    reach = seed.copy()
    frontier = seed.copy()
    while frontier.any():
        nxt = np.zeros(n, dtype=bool)
        m = frontier[ai]
        nxt[bi[m]] = True
        frontier = nxt & ~reach
        reach |= frontier
    return reach


def _scc_labels_edge(ai: np.ndarray, bi: np.ndarray,
                     n: int) -> np.ndarray:
    """Exact SCC labels (label = min member index) over the edge list —
    Orzan's coloring algorithm (the standard Pregel/BSP SCC): forward
    min-label propagation to fixpoint, then backward reach within each
    color from its root extracts that root's SCC, peel, repeat. Every
    inner step is a vectorized edge gather; phase count is bounded by
    the graph's SCC-condensation depth (shallow for web host graphs).
    Label equivalence with the dense path: a root r has color[r]==r,
    so no smaller-index alive node reaches r; any SCC member both
    reaches and is reached by r, hence r is the component's min index."""
    comp = np.full(n, -1, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    ea, eb = ai, bi
    while alive.any():
        keep = alive[ea] & alive[eb]
        ea, eb = ea[keep], eb[keep]
        color = np.arange(n, dtype=np.int64)
        while True:
            prev = color.copy()
            np.minimum.at(color, eb, color[ea])
            if np.array_equal(prev, color):
                break
        in_scc = alive & (color == np.arange(n))
        same = color[ea] == color[eb]
        while True:
            add = same & in_scc[eb] & ~in_scc[ea]
            if not add.any():
                break
            in_scc[ea[add]] = True
        comp[in_scc] = color[in_scc]
        alive &= ~in_scc
    return comp


def _host_anf_fold(a: np.ndarray, b: np.ndarray, hosts: np.ndarray,
                   rounds: int, fold) -> pd.DataFrame:
    """Run the distributed HyperANF machinery on the UNDIRECTED host
    graph and fold each host's (rounds+1)-row register curve into its
    final readout CLUSTER-SIDE: the per-host × per-round table is
    hash-partitioned by host and every partition pivots + folds ITS
    hosts vectorized (B = linear-counting-corrected, monotone-clamped
    reach estimates; S = exact integer register indicators). The
    driver receives only the n-row result — never the n×(rounds+1)
    curve matrices (two of those in int64 at the 10⁷–10⁸-host design
    scale are tens of GB, the round-4 shape).

    ``fold(urls, B, S) -> DataFrame`` gets one partition's hosts."""
    links_h = ray.data.from_pandas(pd.DataFrame({
        "src_url": np.concatenate([a, b]).astype(str),
        "dst_url": np.concatenate([b, a]).astype(str)}))
    nodes_h = ray.data.from_pandas(
        pd.DataFrame({"url": hosts.astype(str)}))
    nf = neighborhood_function(links_h, nodes_h, rounds=rounds)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["url", "round", "sreg", "nzero"]].copy()
        df["part"] = (hash64_array(df["url"].astype(str))
                      % N_GRAPH_PARTS).astype(np.int32)
        return df

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        piv_s = g.pivot(index="url", columns="round", values="sreg") \
            .sort_index(axis=1)
        piv_z = g.pivot(index="url", columns="round", values="nzero") \
            .sort_index(axis=1)
        S = piv_s.to_numpy(dtype=np.int64)
        Z = piv_z.to_numpy(dtype=np.int64)
        raw = (ANF_ALPHA_M2 * float(1 << ANF_RHO_CAP)) / S.astype(np.float64)
        lc = ANF_M * np.log(ANF_M / np.maximum(Z, 1).astype(np.float64))
        B = np.where((raw <= 2.5 * ANF_M) & (Z > 0), lc, raw)
        B = np.maximum.accumulate(B, axis=1)
        return fold(piv_s.index.to_numpy(dtype=object), B, S)

    out = (nf.map_batches(tag, batch_format="pandas")
             .groupby("part").map_groups(fold_part, batch_format="pandas")
             .to_pandas())
    # same row order as the dense path (np.unique's sorted hosts)
    return out.sort_values("host", kind="stable").reset_index(drop=True)


def _host_closeness_anf(a: np.ndarray, b: np.ndarray,
                        hosts: np.ndarray) -> pd.DataFrame:
    """Approximate harmonic centrality from the HyperANF curves:
    frontier size at depth d ≈ B(d) − B(d−1); same integer HC_FP // d
    weights as the dense path (Boldi & Vigna 2014's own estimator).
    Folded cluster-side per host partition (``_host_anf_fold``)."""
    def fold(urls: np.ndarray, B: np.ndarray, S: np.ndarray) -> pd.DataFrame:
        delta = np.maximum(np.rint(np.diff(B, axis=1)), 0).astype(np.int64)
        w = np.array([np.int64(HC_FP) // np.int64(d)
                      for d in range(1, B.shape[1])], dtype=np.int64)
        return pd.DataFrame({
            "host": urls,
            "n_reachable": np.maximum(
                np.rint(B[:, -1]).astype(np.int64) - 1, 0),
            "harmonic_fp": (delta * w[None, :]).sum(axis=1)})

    return _host_anf_fold(a, b, hosts, HOST_ANF_ROUNDS, fold)


def _host_eccentricity_anf(a: np.ndarray, b: np.ndarray,
                           hosts: np.ndarray) -> pd.DataFrame:
    """Approximate eccentricity: the last depth whose register
    indicator sreg still changed (registers are a deterministic
    function of the reachable set, so a changed sreg proves new hosts
    entered; an unchanged one may rarely hide them → the estimate
    never exceeds the true eccentricity). Folded cluster-side per host
    partition (``_host_anf_fold``)."""
    def fold(urls: np.ndarray, B: np.ndarray, S: np.ndarray) -> pd.DataFrame:
        changed = S[:, 1:] != S[:, :-1]
        d = np.arange(1, S.shape[1], dtype=np.int64)
        return pd.DataFrame({
            "host": urls,
            "n_reachable": np.maximum(
                np.rint(B[:, -1]).astype(np.int64) - 1, 0),
            "eccentricity": np.where(changed, d[None, :], 0).max(axis=1)})

    return _host_anf_fold(a, b, hosts, HOST_ANF_ROUNDS, fold)


# ---- TrustRank: seed-biased PageRank over the host graph ----

TR_ITERS = 3
TR_FP = 10 ** 12


def host_trustrank(links: ray.data.Dataset, seed_hosts,
                   iters: int = TR_ITERS) -> pd.DataFrame:
    """(host, trust_fp, is_seed): TrustRank (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004) over the directed host graph — PageRank whose
    teleport vector is concentrated on a vetted seed set instead of
    uniform, so trust decays with link distance from the seeds and
    link-farm islands score ~0. The crawl analogue of the reference's
    operator-vetted seed list: `seed_hosts` defaults (at the query
    layer) to the hosts of the `priority='events'` seeds — the
    human-injected channel (`routes/webhook.js:14-60`).

    Integer fixed-point (1e-12 mass units), every step floor division,
    so the unrolled-CTE DuckDB mirror is bit-exact::

        t0[v]   = TR_FP // |seeds|  if v ∈ seeds else 0
        t_{i+1} = (85 · Σ_{(u,v)∈E} t_i[u] // outdeg[u]) // 100
                  + (15 · t0[v]) // 100

    Scale shape: ONE streaming host-pair collapse (``host_edges``);
    iterations are vectorized np.add.at over the #hosts-bounded edge
    list. Floor remainders + dangling mass leak (documented for
    ``pagerank`` too); mirrored exactly."""
    e = host_edges(links)
    hosts = np.array(sorted(set(e["a"]) | set(e["b"])), dtype=object)
    idx = {h: i for i, h in enumerate(hosts)}
    src = e["a"].map(idx).to_numpy(dtype=np.int64)
    dst = e["b"].map(idx).to_numpy(dtype=np.int64)
    outdeg = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(outdeg, src, 1)
    seeds = sorted(set(seed_hosts) & set(hosts.tolist()))
    if not seeds:
        raise ValueError("no seed host appears in the link graph")
    t0 = np.zeros(len(hosts), dtype=np.int64)
    t0[[idx[s] for s in seeds]] = np.int64(TR_FP) // np.int64(len(seeds))
    t = t0.copy()
    for _ in range(iters):
        contrib = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(contrib, dst, t[src] // outdeg[src])
        t = (85 * contrib) // 100 + (15 * t0) // 100
    return pd.DataFrame({"host": hosts, "trust_fp": t,
                         "is_seed": np.isin(hosts, np.array(seeds,
                                                            dtype=object))})


# ---- reciprocal-link profile (link-exchange / spam signal) ----

RECIP_FP = 10 ** 6


def host_reciprocity(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_out_hosts, n_recip, recip_fp): per host, how many
    distinct hosts it links out to and what fraction of those edges are
    reciprocated (b also links a) — the classic link-exchange / spam
    signal (high reciprocity + high clustering = link ring; organic
    hubs link far more than they are linked back by). recip_fp =
    RECIP_FP·n_recip // n_out_hosts, exact integer.

    Scale shape: one ``host_edges`` collapse; reciprocity is a
    vectorized merge of the bounded edge list against its own swap."""
    e = host_edges(links)
    swapped = e.rename(columns={"a": "b", "b": "a"})
    m = e.merge(swapped.assign(r=1), on=["a", "b"], how="left")
    m["r"] = m["r"].fillna(0).astype(np.int64)
    g = m.groupby("a", sort=True).agg(
        n_out_hosts=("b", "size"), n_recip=("r", "sum")).reset_index()
    return pd.DataFrame({
        "host": g["a"].astype(object),
        "n_out_hosts": g["n_out_hosts"].astype(np.int64),
        "n_recip": g["n_recip"].astype(np.int64),
        "recip_fp": (np.int64(RECIP_FP) * g["n_recip"].to_numpy(np.int64)
                     // g["n_out_hosts"].to_numpy(np.int64))})


# ---- strongly connected components over the directed host graph ----

def host_scc(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, component, scc_size): strongly connected components of
    the DIRECTED host graph — component label = lexicographically
    smallest member host. Separates true mutual-link communities from
    the weak components ``host_components`` reports (a one-way feeder
    host is weakly but not strongly connected to its target).

    Scale shape: one ``host_edges`` collapse, then boolean-matrix BFS
    closure over the n×n adjacency (directed ``host_closeness``
    machinery); u,v share an SCC iff reach(u,v) ∧ reach(v,u). n =
    #hosts is a bounded job parameter; past it the same closure runs as
    delta-BSP label rounds (``host_components``' shape) on fwd+rev
    graphs."""
    e = host_edges(links)
    hosts = np.array(sorted(set(e["a"]) | set(e["b"])), dtype=object)
    pos = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    ai = e["a"].map(pos).to_numpy(np.int64)
    bi = e["b"].map(pos).to_numpy(np.int64)
    if n > HOST_DENSE_MAX:
        comp = hosts[_scc_labels_edge(ai, bi, n)]
    else:
        adj = np.zeros((n, n), dtype=bool)
        adj[ai, bi] = True
        reach = np.eye(n, dtype=bool)
        frontier = reach.copy()
        while frontier.any():
            frontier = (frontier @ adj) & ~reach
            reach |= frontier
        same = reach & reach.T                # mutual reachability
        comp = np.array([hosts[np.flatnonzero(same[i])[0]]
                         for i in range(n)],
                        dtype=object)         # min index = min host
    sizes = pd.Series(comp).map(pd.Series(comp).value_counts())
    return pd.DataFrame({"host": hosts, "component": comp,
                         "scc_size": sizes.to_numpy(np.int64)})


# ---- in-link concentration (Gini) per host ----

GINI_FP = 10 ** 6
N_GINI_PARTS = 64


def host_indegree_gini(links: ray.data.Dataset,
                       pages: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_pages, total_inlinks, gini_fp): Gini coefficient of the
    in-link counts across each host's crawled pages — the
    popularity-skew readout (gini→0: links spread evenly over the
    site; gini→1: one landing page absorbs everything, the shape of
    both healthy hub sites and artificially-boosted doorway pages;
    read next to host_reciprocity/host_clustering for the spam
    triage). Pages never linked count as in-degree 0; link targets
    outside the crawled page set are ignored.

    Exact fixed-point: with a host's in-degrees x sorted ascending,
    gini_fp = GINI_FP · Σᵢ(2i−n−1)·xᵢ // (n·Σx) (1-based i; the
    coefficient sum is tie-order invariant), one integer division —
    bit-exact vs the window-function SQL mirror.

    Scale shape: per-batch combiner counts link targets; page rows ride
    as deg-0 markers; ONE url-hash co-partition folds counts and drops
    uncrawled targets; the (host, deg) survivors co-partition by host
    hash where the rank sum is vectorized across a partition's hosts —
    output is ≤ #hosts rows."""

    def link_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["dst_url"].astype(str).value_counts())
        u = c.index.to_numpy(dtype=object)
        out = pd.DataFrame({"url": u,
                            "deg": c.to_numpy(np.int64),
                            "side": np.ones(len(u), dtype=np.int8)})
        out["part"] = (hash64_array(out["url"]).view(np.int64)
                       % N_GINI_PARTS).astype(np.int32)
        return out

    def page_rows(df: pd.DataFrame) -> pd.DataFrame:
        u = df["url"].astype(str).to_numpy(dtype=object)
        out = pd.DataFrame({"url": u,
                            "deg": np.zeros(len(u), dtype=np.int64),
                            "side": np.zeros(len(u), dtype=np.int8)})
        out["part"] = (hash64_array(out["url"]).view(np.int64)
                       % N_GINI_PARTS).astype(np.int32)
        return out

    def fold_urls(g: pd.DataFrame) -> pd.DataFrame:
        crawled = g.loc[g["side"] == 0, "url"]
        s = g.groupby("url", sort=False)["deg"].sum()
        s = s[s.index.isin(set(crawled))]
        u = s.index.to_series().astype(str)
        host = u.str.extract(_HOST_RE)[0].str.lower()
        out = pd.DataFrame({"host": host.to_numpy(dtype=object),
                            "deg": s.to_numpy(np.int64)}).dropna()
        out["hpart"] = (hash64_array(out["host"]).view(np.int64)
                        % N_GINI_PARTS).astype(np.int32)
        return out

    def gini_of_hosts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "deg"], kind="stable")
        i = g.groupby("host", sort=False).cumcount().to_numpy(np.int64) + 1
        deg = g["deg"].to_numpy(np.int64)
        agg = pd.DataFrame({
            "host": g["host"].to_numpy(dtype=object),
            "num": (2 * i - 1) * deg, "deg": deg}).groupby(
                "host", sort=False).agg(
                    n_pages=("deg", "size"), total_inlinks=("deg", "sum"),
                    raw=("num", "sum")).reset_index()
        n = agg["n_pages"].to_numpy(np.int64)
        tot = agg["total_inlinks"].to_numpy(np.int64)
        # Σ(2i−n−1)x = Σ(2i−1)x − n·Σx
        num = agg["raw"].to_numpy(np.int64) - n * tot
        denom = n * tot
        agg["gini_fp"] = np.where(denom > 0,
                                  GINI_FP * num // np.maximum(denom, 1), 0)
        for c in ("n_pages", "total_inlinks", "gini_fp"):
            agg[c] = agg[c].astype(np.int64)
        return agg[["host", "n_pages", "total_inlinks", "gini_fp"]]

    tagged = (links.select_columns(["dst_url"])
              .map_batches(link_partial, batch_format="pandas")
              .union(pages.select_columns(["url"])
                     .map_batches(page_rows, batch_format="pandas")))
    return (tagged.groupby("part")
            .map_groups(fold_urls, batch_format="pandas")
            .groupby("hpart")
            .map_groups(gini_of_hosts, batch_format="pandas")
            .to_pandas()
            .sort_values("host", kind="stable").reset_index(drop=True))


# ---- degree assortativity over the host graph ----

def host_assortativity(links: ray.data.Dataset) -> pd.DataFrame:
    """One-row (n_hosts, n_edges, r): Pearson degree-degree correlation
    across the undirected host graph's edges (Newman 2002) — r>0: big
    sites link big sites (core/periphery web), r<0: hubs link leaves
    (star-shaped link farms / directory sites). Endpoint degrees are
    undirected-distinct; each edge contributes both orientations so the
    moments are symmetric.

    Exactness: all five moments (Σx, Σxy, Σx², n and the y-mirrors they
    equal) are exact int64 sums over the bounded edge list; r is ONE
    fixed IEEE-double expression evaluated identically in the SQL
    mirror (the zscore_anomalies convention) — bit-exact, unrounded."""
    e = host_edges(links)
    und = pd.concat([e, e.rename(columns={"a": "b", "b": "a"})],
                    ignore_index=True).drop_duplicates()
    deg = und.groupby("a", sort=False).size()
    x = und["a"].map(deg).to_numpy(np.int64)
    y = und["b"].map(deg).to_numpy(np.int64)
    n = np.int64(len(und))                  # 2 × undirected edge count
    sx, sxy, sxx = map(np.int64, (x.sum(), (x * y).sum(), (x * x).sum()))
    num = float(n * sxy - sx * sx)
    den = float(n * sxx - sx * sx)
    r = num / den if den > 0 else 0.0
    return pd.DataFrame({"n_hosts": [np.int64(len(deg))],
                         "n_edges": [n // 2], "r": [r]})


# ---- eccentricity / diameter over the host graph ----

def host_eccentricity(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_reachable, eccentricity): per-host eccentricity (max
    shortest-path distance to any reachable host) over the undirected
    host graph — max(eccentricity) = the crawl web's DIAMETER,
    min = its RADIUS (center hosts): how many link hops a BFS crawl
    needs from each start to exhaust its component. Unreachable pairs
    are simply not counted (same convention as ``host_closeness``).

    Scale shape: the shared bounded host-pair collapse, then the same
    all-sources boolean-frontier BFS as ``host_closeness`` — one more
    integer readout from the machinery already priced in."""
    e = host_edges(links)
    hosts = np.unique(np.concatenate([e["a"].to_numpy(dtype=object),
                                      e["b"].to_numpy(dtype=object)]))
    pos = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    if n > HOST_DENSE_MAX:
        return _host_eccentricity_anf(e["a"].to_numpy(dtype=object),
                                      e["b"].to_numpy(dtype=object),
                                      hosts)
    adj = np.zeros((n, n), dtype=bool)
    ai = e["a"].map(pos).to_numpy(np.int64)
    bi = e["b"].map(pos).to_numpy(np.int64)
    adj[ai, bi] = True
    adj[bi, ai] = True
    reached = np.eye(n, dtype=bool)
    frontier = reached.copy()
    ecc = np.zeros(n, dtype=np.int64)
    d = 0
    while frontier.any() and d < n:
        d += 1
        frontier = (frontier @ adj) & ~reached
        ecc = np.where(frontier.any(axis=1), d, ecc)
        reached |= frontier
    return pd.DataFrame({
        "host": hosts.astype(object),
        "n_reachable": reached.sum(axis=1, dtype=np.int64) - 1,
        "eccentricity": ecc})


# ---- k-core decomposition (page-level link graph) ----

KCORE_K = 5                 # minimum within-core undirected degree
KCORE_MAX_ROUNDS = 12       # fixed peel budget (spec'd, mirrored)


@ray.remote(num_cpus=0)
class _KCoreShard:
    """One k-core partition: the undirected edge rows whose a-endpoint
    hashes here (both orientations of every edge exist somewhere, so a
    node's full degree is computable locally), plus the (nid → url)
    map for the nodes it owns. num_cpus=0 like the other graph shards."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts
        self._ab: list[tuple[np.ndarray, np.ndarray]] = []
        self._nu: list[tuple[np.ndarray, np.ndarray]] = []

    def add_edges(self, a: np.ndarray, b: np.ndarray) -> int:
        self._ab.append((np.asarray(a, np.int64), np.asarray(b, np.int64)))
        return len(a)

    def add_nodes(self, nid: np.ndarray, url: np.ndarray) -> int:
        self._nu.append((np.asarray(nid, np.int64),
                         np.asarray(url, dtype=object)))
        return len(nid)

    def seal(self) -> int:
        a = (np.concatenate([c[0] for c in self._ab])
             if self._ab else np.empty(0, np.int64))
        b = (np.concatenate([c[1] for c in self._ab])
             if self._ab else np.empty(0, np.int64))
        self._ab = []
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            keep = np.empty(len(a), dtype=bool)
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        self.a, self.b = a, b
        nid = (np.concatenate([c[0] for c in self._nu])
               if self._nu else np.empty(0, np.int64))
        url = (np.concatenate([c[1] for c in self._nu])
               if self._nu else np.empty(0, object))
        self._nu = []
        self.nids, first = np.unique(nid, return_index=True)
        self.urls = url[first]
        self.alive = np.ones(len(self.nids), dtype=bool)
        self.round_removed = np.full(len(self.nids), -1, dtype=np.int64)
        self.deg0 = np.searchsorted(self.a, self.nids, side="right") \
            - np.searchsorted(self.a, self.nids, side="left")
        return len(self.nids)

    def peel(self, k: int, rnd: int) -> np.ndarray:
        """Mark + return this shard's nodes whose CURRENT degree < k."""
        deg = np.searchsorted(self.a, self.nids, side="right") \
            - np.searchsorted(self.a, self.nids, side="left")
        rm = self.alive & (deg < k)
        self.alive[rm] = False
        self.round_removed[rm] = rnd
        return self.nids[rm]

    def drop(self, removed_sorted: np.ndarray) -> int:
        """Drop all edge rows touching any globally removed node."""
        if len(removed_sorted) == 0 or len(self.a) == 0:
            return len(self.a)
        def member(x: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(removed_sorted, x)
            np.minimum(pos, len(removed_sorted) - 1, out=pos)
            return removed_sorted[pos] == x
        keep = ~(member(self.a) | member(self.b))
        self.a, self.b = self.a[keep], self.b[keep]
        return len(self.a)

    def result_arrow(self) -> pa.Table:
        return pa.table({
            "url": pa.array(self.urls, type=pa.string()),
            "degree": pa.array(self.deg0, type=pa.int64()),
            "peel_round": pa.array(self.round_removed, type=pa.int64()),
            "in_kcore": pa.array(self.alive, type=pa.bool_())})


def kcore(links: ray.data.Dataset, k: int = KCORE_K,
          max_rounds: int = KCORE_MAX_ROUNDS) -> ray.data.Dataset:
    """(url, degree, peel_round, in_kcore): ``max_rounds``-round k-core
    peel of the UNDIRECTED page link graph (distinct edges, self-loops
    dropped; nodes = every url appearing as an endpoint). Round r
    removes every node whose surviving degree < k; peel_round = the
    1-based round a node fell (−1 = survived all rounds = the k-core
    whenever the true peel depth ≤ max_rounds, which pytest pins on the
    test corpus). The dense core is the spam-farm / template-cluster
    signal; shallow peel_round marks frontier-fringe pages.

    Scale shape: edges scatter ONCE by hash(a) % P (both orientations,
    so each node's degree is shard-local); each round is a vectorized
    shard-local degree scan, and only the REMOVED-node id array (the
    frontier analogue — output-sized, shrinking) moves: gathered,
    merged, broadcast back for the b-side edge drop. No per-round
    all-to-all; P scales with edge count like ``pagerank``."""
    n_edges = links.count()
    P = max(4, min(N_GRAPH_PARTS, n_edges // 100_000 + 1))
    shards = [_KCoreShard.remote(p, P) for p in range(P)]

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["src_url", "dst_url"]].drop_duplicates()
        e = e[e["src_url"] != e["dst_url"]]
        s = hash64_array(e["src_url"].astype(str))
        d = hash64_array(e["dst_url"].astype(str))
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        refs = [shards[p].add_edges.remote(aa, bb) for p, aa, bb in
                _slice_by_part((a % P).astype(np.int64), P, a, b)]
        urls = pd.concat([e["src_url"], e["dst_url"]]) \
            .drop_duplicates().astype(str).to_numpy(dtype=object)
        ids = hash64_array(pd.Series(urls))
        refs += [shards[p].add_nodes.remote(i, u) for p, i, u in
                 _slice_by_part((ids % P).astype(np.int64), P, ids, urls)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(e)]})

    links.map_batches(scatter, batch_format="pandas").materialize()
    ray.get([s.seal.remote() for s in shards])

    for rnd in range(1, max_rounds + 1):
        removed = np.concatenate(
            ray.get([s.peel.remote(k, rnd) for s in shards]))
        if len(removed) == 0:
            break
        rm_ref = ray.put(np.sort(removed))
        ray.get([s.drop.remote(rm_ref) for s in shards])

    out = ray.data.from_arrow_refs(
        [s.result_arrow.remote() for s in shards]).materialize()
    for s in shards:
        ray.kill(s)
    return out


# ---- bow-tie decomposition of the host graph (Broder et al. 2000) ----

def host_bowtie(links: ray.data.Dataset) -> pd.DataFrame:
    """(host, region, region_size): the classic web bow-tie map —
    CORE = the largest SCC (ties → lexicographically smallest
    component label), IN = hosts that reach the core but aren't in it,
    OUT = hosts the core reaches, TENDRIL = weakly connected to the
    core component but neither IN nor OUT, DISCONNECTED = everything
    else (Broder et al., "Graph structure in the Web", WWW 2000). The
    strategic crawl readout: IN hosts are seed candidates (they feed
    the core), OUT-heavy graphs mean the frontier drains into sinks.

    Scale shape: one streaming ``host_edges`` collapse; the
    decomposition itself is boolean-matrix closure over the
    #hosts-bounded adjacency (``host_scc`` machinery — same delta-BSP
    escape hatch past the bounded-host regime). IN ∩ OUT = ∅ by
    construction (mutual reach with the core ⇒ membership)."""
    e = host_edges(links)
    hosts = np.array(sorted(set(e["a"]) | set(e["b"])), dtype=object)
    pos = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    ai = e["a"].map(pos).to_numpy(np.int64)
    bi = e["b"].map(pos).to_numpy(np.int64)
    if n > HOST_DENSE_MAX:
        # edge-list decomposition: exact SCC labels from the coloring
        # rounds, then three frontier BFS sweeps (fwd / bwd / weak)
        # from the core set — O(E) per level, no n×n closure
        comp = _scc_labels_edge(ai, bi, n)
        sizes = np.bincount(comp, minlength=n)
        core_lbl = int(np.flatnonzero(sizes == sizes.max())[0])
        core = comp == core_lbl
        in_set = ~core & _edge_reach(core, bi, ai, n)
        out_set = ~core & _edge_reach(core, ai, bi, n)
        weak_core = _edge_reach(core, np.concatenate([ai, bi]),
                                np.concatenate([bi, ai]), n)
    else:
        adj = np.zeros((n, n), dtype=bool)
        adj[ai, bi] = True
        reach = np.eye(n, dtype=bool)
        frontier = reach.copy()
        while frontier.any():
            frontier = (frontier @ adj) & ~reach
            reach |= frontier
        same = reach & reach.T
        comp = np.array([np.flatnonzero(same[i])[0] for i in range(n)],
                        dtype=np.int64)      # min-index SCC label
        sizes = np.bincount(comp, minlength=n)
        core_lbl = int(np.flatnonzero(sizes == sizes.max())[0])
        core = comp == core_lbl
        in_set = ~core & reach[:, core].any(axis=1)
        out_set = ~core & reach[core, :].any(axis=0)
        uadj = adj | adj.T
        wreach = np.eye(n, dtype=bool)
        frontier = wreach.copy()
        while frontier.any():
            frontier = (frontier @ uadj) & ~wreach
            wreach |= frontier
        weak_core = wreach[:, core].any(axis=1)
    region = np.where(core, "core",
                      np.where(in_set, "in",
                               np.where(out_set, "out",
                                        np.where(weak_core, "tendril",
                                                 "disconnected"))))
    region = region.astype(object)
    cnt = pd.Series(region).value_counts()
    return pd.DataFrame({
        "host": hosts, "region": region,
        "region_size": pd.Series(region).map(cnt).to_numpy(np.int64)})


# ---- page-level HITS (hubs & authorities, Kleinberg 1999) ----

PHITS_ITERS = 4
PHITS_SCALE = 10 ** 9         # post-iteration rescale ceiling


@ray.remote(num_cpus=0)
class _HitsShard:
    """One HITS partition: FORWARD edges whose src hashes here (grouped
    by dst-part for the authority scatter), REVERSE edges whose dst
    hashes here (grouped by src-part for the hub scatter), and the hub/
    authority integer scores of the nodes this shard owns. Both
    orientations are stored so each half-iteration is a local gather +
    O(V)-sized partial scatter — no per-iteration edge re-shuffle and
    no whole-score broadcast (the kcore/pagerank shard discipline)."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []
        self._fwd_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._node_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.nids = np.empty(0, dtype=np.int64)

    def add_pending(self, src: np.ndarray, dst: np.ndarray) -> int:
        """Raw edges routed by hash(dst)%P — membership filter runs
        here, where this shard's node set lives."""
        self._pending.append((np.asarray(src, np.int64),
                              np.asarray(dst, np.int64)))
        return len(src)

    def add_nodes(self, nids: np.ndarray, urls: np.ndarray) -> int:
        self._node_chunks.append((np.asarray(nids, np.int64),
                                  np.asarray(urls, dtype=object)))
        return len(nids)

    def seal_nodes(self) -> None:
        if self._node_chunks:
            nid = np.concatenate([c[0] for c in self._node_chunks])
            url = np.concatenate([c[1] for c in self._node_chunks])
            order = np.argsort(nid, kind="stable")
            keep = np.r_[True, nid[order][1:] != nid[order][:-1]]
            self.nids = nid[order][keep]
            self.urls = url[order][keep]
        else:
            self.urls = np.empty(0, dtype=object)
        self._node_chunks = []

    def filter_keep_rev(self) -> dict:
        """Drop pending edges whose dst was never fetched, KEEP the
        survivors as this shard's reverse store (dst-local), and
        re-scatter them to their hash(src)%P shard for the forward
        store: {src_part: ObjectRef of (src, dst) slices}."""
        if self._pending:
            src = np.concatenate([c[0] for c in self._pending])
            dst = np.concatenate([c[1] for c in self._pending])
        else:
            src = dst = np.empty(0, dtype=np.int64)
        self._pending = []
        if len(self.nids) and len(dst):
            pos = np.searchsorted(self.nids, dst)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == dst
            src, dst = src[ok], dst[ok]
        else:
            src = dst = np.empty(0, dtype=np.int64)
        spart = (src % self.n_parts).astype(np.int64)
        order = np.argsort(spart, kind="stable")
        self.rsrc, self.rdst = src[order], dst[order]
        self._rbounds = np.searchsorted(spart[order],
                                        np.arange(self.n_parts + 1))
        return {p: ray.put((s, d)) for p, s, d in
                _slice_by_part(spart, self.n_parts, src, dst)}

    def recv_fwd(self, refs: list) -> None:
        for s, d in ray.get(list(refs)):
            self._fwd_chunks.append((s, d))

    def seal(self) -> None:
        if self._fwd_chunks:
            src = np.concatenate([c[0] for c in self._fwd_chunks])
            dst = np.concatenate([c[1] for c in self._fwd_chunks])
        else:
            src = np.empty(0, dtype=np.int64)
            dst = np.empty(0, dtype=np.int64)
        self._fwd_chunks = []
        # ownership mask: auth_refs indexes h by searchsorted(nids, fsrc)
        # unmasked, so unowned srcs must never survive past seal (same
        # invariant apply_hub enforces on its fold keys)
        if len(self.nids) and len(src):
            pos = np.searchsorted(self.nids, src)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == src
            src, dst = src[ok], dst[ok]
        dpart = (dst % self.n_parts).astype(np.int64)
        order = np.argsort(dpart, kind="stable")
        self.fsrc, self.fdst = src[order], dst[order]
        self._fbounds = np.searchsorted(dpart[order],
                                        np.arange(self.n_parts + 1))
        self.h = np.ones(len(self.nids), dtype=np.int64)
        self.a = np.zeros(len(self.nids), dtype=np.int64)

    def auth_refs(self) -> dict:
        """Authority half-scatter: per-dst sums of h(src) over the
        forward edges, sliced per destination shard."""
        hv = self.h[np.searchsorted(self.nids, self.fsrc)]
        out = {}
        for p in range(self.n_parts):
            lo, hi = self._fbounds[p], self._fbounds[p + 1]
            if lo != hi:
                k, v = _sum_by_key(self.fdst[lo:hi], hv[lo:hi])
                out[p] = ray.put((k, v))
        return out

    def apply_auth(self, refs: list) -> int:
        """Fold inbound authority partials; return the shard max (the
        driver folds the global max for the deterministic rescale)."""
        self.a = np.zeros(len(self.nids), dtype=np.int64)
        if refs:
            parts = ray.get(list(refs))
            k = np.concatenate([p[0] for p in parts])
            v = np.concatenate([p[1] for p in parts])
            uk, sv = _sum_by_key(k, v)
            self.a[np.searchsorted(self.nids, uk)] = sv
        return int(self.a.max()) if len(self.a) else 0

    def rescale_auth(self, gmax: int) -> None:
        self.a //= (gmax // PHITS_SCALE + 1)

    def hub_refs(self) -> dict:
        """Hub half-scatter: per-src sums of a(dst) over the REVERSE
        edges (a(dst) is local here), sliced per source shard."""
        av = self.a[np.searchsorted(self.nids, self.rdst)]
        out = {}
        for p in range(self.n_parts):
            lo, hi = self._rbounds[p], self._rbounds[p + 1]
            if lo != hi:
                k, v = _sum_by_key(self.rsrc[lo:hi], av[lo:hi])
                out[p] = ray.put((k, v))
        return out

    def apply_hub(self, refs: list) -> int:
        self.h = np.zeros(len(self.nids), dtype=np.int64)
        if refs and len(self.nids):
            parts = ray.get(list(refs))
            k = np.concatenate([p[0] for p in parts])
            v = np.concatenate([p[1] for p in parts])
            uk, sv = _sum_by_key(k, v)
            # sums keyed by src: only srcs that are owned nodes score
            pos = np.searchsorted(self.nids, uk)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == uk
            self.h[pos[ok]] = sv[ok]
        return int(self.h.max()) if len(self.h) else 0

    def rescale_hub(self, gmax: int) -> None:
        self.h //= (gmax // PHITS_SCALE + 1)

    def result_arrow(self) -> pa.Table:
        return pa.table({
            "url": pa.array(self.urls, type=pa.string()),
            "hub_fp": pa.array(self.h, type=pa.int64()),
            "auth_fp": pa.array(self.a, type=pa.int64())})


def page_hits(links: ray.data.Dataset, nodes: ray.data.Dataset,
              iters: int = PHITS_ITERS) -> ray.data.Dataset:
    """(url, hub_fp, auth_fp): ``iters`` rounds of Kleinberg's HITS on
    the directed page link graph — nodes = fetched pages, edges whose
    dst was never fetched are dropped (same closure as ``pagerank``).
    Each round: authority = Σ hub over in-edges, then hub = Σ authority
    over out-edges, each followed by the deterministic integer rescale
    ``x //= (max(x) // PHITS_SCALE + 1)`` (all-int64, so the scores are
    bit-identical to the unrolled SQL mirror — no float normalization).

    Scale shape: edges are stored in BOTH orientations, each keyed by
    the endpoint whose score that half-iteration reads (forward at
    hash(src)%P for the authority scatter, reverse at hash(dst)%P for
    the hub scatter), so each half-round exchanges only O(V) id-keyed
    integer partials plus P shard maxima — the edge arrays never move
    after setup. Citations: reference has host-level analytics only
    (SURVEY.md §2.5); this is the page-level companion of
    ``host_hits``."""
    n = nodes.count()
    if n == 0:
        return _empty_graph_table(url=pa.string(), hub_fp=pa.int64(),
                                  auth_fp=pa.int64())
    P = max(4, min(N_GRAPH_PARTS, n // 25_000 + 1))
    shards = [_HitsShard.remote(p, P) for p in range(P)]

    def scatter_edges(df: pd.DataFrame) -> pd.DataFrame:
        sid = hash64_array(df["src_url"].astype(str))
        did = hash64_array(df["dst_url"].astype(str))
        refs = [shards[p].add_pending.remote(s, d) for p, s, d in
                _slice_by_part((did % P).astype(np.int64), P, sid, did)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    def scatter_nodes(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].astype(str).to_numpy(dtype=object)
        nid = hash64_array(df["url"])
        refs = [shards[p].add_nodes.remote(i, u) for p, i, u in
                _slice_by_part((nid % P).astype(np.int64), P, nid, urls)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    links.map_batches(scatter_edges, batch_format="pandas").materialize()
    nodes.map_batches(scatter_nodes, batch_format="pandas").materialize()

    ray.get([s.seal_nodes.remote() for s in shards])
    outs = ray.get([s.filter_keep_rev.remote() for s in shards])
    ray.get([shards[q].recv_fwd.remote(
        [outs[p][q] for p in range(P) if q in outs[p]])
        for q in range(P)])
    ray.get([s.seal.remote() for s in shards])

    for _ in range(iters):
        outs = ray.get([s.auth_refs.remote() for s in shards])
        maxes = ray.get([shards[q].apply_auth.remote(
            [outs[p][q] for p in range(P) if q in outs[p]])
            for q in range(P)])
        ray.get([s.rescale_auth.remote(max(maxes)) for s in shards])
        outs = ray.get([s.hub_refs.remote() for s in shards])
        maxes = ray.get([shards[q].apply_hub.remote(
            [outs[p][q] for p in range(P) if q in outs[p]])
            for q in range(P)])
        ray.get([s.rescale_hub.remote(max(maxes)) for s in shards])

    out = ray.data.from_arrow_refs(
        [s.result_arrow.remote() for s in shards]).materialize()
    for s in shards:
        ray.kill(s)
    return out


# ---- page-level connected components (bounded-round min-label) ----

CC_ROUNDS = 8


def _min_by_key(keys: np.ndarray, vals: np.ndarray):
    """Vectorized groupby-min over int64 keys: sort + minimum.reduceat."""
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = vals[order]
    if len(k) == 0:
        return k, v
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    return k[starts], np.minimum.reduceat(v, starts)


@ray.remote(num_cpus=0)
class _CCShard:
    """One components partition: undirected edge rows whose a-endpoint
    hashes here (both orientations exist somewhere, so every neighbor
    push is computable locally), the (nid → url, label) state for owned
    nodes. Labels are md5-u64 url hashes — the one string-hash primitive
    the SQL mirror reproduces exactly."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts
        self._ab: list[tuple[np.ndarray, np.ndarray]] = []
        self._nu: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def add_edges(self, a: np.ndarray, b: np.ndarray) -> int:
        self._ab.append((np.asarray(a, np.int64), np.asarray(b, np.int64)))
        return len(a)

    def add_nodes(self, nid: np.ndarray, url: np.ndarray,
                  hu: np.ndarray) -> int:
        self._nu.append((np.asarray(nid, np.int64),
                         np.asarray(url, dtype=object),
                         np.asarray(hu, np.uint64)))
        return len(nid)

    def seal(self) -> None:
        a = (np.concatenate([c[0] for c in self._ab])
             if self._ab else np.empty(0, np.int64))
        b = (np.concatenate([c[1] for c in self._ab])
             if self._ab else np.empty(0, np.int64))
        self._ab = []
        nid = (np.concatenate([c[0] for c in self._nu])
               if self._nu else np.empty(0, np.int64))
        url = (np.concatenate([c[1] for c in self._nu])
               if self._nu else np.empty(0, object))
        hu = (np.concatenate([c[2] for c in self._nu])
              if self._nu else np.empty(0, np.uint64))
        self._nu = []
        order = np.argsort(nid, kind="stable")
        keep = (np.r_[True, nid[order][1:] != nid[order][:-1]]
                if len(nid) else np.empty(0, dtype=bool))
        self.nids = nid[order][keep]
        self.urls = url[order][keep]
        self.lab = hu[order][keep].copy()
        # restrict to fetched nodes: the a-endpoint is checkable here
        # (its owner shard is this one); an unfetched b is masked at
        # the receiving shard's apply_min
        if len(a) and len(self.nids):
            pos = np.searchsorted(self.nids, a)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == a
            a, b = a[ok], b[ok]
        else:
            a = b = np.empty(0, np.int64)
        bpart = (b % self.n_parts).astype(np.int64)
        order = np.argsort(bpart, kind="stable")
        self.a, self.b = a[order], b[order]
        self._bounds = np.searchsorted(bpart[order],
                                       np.arange(self.n_parts + 1))

    def push_refs(self) -> dict:
        """One round's neighbor push: per-b mins of label(a) (a local),
        sliced per destination shard — O(V)-sized uint64 partials."""
        la = self.lab[np.searchsorted(self.nids, self.a)]
        out = {}
        for p in range(self.n_parts):
            lo, hi = self._bounds[p], self._bounds[p + 1]
            if lo != hi:
                k, v = _min_by_key(self.b[lo:hi], la[lo:hi])
                out[p] = ray.put((k, v))
        return out

    def apply_min(self, refs: list) -> int:
        """Fold inbound label mins; returns #changed for early exit."""
        if not refs or not len(self.nids):
            return 0
        parts = ray.get(list(refs))
        k = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        uk, mv = _min_by_key(k, v)
        idx = np.searchsorted(self.nids, uk)
        np.minimum(idx, len(self.nids) - 1, out=idx)
        owned = self.nids[idx] == uk           # mask unfetched targets
        idx, mv = idx[owned], mv[owned]
        old = self.lab[idx]
        new = np.minimum(old, mv)
        changed = int((new < old).sum())
        self.lab[idx] = new
        return changed

    def result_arrow(self) -> pa.Table:
        return pa.table({
            "url": pa.array(self.urls, type=pa.string()),
            "comp_fp": pa.array(self.lab.view(np.int64), type=pa.int64())})


def page_components(links: ray.data.Dataset, nodes: ray.data.Dataset,
                    rounds: int = CC_ROUNDS) -> ray.data.Dataset:
    """(url, comp_fp): weakly-connected components of the page link
    graph by ``rounds`` of undirected min-label propagation — comp_fp =
    the int64 view of the minimum md5-u64 url hash reachable within
    ``rounds`` hops (= the true component label whenever the component
    diameter ≤ rounds; converged shards stop exchanging early, which
    cannot change the fixed-round result). Page-level companion of
    ``host_components``: the island/continent map of the fetched web —
    orphaned islands signal seed-list or scope-filter gaps.

    Scale shape: edges scatter ONCE by hash(a)%P in both orientations
    (a node's full neighbor push is shard-local); each round exchanges
    only per-node uint64 label-min partials (output-sized, shrinking to
    zero at convergence); edges never re-shuffle. Labels are the
    md5-prefix primitive (`ops/dedup._hash64_str`) so the unrolled SQL
    mirror reproduces the values bit-for-bit."""
    from .dedup import _hash64_str
    n = nodes.count()
    if n == 0:
        return _empty_graph_table(url=pa.string(), comp_fp=pa.int64())
    P = max(4, min(N_GRAPH_PARTS, n // 25_000 + 1))
    shards = [_CCShard.remote(p, P) for p in range(P)]

    def scatter_edges(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["src_url", "dst_url"]].drop_duplicates()
        e = e[e["src_url"] != e["dst_url"]]
        s = hash64_array(e["src_url"].astype(str))
        d = hash64_array(e["dst_url"].astype(str))
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        refs = [shards[p].add_edges.remote(aa, bb) for p, aa, bb in
                _slice_by_part((a % P).astype(np.int64), P, a, b)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(e)]})

    def scatter_nodes(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].astype(str).to_numpy(dtype=object)
        nid = hash64_array(df["url"])
        hu = _hash64_str(list(urls))
        refs = [shards[p].add_nodes.remote(i, u, h) for p, i, u, h in
                _slice_by_part((nid % P).astype(np.int64), P,
                               nid, urls, hu)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    links.map_batches(scatter_edges, batch_format="pandas").materialize()
    nodes.map_batches(scatter_nodes, batch_format="pandas").materialize()
    ray.get([s.seal.remote() for s in shards])

    for _ in range(rounds):
        outs = ray.get([s.push_refs.remote() for s in shards])
        changed = ray.get([shards[q].apply_min.remote(
            [outs[p][q] for p in range(P) if q in outs[p]])
            for q in range(P)])
        if sum(changed) == 0:
            break

    out = ray.data.from_arrow_refs(
        [s.result_arrow.remote() for s in shards]).materialize()
    for s in shards:
        ray.kill(s)
    return out


# ---- deterministic random-walk corpus (DeepWalk-style, Perozzi 2014) ----

WALKS_PER_NODE = 2
WALK_LEN = 6                 # hops per walk (emits steps 0..WALK_LEN)


@ray.remote(num_cpus=0)
class _WalkShard:
    """One walk partition: out-edges of the srcs that hash here, each
    src's neighbors sorted by md5-u64(dst url) (the SQL-reproducible
    order), plus (nid → url) for owned nodes. Walk states visit the
    shard owning their current node; each round the shard emits the
    corpus rows for resident walks and scatters the advanced states."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts
        self._pending: list[tuple[np.ndarray, np.ndarray,
                                   np.ndarray]] = []
        self._ed: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._nu: list[tuple[np.ndarray, np.ndarray]] = []
        self._rows: list[pd.DataFrame] = []
        self._states: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def add_pending(self, src: np.ndarray, dst: np.ndarray,
                    hdst: np.ndarray) -> int:
        """Raw edges routed by hash(dst)%P — dst-membership filter runs
        here before the re-scatter to the src-owner shard."""
        self._pending.append((np.asarray(src, np.int64),
                              np.asarray(dst, np.int64),
                              np.asarray(hdst, np.uint64)))
        return len(src)

    def add_edges(self, src: np.ndarray, dst: np.ndarray,
                  hdst: np.ndarray) -> int:
        self._ed.append((np.asarray(src, np.int64),
                         np.asarray(dst, np.int64),
                         np.asarray(hdst, np.uint64)))
        return len(src)

    def add_nodes(self, nid: np.ndarray, url: np.ndarray) -> int:
        self._nu.append((np.asarray(nid, np.int64),
                         np.asarray(url, dtype=object)))
        return len(nid)

    def seal_nodes(self) -> None:
        nid = (np.concatenate([c[0] for c in self._nu])
               if self._nu else np.empty(0, np.int64))
        url = (np.concatenate([c[1] for c in self._nu])
               if self._nu else np.empty(0, object))
        self._nu = []
        order = np.argsort(nid, kind="stable")
        keep = (np.r_[True, nid[order][1:] != nid[order][:-1]]
                if len(nid) else np.empty(0, dtype=bool))
        self.nids = nid[order][keep]
        self.urls = url[order][keep]

    def filter_scatter(self) -> dict:
        """Drop pending edges whose dst was never fetched; re-scatter
        survivors to their hash(src)%P shard."""
        if self._pending:
            src = np.concatenate([c[0] for c in self._pending])
            dst = np.concatenate([c[1] for c in self._pending])
            hd = np.concatenate([c[2] for c in self._pending])
        else:
            src = dst = np.empty(0, np.int64)
            hd = np.empty(0, np.uint64)
        self._pending = []
        if len(self.nids) and len(dst):
            pos = np.searchsorted(self.nids, dst)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == dst
            src, dst, hd = src[ok], dst[ok], hd[ok]
        else:
            src = dst = np.empty(0, np.int64)
            hd = np.empty(0, np.uint64)
        return {p: ray.put((s, d, h)) for p, s, d, h in
                _slice_by_part((src % self.n_parts).astype(np.int64),
                               self.n_parts, src, dst, hd)}

    def recv_edges(self, refs: list) -> None:
        for s, d, h in ray.get(list(refs)):
            self._ed.append((s, d, h))

    def seal(self) -> None:
        src = (np.concatenate([c[0] for c in self._ed])
               if self._ed else np.empty(0, np.int64))
        dst = (np.concatenate([c[1] for c in self._ed])
               if self._ed else np.empty(0, np.int64))
        hd = (np.concatenate([c[2] for c in self._ed])
              if self._ed else np.empty(0, np.uint64))
        self._ed = []
        # distinct (src, dst), sorted by (src, hu(dst)) — the pick order
        order = np.lexsort((hd, src))
        src, dst, hd = src[order], dst[order], hd[order]
        if len(src):
            keep = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            src, dst, hd = src[keep], dst[keep], hd[keep]
        self.esrc, self.edst = src, dst
        self._lo = np.searchsorted(self.esrc, self.nids, side="left")
        self._hi = np.searchsorted(self.esrc, self.nids, side="right")

    def start_walks(self, walks_per_node: int) -> None:
        """Seed walks for owned nodes: state = (start_url, walk, cur)."""
        n = len(self.nids)
        if n:
            su = np.repeat(self.urls, walks_per_node)
            wk = np.tile(np.arange(walks_per_node, dtype=np.int64), n)
            cur = np.repeat(self.nids, walks_per_node)
            self._states.append((su, wk, cur))

    def step(self, rnd: int) -> dict:
        """Emit corpus rows for resident walks (step = rnd), advance
        each along its md5-picked out-edge, scatter the survivors:
        {next_part: ObjectRef of (start_url, walk, next_nid) slices}."""
        from .dedup import _hash64_str
        if self._states:
            su = np.concatenate([s[0] for s in self._states])
            wk = np.concatenate([s[1] for s in self._states])
            cur = np.concatenate([s[2] for s in self._states])
        else:
            su = np.empty(0, object)
            wk = cur = np.empty(0, np.int64)
        self._states = []
        pos = np.searchsorted(self.nids, cur)
        if len(self.nids):
            # same clamp+ownership mask as the HITS shards: a scattered
            # walk whose node isn't resident (edge to an unfetched dst)
            # must not read another node's slot
            np.minimum(pos, len(self.nids) - 1, out=pos)
            own = self.nids[pos] == cur
            su, wk, cur, pos = su[own], wk[own], cur[own], pos[own]
        curl = self.urls[pos] if len(self.nids) else \
            np.empty(0, object)
        self._rows.append(pd.DataFrame({
            "start_url": su, "walk": wk,
            "step": np.full(len(su), rnd, dtype=np.int64),
            "url": curl}))
        lo, hi = self._lo[pos], self._hi[pos]
        deg = hi - lo
        alive = deg > 0
        if not alive.any():
            return {}
        su, wk, lo, deg = su[alive], wk[alive], lo[alive], deg[alive]
        curl = curl[alive]
        keys = [f"{u}#{w}#{rnd + 1}" for u, w in zip(curl, wk)]
        idx = (_hash64_str(keys) % deg.astype(np.uint64)).astype(np.int64)
        nxt = self.edst[lo + idx]
        return {p: ray.put((s, w, c)) for p, s, w, c in
                _slice_by_part((nxt % self.n_parts).astype(np.int64),
                               self.n_parts, su, wk, nxt)}

    def recv_states(self, refs: list) -> None:
        for s, w, c in ray.get(list(refs)):
            self._states.append((s, w, c))

    def rows_arrow(self) -> pa.Table:
        df = pd.concat(self._rows, ignore_index=True) if self._rows else \
            pd.DataFrame({"start_url": [], "walk": [], "step": [],
                          "url": []})
        return pa.table({
            "start_url": pa.array(df["start_url"].astype(str),
                                  type=pa.string()),
            "walk": pa.array(df["walk"].astype(np.int64),
                             type=pa.int64()),
            "step": pa.array(df["step"].astype(np.int64),
                             type=pa.int64()),
            "url": pa.array(df["url"].astype(str), type=pa.string())})


def walk_corpus(links: ray.data.Dataset, nodes: ray.data.Dataset,
                walks_per_node: int = WALKS_PER_NODE,
                walk_len: int = WALK_LEN) -> ray.data.Dataset:
    """(start_url, walk, step, url): a DeepWalk-style random-walk corpus
    over the fetched page graph — ``walks_per_node`` walks from every
    page, each taking ``walk_len`` hops (steps 0..walk_len; a walk ends
    early at a sink page). The next hop is DETERMINISTIC: neighbors
    sort by md5-u64(dst url) and the pick index is
    ``md5_u64(cur_url + '#' + walk + '#' + step) % outdeg`` — a seeded
    hash walk, so the corpus is reproducible AND SQL-mirrorable (no
    RNG state). This is the graph-embedding training-data generator
    (DeepWalk / node2vec with p=q=1): feed (url, context) pairs from
    the walks into any skip-gram trainer.

    Scale shape: out-edges scatter ONCE by hash(src)%P and never move;
    walk STATES are the only per-round exchange — O(#walks) slim rows
    routed to the shard owning their current node (the natural random
    cut of the graph); corpus rows accumulate shard-locally and stream
    out once at the end. Driver traffic per round is O(P²) object
    refs."""
    from .dedup import _hash64_str
    n = nodes.count()
    if n == 0:
        return _empty_graph_table(start_url=pa.string(),
                                  walk=pa.int64(), step=pa.int64(),
                                  url=pa.string())
    P = max(4, min(N_GRAPH_PARTS, n // 25_000 + 1))
    shards = [_WalkShard.remote(p, P) for p in range(P)]

    def scatter_edges(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["src_url", "dst_url"]].drop_duplicates()
        e = e[e["src_url"] != e["dst_url"]]
        s = hash64_array(e["src_url"].astype(str))
        d = hash64_array(e["dst_url"].astype(str))
        hd = _hash64_str(list(e["dst_url"].astype(str)))
        refs = [shards[p].add_pending.remote(ss, dd, hh)
                for p, ss, dd, hh
                in _slice_by_part((d % P).astype(np.int64), P, s, d, hd)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(e)]})

    def scatter_nodes(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].astype(str).to_numpy(dtype=object)
        nid = hash64_array(df["url"])
        refs = [shards[p].add_nodes.remote(i, u) for p, i, u in
                _slice_by_part((nid % P).astype(np.int64), P, nid, urls)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    links.map_batches(scatter_edges, batch_format="pandas").materialize()
    nodes.map_batches(scatter_nodes, batch_format="pandas").materialize()
    ray.get([s.seal_nodes.remote() for s in shards])
    outs = ray.get([s.filter_scatter.remote() for s in shards])
    ray.get([shards[q].recv_edges.remote(
        [outs[p][q] for p in range(P) if q in outs[p]])
        for q in range(P)])
    ray.get([s.seal.remote() for s in shards])
    ray.get([s.start_walks.remote(walks_per_node) for s in shards])

    for rnd in range(walk_len + 1):
        outs = ray.get([s.step.remote(rnd) for s in shards])
        if rnd < walk_len:
            ray.get([shards[q].recv_states.remote(
                [outs[p][q] for p in range(P) if q in outs[p]])
                for q in range(P)])

    out = ray.data.from_arrow_refs(
        [s.rows_arrow.remote() for s in shards]).materialize()
    for s in shards:
        ray.kill(s)
    return out


# ---- skip-gram pair counts over the walk corpus (word2vec prep) ----

WALK_WINDOW = 2


def walk_skipgram_counts(corpus: ray.data.Dataset,
                         window: int = WALK_WINDOW) -> ray.data.Dataset:
    """(center_url, context_url, n_pairs): directional skip-gram
    co-occurrence counts over a :func:`walk_corpus` output — for every
    walk, every ordered pair of positions at distance 1..``window``
    (both directions, the word2vec convention). The final prep step of
    the DeepWalk pipeline: these counts ARE the training distribution a
    skip-gram/SGNS embedding trainer consumes.

    Scale shape: corpus rows slim-tag and co-partition ONCE by
    hash(start_url, walk) (a walk's ≤ walk_len+1 rows co-locate);
    pair generation is ``window`` vectorized self-merges per partition;
    partial (center, context, n) counts pre-combine in-partition, then
    ONE int pair-hash co-partition completes the sums — raw pair rows
    never shuffle and no multi-string-key Ray groupby runs."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        wkey = (hash64_array(df["start_url"].astype(str))
                + df["walk"].to_numpy(np.int64)).astype(np.int64)
        return pd.DataFrame({
            "part": (wkey % N_GRAPH_PARTS).astype(np.int32),
            "wkey": wkey,
            "step": df["step"].to_numpy(np.int64),
            "url": df["url"].to_numpy(dtype=object)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for d in range(1, window + 1):
            rhs = g[["wkey", "step", "url"]].copy()
            rhs["step"] = rhs["step"] - d
            m = g[["wkey", "step", "url"]].merge(
                rhs, on=["wkey", "step"], suffixes=("_a", "_b"))
            if len(m):
                outs.append(pd.DataFrame({
                    "center_url": m["url_a"].to_numpy(dtype=object),
                    "context_url": m["url_b"].to_numpy(dtype=object)}))
                outs.append(pd.DataFrame({
                    "center_url": m["url_b"].to_numpy(dtype=object),
                    "context_url": m["url_a"].to_numpy(dtype=object)}))
        if not outs:
            return pd.DataFrame({
                "center_url": pd.Series([], dtype=object),
                "context_url": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype=np.int64),
                "ppart": pd.Series([], dtype=np.int32)})
        allp = pd.concat(outs, ignore_index=True)
        allp["n_pairs"] = np.int64(1)
        agg = allp.groupby(["center_url", "context_url"],
                           as_index=False, sort=False).sum()
        # int pair-hash co-partition key for the global fold — never a
        # multi-string-key Ray groupby (the per-group pathological shape)
        agg["ppart"] = ((hash64_array(agg["center_url"].astype(str))
                         + hash64_array(agg["context_url"].astype(str)))
                        % N_GRAPH_PARTS).astype(np.int32)
        return agg

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["center_url", "context_url"],
                        as_index=False, sort=False)["n_pairs"].sum()
        agg["n_pairs"] = agg["n_pairs"].astype(np.int64)
        return agg

    return (corpus.map_batches(tag, batch_format="pandas",
                               batch_size=65536)
            .groupby("part").map_groups(
                lambda g: fold(g.drop(columns=["part"])),
                batch_format="pandas")
            .groupby("ppart").map_groups(
                lambda g: final(g.drop(columns=["ppart"])),
                batch_format="pandas"))


# ---- HyperANF neighborhood function (Palmer ANF / Boldi-Vigna) ----

ANF_M = 16                   # HLL registers per node (p = 4)
ANF_ROUNDS = 4               # hop-plot depth
ANF_RHO_CAP = 50             # register cap: keeps the 2^(cap-M) sum in
                             # int64 (16·2^50 = 2^54), error ≤ 2^-50
ANF_ALPHA_M2 = 172.288       # alpha_16 * 16^2 (Flajolet HLL constant)


@ray.remote(num_cpus=0)
class _AnfShard:
    """One ANF partition: edges whose dst hashes here (dst registers
    are local, so the per-round pull "src gathers its out-neighbors'
    registers" becomes a local per-src max + O(V·m) scatter), plus the
    (nid → url, registers) state of owned nodes."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts
        self._ed: list[tuple[np.ndarray, np.ndarray]] = []
        self._nu: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._rows: list[pa.Table] = []

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._ed.append((np.asarray(src, np.int64),
                         np.asarray(dst, np.int64)))
        return len(src)

    def add_nodes(self, nid: np.ndarray, url: np.ndarray,
                  hu: np.ndarray) -> int:
        self._nu.append((np.asarray(nid, np.int64),
                         np.asarray(url, dtype=object),
                         np.asarray(hu, np.uint64)))
        return len(nid)

    def seal(self) -> None:
        nid = (np.concatenate([c[0] for c in self._nu])
               if self._nu else np.empty(0, np.int64))
        url = (np.concatenate([c[1] for c in self._nu])
               if self._nu else np.empty(0, object))
        hu = (np.concatenate([c[2] for c in self._nu])
              if self._nu else np.empty(0, np.uint64))
        self._nu = []
        order = np.argsort(nid, kind="stable")
        keep = (np.r_[True, nid[order][1:] != nid[order][:-1]]
                if len(nid) else np.empty(0, dtype=bool))
        self.nids = nid[order][keep]
        self.urls = url[order][keep]
        hu = hu[order][keep]
        # HLL init: register idx = h % m, rho = ntz(h >> p) + 1
        self.regs = np.zeros((len(self.nids), ANF_M), dtype=np.int64)
        if len(hu):
            idx = (hu % np.uint64(ANF_M)).astype(np.int64)
            w = (hu >> np.uint64(4)).astype(np.int64)
            t = w & -w
            rho = np.where(w == 0, np.int64(61),
                           np.log2(np.maximum(t, 1)).astype(np.int64) + 1)
            rho = np.minimum(rho, ANF_RHO_CAP)
            self.regs[np.arange(len(hu)), idx] = rho
        # edges: keep only fetched dsts (local check), group by src part
        src = (np.concatenate([c[0] for c in self._ed])
               if self._ed else np.empty(0, np.int64))
        dst = (np.concatenate([c[1] for c in self._ed])
               if self._ed else np.empty(0, np.int64))
        self._ed = []
        if len(dst) and len(self.nids):
            pos = np.searchsorted(self.nids, dst)
            np.minimum(pos, len(self.nids) - 1, out=pos)
            ok = self.nids[pos] == dst
            src, dst = src[ok], dst[ok]
        else:
            src = dst = np.empty(0, np.int64)
        spart = (src % self.n_parts).astype(np.int64)
        order = np.lexsort((src, spart))
        self.esrc, self.edst = src[order], dst[order]
        self._bounds = np.searchsorted(spart[order],
                                       np.arange(self.n_parts + 1))

    def snapshot(self, rnd: int) -> None:
        """Append this round's (url, round, sreg, nzero, est_raw) rows —
        sreg = Σ_{M>0} 2^(CAP − M) + nzero·2^CAP exactly (int64), the
        raw HLL indicator scaled by 2^CAP; est_raw = the one IEEE
        division alpha·m²·2^CAP / sreg (identical operand order in the
        SQL mirror → bit-equal doubles)."""
        m = self.regs
        nzero = (m == 0).sum(axis=1).astype(np.int64)
        pw = np.where(m > 0, np.int64(1) << np.maximum(
            ANF_RHO_CAP - m, 0), np.int64(1) << np.int64(ANF_RHO_CAP))
        sreg = pw.sum(axis=1).astype(np.int64)
        est = (ANF_ALPHA_M2 * float(1 << ANF_RHO_CAP)) \
            / sreg.astype(np.float64)
        self._rows.append(pa.table({
            "url": pa.array(self.urls, type=pa.string()),
            "round": pa.array(np.full(len(self.urls), rnd, np.int64),
                              type=pa.int64()),
            "sreg": pa.array(sreg, type=pa.int64()),
            "nzero": pa.array(nzero, type=pa.int64()),
            "est_raw": pa.array(est, type=pa.float64())}))

    def push_refs(self) -> dict:
        """Per-src elementwise-max of the LOCAL dst registers over this
        shard's edges, sliced per src-owner shard."""
        out = {}
        if not len(self.esrc):
            return out
        dpos = np.searchsorted(self.nids, self.edst)
        er = self.regs[dpos]                   # (E, m) dst registers
        for p in range(self.n_parts):
            lo, hi = self._bounds[p], self._bounds[p + 1]
            if lo == hi:
                continue
            k = self.esrc[lo:hi]
            v = er[lo:hi]
            starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            out[p] = ray.put((k[starts],
                              np.maximum.reduceat(v, starts, axis=0)))
        return out

    def apply_max(self, refs: list) -> None:
        if not refs or not len(self.nids):
            return
        parts = ray.get(list(refs))
        k = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts], axis=0)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        uk = k[starts]
        mv = np.maximum.reduceat(v, starts, axis=0)
        pos = np.searchsorted(self.nids, uk)
        np.minimum(pos, len(self.nids) - 1, out=pos)
        ok = self.nids[pos] == uk
        pos, mv = pos[ok], mv[ok]
        self.regs[pos] = np.maximum(self.regs[pos], mv)

    def rows_arrow(self) -> pa.Table:
        return pa.concat_tables(self._rows) if self._rows else pa.table({
            "url": pa.array([], type=pa.string()),
            "round": pa.array([], type=pa.int64()),
            "sreg": pa.array([], type=pa.int64()),
            "nzero": pa.array([], type=pa.int64()),
            "est_raw": pa.array([], type=pa.float64())})


def neighborhood_function(links: ray.data.Dataset,
                          nodes: ray.data.Dataset,
                          rounds: int = ANF_ROUNDS) -> ray.data.Dataset:
    """(url, round, sreg, nzero, est_raw): the HyperANF neighborhood
    function — per page, an HLL sketch of how many pages are reachable
    within ``round`` out-link hops (round 0 = the page itself). The
    hop-plot / effective-diameter analytic of Palmer's ANF and
    Boldi-Vigna's HyperANF: per-node reach curves expose crawl-depth
    payoff (how much of the web each additional hop unlocks) and
    dense-core membership. est_raw is the raw HLL estimate
    alpha·m²/Σ2^-M (no small-range correction — apply linear counting
    downstream using nzero if needed).

    Exactness: registers are integers; sreg = Σ 2^(CAP−M) is an exact
    int64 (register values capped at CAP=50, error ≤ 2^-50); est_raw is
    ONE IEEE division with identical operand order in the SQL mirror,
    so even the float column compares bit-equal.

    Scale shape: edges scatter ONCE keyed by hash(dst)%P (dst registers
    are local to the pull), each round exchanges per-src register-max
    partials — O(V·m) bytes, the HyperANF cost model — and edges never
    re-shuffle. Union-of-sketches is associative+idempotent, so the
    fold is partition-count-invariant."""
    from .dedup import _hash64_str
    n = nodes.count()
    if n == 0:
        return _empty_graph_table(url=pa.string(), round=pa.int64(),
                                  sreg=pa.int64(), nzero=pa.int64(),
                                  est_raw=pa.float64())
    P = max(4, min(N_GRAPH_PARTS, n // 25_000 + 1))
    shards = [_AnfShard.remote(p, P) for p in range(P)]

    def scatter_edges(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["src_url", "dst_url"]].drop_duplicates()
        e = e[e["src_url"] != e["dst_url"]]
        s = hash64_array(e["src_url"].astype(str))
        d = hash64_array(e["dst_url"].astype(str))
        refs = [shards[p].add_edges.remote(ss, dd) for p, ss, dd in
                _slice_by_part((d % P).astype(np.int64), P, s, d)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(e)]})

    def scatter_nodes(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].astype(str).to_numpy(dtype=object)
        nid = hash64_array(df["url"])
        hu = _hash64_str(list(urls))
        refs = [shards[p].add_nodes.remote(i, u, h) for p, i, u, h in
                _slice_by_part((nid % P).astype(np.int64), P,
                               nid, urls, hu)]
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    links.map_batches(scatter_edges, batch_format="pandas").materialize()
    nodes.map_batches(scatter_nodes, batch_format="pandas").materialize()
    ray.get([s.seal.remote() for s in shards])
    ray.get([s.snapshot.remote(0) for s in shards])

    for rnd in range(1, rounds + 1):
        outs = ray.get([s.push_refs.remote() for s in shards])
        ray.get([shards[q].apply_max.remote(
            [outs[p][q] for p in range(P) if q in outs[p]])
            for q in range(P)])
        ray.get([s.snapshot.remote(rnd) for s in shards])

    out = ray.data.from_arrow_refs(
        [s.rows_arrow.remote() for s in shards]).materialize()
    for s in shards:
        ray.kill(s)
    return out


# ---- composed per-host web-graph report (capstone rollup) ----

REPORT_FP = 10 ** 6
REPORT_PARTS = 64


def host_graph_report(pr: ray.data.Dataset, ppr: ray.data.Dataset,
                      cc: ray.data.Dataset,
                      kc: ray.data.Dataset) -> ray.data.Dataset:
    """(host, n_pages, pr_mass_fp, ppr_mass_fp, n_components,
    kcore_rate_fp): one per-host readout composed from four graph
    analytics — total PageRank mass (site authority), seed-personalized
    mass (authority reachable from the crawl's trusted seeds), the
    number of distinct weak components the host's pages fall into
    (intra-site fragmentation), and the fraction of its pages inside
    the k-core (template/dense-cluster exposure). The one-table site
    triage a crawl operator reads before rebudgeting.

    Inputs are the OUTPUTS of :func:`pagerank`, :func:`pagerank`
    (seeded), :func:`page_components`, :func:`kcore` — all url-keyed
    and already scale-shaped; this op only slim-tags them and folds
    under ONE host-hash co-partition (kcore rows restricted to fetched
    pages inside the fold, since kcore's node set is edge endpoints).
    All-integer outputs — exact."""

    def _tag(kind: int, vcol: str):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            host = (df["url"].astype(str)
                    .str.extract(r"^https?://([^/?#]+)", expand=False)
                    .fillna("").str.lower())
            return pd.DataFrame({
                "part": (hash64_array(host) % REPORT_PARTS)
                .astype(np.int32),
                "host": host.to_numpy(dtype=object),
                "url": df["url"].astype(str).to_numpy(dtype=object),
                "kind": np.full(len(df), kind, dtype=np.int8),
                "v": df[vcol].to_numpy(np.int64)})
        return tag

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for host, sub in g.groupby("host", sort=False):
            kind = sub["kind"].to_numpy(np.int8)
            pages = sub.loc[kind == 0, "url"]
            n_pages = len(pages)
            if n_pages == 0:
                continue                 # kcore-only endpoints, no pages
            fetched = set(pages)
            kcsub = sub[kind == 3]
            in_core = int(kcsub.loc[kcsub["url"].isin(fetched), "v"]
                          .sum())
            rows.append((
                host, n_pages,
                int(sub.loc[kind == 0, "v"].sum()),
                int(sub.loc[kind == 1, "v"].sum()),
                int(sub.loc[kind == 2, "v"].nunique()),
                REPORT_FP * in_core // n_pages))
        return pd.DataFrame(rows, columns=[
            "host", "n_pages", "pr_mass_fp", "ppr_mass_fp",
            "n_components", "kcore_rate_fp"]) \
            .astype({"n_pages": np.int64, "pr_mass_fp": np.int64,
                     "ppr_mass_fp": np.int64, "n_components": np.int64,
                     "kcore_rate_fp": np.int64})

    tagged = (pr.select_columns(["url", "rank_fp"])
              .map_batches(_tag(0, "rank_fp"), batch_format="pandas")
              .union(ppr.select_columns(["url", "rank_fp"])
                     .map_batches(_tag(1, "rank_fp"),
                                  batch_format="pandas"))
              .union(cc.select_columns(["url", "comp_fp"])
                     .map_batches(_tag(2, "comp_fp"),
                                  batch_format="pandas"))
              .union(kc.map_batches(
                  lambda df: _tag(3, "in_kcore")(pd.DataFrame({
                      "url": df["url"],
                      "in_kcore": df["in_kcore"].astype(np.int64)})),
                  batch_format="pandas")))
    return (tagged.groupby("part").map_groups(
        lambda g: fold(g.drop(columns=["part"])),
        batch_format="pandas"))
