"""Handcrafted-graph unit tests for the round-3 page-level graph ops
(HITS / components / walks / ANF); the full value-vs-DuckDB gates run
in test_ops_oracle.py over the synthesized web."""

import numpy as np
import pandas as pd
import ray.data

from ghcrawler_ray.ops.graph import (WALK_LEN, WALKS_PER_NODE,
                                     neighborhood_function,
                                     page_components, page_hits,
                                     walk_corpus, walk_skipgram_counts)


def _links(pairs):
    return ray.data.from_pandas(pd.DataFrame(
        {"src_url": [p[0] for p in pairs],
         "dst_url": [p[1] for p in pairs]}))


def _nodes(urls):
    return ray.data.from_pandas(pd.DataFrame({"url": list(urls)}))


def test_page_components_two_islands(ray_session):
    a = [f"http://a.com/{i}" for i in range(3)]
    b = [f"http://b.com/{i}" for i in range(3)]
    pairs = list(zip(a, a[1:] + a[:1])) + list(zip(b, b[1:] + b[:1]))
    out = page_components(_links(pairs), _nodes(a + b)).to_pandas()
    assert len(out) == 6
    comp = out.set_index("url")["comp_fp"]
    assert len({comp[u] for u in a}) == 1        # island A one label
    assert len({comp[u] for u in b}) == 1        # island B one label
    assert comp[a[0]] != comp[b[0]]              # distinct islands


def test_page_components_drops_unfetched_dst(ray_session):
    # edge to a never-fetched page must not merge through it
    out = page_components(
        _links([("http://x.com/1", "http://ghost.com/"),
                ("http://ghost.com/", "http://x.com/2")]),
        _nodes(["http://x.com/1", "http://x.com/2"])).to_pandas()
    comp = out.set_index("url")["comp_fp"]
    assert comp["http://x.com/1"] != comp["http://x.com/2"]


def test_page_hits_star(ray_session):
    hub = "http://hub.com/"
    leaves = [f"http://leaf.com/{i}" for i in range(4)]
    out = page_hits(_links([(hub, u) for u in leaves]),
                    _nodes([hub] + leaves)).to_pandas() \
        .set_index("url")
    # the only out-linker is the hub; leaves are pure authorities
    assert out.loc[hub, "hub_fp"] > 0
    assert out.loc[hub, "auth_fp"] == 0
    for u in leaves:
        assert out.loc[u, "auth_fp"] > 0
        assert out.loc[u, "hub_fp"] == 0
    assert out.loc[leaves, "auth_fp"].nunique() == 1   # symmetric


def test_walk_corpus_follows_forced_path(ray_session):
    # out-degree 1 everywhere → every pick is forced; c is a sink
    a, b, c = ("http://w.com/a", "http://w.com/b", "http://w.com/c")
    out = walk_corpus(_links([(a, b), (b, c)]),
                      _nodes([a, b, c])).to_pandas()
    wa = out[(out["start_url"] == a) & (out["walk"] == 0)] \
        .sort_values("step")
    assert list(wa["url"])[:3] == [a, b, c]            # forced path
    assert len(wa) == 3                                # dies at sink c
    wc = out[(out["start_url"] == c) & (out["walk"] == 0)]
    assert list(wc["url"]) == [c]                      # sink start
    # every node starts WALKS_PER_NODE walks, step 0 emitted for each
    s0 = out[out["step"] == 0]
    assert len(s0) == 3 * WALKS_PER_NODE


def test_walk_skipgram_counts_window(ray_session):
    a, b, c = ("http://w.com/a", "http://w.com/b", "http://w.com/c")
    corpus = walk_corpus(_links([(a, b), (b, c)]), _nodes([a, b, c]))
    out = walk_skipgram_counts(corpus).to_pandas()
    key = out.set_index(["center_url", "context_url"])["n_pairs"]
    # walk a→b→c (×WALKS_PER_NODE): distance-2 pair (a,c) in window
    assert key[(a, c)] == WALKS_PER_NODE
    assert key[(a, b)] >= WALKS_PER_NODE
    # symmetric emission
    assert key[(c, a)] == key[(a, c)]


def test_neighborhood_function_monotone_reach(ray_session):
    urls = [f"http://p.com/{i}" for i in range(5)]
    pairs = list(zip(urls, urls[1:]))                  # directed path
    out = neighborhood_function(_links(pairs), _nodes(urls)).to_pandas()
    head = out[out["url"] == urls[0]].sort_values("round")
    # reach grows along the path: registers only fill → sreg
    # non-increasing, nzero non-increasing, estimate non-decreasing
    assert (np.diff(head["sreg"].to_numpy()) <= 0).all()
    assert (np.diff(head["nzero"].to_numpy()) <= 0).all()
    assert (np.diff(head["est_raw"].to_numpy()) >= -1e-12).all()
    # round 0 = exactly one register set
    assert (out[out["round"] == 0]["nzero"] == 15).all()
    # the sink's sketch never changes
    tail = out[out["url"] == urls[-1]]
    assert tail["sreg"].nunique() == 1


def test_graph_ops_empty_inputs(ray_session):
    empty_links = ray.data.from_pandas(pd.DataFrame(
        {"src_url": pd.Series([], dtype=object),
         "dst_url": pd.Series([], dtype=object)}))
    empty_nodes = ray.data.from_pandas(pd.DataFrame(
        {"url": pd.Series([], dtype=object)}))
    from ghcrawler_ray.ops.graph import pagerank
    for op in (pagerank, page_hits, page_components, walk_corpus,
               neighborhood_function):
        out = op(empty_links, empty_nodes)
        assert out.count() == 0, op.__name__
