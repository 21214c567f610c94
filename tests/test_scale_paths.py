"""The bounded output-scale fast paths (single-task CC, broadcast
cluster assign, single-task minhash verify, driver-side sidecar folds)
each shadow a distributed scale path that ordinary test scales never
reach. These tests force the distributed paths via the threshold
constants and pin them equal to the fast paths — so the 100 TB code
can't rot behind the small-scale shortcut."""

import numpy as np
import pandas as pd
import pytest
import ray.data

import __ray_entry__ as entrymod
from ghcrawler_ray.ops import ann as ops_ann
from ghcrawler_ray.ops import contamination as ops_contam
from ghcrawler_ray.ops import dedup as ops_dedup

SF_DIR = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _pd(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_dup_clusters_distributed_equals_fast_path(ray_session, monkeypatch):
    docs = entrymod._docs(SF_DIR)
    fast = _canon(_pd(ops_dedup.dup_clusters(docs)))
    # force BSP label propagation + the co-partition assign/attach path
    monkeypatch.setattr(ops_dedup, "CC_LOCAL_MAX_EDGES", -1)
    slow = _canon(_pd(ops_dedup.dup_clusters(docs)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_minhash_streaming_verify_equals_local(ray_session, monkeypatch):
    docs = entrymod._docs(SF_DIR)
    fast = _canon(_pd(ops_dedup.minhash_lsh_pairs(docs)))
    monkeypatch.setattr(ops_dedup, "VERIFY_LOCAL_MAX_DOCS", -1)
    slow = _canon(_pd(ops_dedup.minhash_lsh_pairs(docs)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                  rtol=0, atol=0)


def test_minhash_candidate_dataset_path_equals_takeall(ray_session,
                                                       monkeypatch):
    """PAIR_LOCAL_MAX gate: above the bound the candidate pairs never
    reach the driver — aggregate dedup + co-partition doc↔pair join
    feed the streaming verify (_minhash_verify_streaming). Pin it
    output-equal to the take_all path."""
    docs = entrymod._docs(SF_DIR)
    fast = _canon(_pd(ops_dedup.minhash_lsh_pairs(docs)))
    monkeypatch.setattr(ops_dedup, "PAIR_LOCAL_MAX", -1)
    slow = _canon(_pd(ops_dedup.minhash_lsh_pairs(docs)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                  rtol=0, atol=0)


def test_host_scc_edge_list_equals_dense(ray_session, monkeypatch):
    """HOST_DENSE_MAX gate: above the bound, SCC labels come from
    Orzan-coloring edge-list rounds instead of the n×n boolean
    closure — EXACT, so pin full equality."""
    from ghcrawler_ray.ops import graph as ops_graph
    links = entrymod._links_ds(SF_DIR)
    dense = _canon(_pd(ops_graph.host_scc(links)))
    monkeypatch.setattr(ops_graph, "HOST_DENSE_MAX", -1)
    edge = _canon(_pd(ops_graph.host_scc(links)))
    pd.testing.assert_frame_equal(dense, edge, check_dtype=False)


def test_host_bowtie_edge_list_equals_dense(ray_session, monkeypatch):
    """Edge-list bow-tie (coloring SCC + three frontier BFS sweeps)
    is exact — pin full equality with the matrix-closure path."""
    from ghcrawler_ray.ops import graph as ops_graph
    links = entrymod._links_ds(SF_DIR)
    dense = _canon(_pd(ops_graph.host_bowtie(links)))
    monkeypatch.setattr(ops_graph, "HOST_DENSE_MAX", -1)
    edge = _canon(_pd(ops_graph.host_bowtie(links)))
    pd.testing.assert_frame_equal(dense, edge, check_dtype=False)


def test_host_closeness_anf_within_hll_tolerance(ray_session, monkeypatch):
    """Above HOST_DENSE_MAX, closeness runs on the HyperANF register
    machinery — approximate but deterministic. m=16 registers on a
    10-host fixture carry real small-range HLL bias, so pin a generous
    relative band plus schema/rowcount, and pin determinism."""
    from ghcrawler_ray.ops import graph as ops_graph
    links = entrymod._links_ds(SF_DIR)
    dense = _pd(ops_graph.host_closeness(links))
    monkeypatch.setattr(ops_graph, "HOST_DENSE_MAX", -1)
    anf = _pd(ops_graph.host_closeness(links))
    anf2 = _pd(ops_graph.host_closeness(links))
    pd.testing.assert_frame_equal(_canon(anf), _canon(anf2))  # determinism
    m = dense.merge(anf, on="host", suffixes=("_d", "_a"))
    assert len(m) == len(dense)
    rel = (m["n_reachable_a"] - m["n_reachable_d"]).abs() \
        / m["n_reachable_d"].clip(lower=1)
    assert float(rel.max()) <= 0.6
    hrel = (m["harmonic_fp_a"] - m["harmonic_fp_d"]).abs() \
        / m["harmonic_fp_d"].clip(lower=1)
    assert float(hrel.max()) <= 0.6


def test_host_eccentricity_anf_within_tolerance(ray_session, monkeypatch):
    """Eccentricity from register-change depth never exceeds the true
    value; pin ≤ plus a ±1 band on the fixture."""
    from ghcrawler_ray.ops import graph as ops_graph
    links = entrymod._links_ds(SF_DIR)
    dense = _pd(ops_graph.host_eccentricity(links))
    monkeypatch.setattr(ops_graph, "HOST_DENSE_MAX", -1)
    anf = _pd(ops_graph.host_eccentricity(links))
    m = dense.merge(anf, on="host", suffixes=("_d", "_a"))
    assert len(m) == len(dense)
    assert bool((m["eccentricity_a"] <= m["eccentricity_d"]).all())
    assert int((m["eccentricity_d"] - m["eccentricity_a"]).max()) <= 1


def test_dedup_spans_distributed_equals_broadcast(ray_session, monkeypatch):
    docs = entrymod._docs(SF_DIR)
    fast = _canon(_pd(ops_contam.dedup_spans(docs)))
    # force the co-partition join + co-partition rebuild path
    monkeypatch.setattr(ops_contam, "SPAN_BROADCAST_MAX", -1)
    slow = _canon(_pd(ops_contam.dedup_spans(docs)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                  rtol=0, atol=0)


def test_kmeans_distributed_reduce_equals_driver_fold(ray_session, monkeypatch):
    emb = entrymod._emb(SF_DIR)
    fast = _canon(ops_ann.kmeans_fit(emb))
    monkeypatch.setattr(ops_ann, "KMEANS_DRIVER_FOLD_MAX", -1)
    slow = _canon(ops_ann.kmeans_fit(emb))
    # exact int64 fixed-point arithmetic: bit-identical regardless of
    # reduce strategy
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                  rtol=0, atol=0)


def test_centroids_distributed_reduce_equals_driver_fold(ray_session,
                                                         monkeypatch):
    emb = entrymod._emb(SF_DIR)
    fast = _canon(_pd(ops_ann.embedding_centroids(emb)))
    monkeypatch.setattr(ops_ann, "CENTROIDS_DRIVER_FOLD_MAX", -1)
    slow = _canon(_pd(ops_ann.embedding_centroids(emb)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                  rtol=0, atol=0)


def test_dedup_lines_distributed_equals_broadcast(ray_session, monkeypatch):
    # the boilerplated line view — plain sf docs have no duplicated lines
    docs = entrymod._docs_lines(SF_DIR)
    fast = _canon(_pd(ops_contam.dedup_lines(docs)))
    # force the co-partition join + co-partition rebuild path
    monkeypatch.setattr(ops_contam, "LINE_BROADCAST_MAX", -1)
    slow = _canon(_pd(ops_contam.dedup_lines(docs)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                  rtol=0, atol=0)


def test_embedding_dup_pairs_guard_routes_to_lsh(ray_session, monkeypatch):
    """EXACT_PAIRS_MAX gate: the exact-quadratic op refuses to run blind
    above the bound, names the sub-quadratic scale path in the error,
    and force=True still allows a deliberate exact run."""
    emb = entrymod._emb(SF_DIR)
    monkeypatch.setattr(ops_ann, "EXACT_PAIRS_MAX", 10)
    with pytest.raises(ValueError, match="embedding_lsh_pairs"):
        ops_ann.embedding_dup_pairs(emb)
    forced = _canon(_pd(ops_ann.embedding_dup_pairs(emb, force=True)))
    monkeypatch.setattr(ops_ann, "EXACT_PAIRS_MAX", 1 << 17)
    normal = _canon(_pd(ops_ann.embedding_dup_pairs(emb)))
    pd.testing.assert_frame_equal(forced, normal, check_dtype=False)
