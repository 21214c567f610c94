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
