"""Sparse shingle similarity joins: cosine near-dup scoring and
asymmetric containment (quote/subset) detection."""
import numpy as np
import pandas as pd
import ray.data

from ghcrawler_ray.ops.similarity import (SIM_FP, containment_pairs,
                                          shingle_cosine_pairs)

_BASE = ("the quick brown fox jumps over the lazy dog while the "
         "quick brown cat naps beside the warm stone wall today")
_NEAR = _BASE.replace("naps", "rests")  # one token differs
_QUOTE_HOST = ("intro words here before the quote begins now " + _BASE
               + " and a long trailing commentary follows the quoted text "
               "with many extra tokens that dilute jaccard badly indeed "
               "because the host document keeps growing and growing")
_OTHER = ("completely different content about distributed stream "
          "processing engines shuffling arrow record batches between "
          "worker actors with backpressure and object spilling enabled")


def _ds():
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [_BASE, _NEAR, _QUOTE_HOST, _OTHER]}))


def test_cosine_exact_dup_scores_full():
    two = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([7, 9], dtype=np.int64),
         "text": [_BASE, _BASE]}))
    out = shingle_cosine_pairs(two).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.doc_a, row.doc_b) == (7, 9)
    assert row.cos2_fp == SIM_FP  # identical tf vectors -> cosine exactly 1


def test_cosine_near_dup_found_distinct_not():
    out = shingle_cosine_pairs(_ds()).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (0, 1) in pairs                      # one-token edit survives
    assert not any(3 in p for p in pairs)       # unrelated doc never pairs
    near = out[(out.doc_a == 0) & (out.doc_b == 1)].iloc[0]
    assert 0 < near.cos2_fp < SIM_FP


def test_containment_detects_quote_one_sided():
    out = containment_pairs(_ds()).to_pandas()
    row = out[(out.doc_a == 0) & (out.doc_b == 2)]
    assert len(row) == 1                        # base is quoted inside host
    row = row.iloc[0]
    assert row.cont_a_fp == SIM_FP              # every base shingle in host
    assert row.cont_b_fp < SIM_FP // 2          # host side far from dup
    assert not any((out.doc_a == 3) | (out.doc_b == 3))


def test_containment_denominator_is_true_set_size():
    # a doc whose every shingle is df-pruned still keeps its real size:
    # pair (0,1) intersect on shared shingles but denominators are the
    # full distinct-shingle counts of each doc.
    out = containment_pairs(_ds()).to_pandas()
    row = out[(out.doc_a == 0) & (out.doc_b == 1)].iloc[0]
    assert row.cont_a_fp <= SIM_FP and row.cont_b_fp <= SIM_FP
    assert row.cont_a_fp >= SIM_FP * 8 // 10    # near-dup: >=80% contained


def test_dedup_eval_perfect_on_exact_dups():
    from ghcrawler_ray.ops.dedup import DEDUP_EVAL_FP, dedup_eval
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "lang": ["en", "en", "en"],
        "text": [_BASE, _BASE, _OTHER]}))
    out = dedup_eval(ds)
    row = out.iloc[0]
    # the exact-dup pair is both the whole truth and fully recalled
    assert (row.n_truth, row.n_hit) == (1, 1)
    assert row.recall_fp == DEDUP_EVAL_FP
    assert row.n_pred >= 1 and row.precision_fp <= DEDUP_EVAL_FP


def test_ann_label_mrr_zero_topk_query(ray_session):
    """A query with zero top-k rows (single-vector table) must still
    appear with first_hit_rank 0 — qids come from the query-id DOMAIN
    (vec_id < n_queries present in emb), matching the SQL mirror's
    LEFT JOIN over the query ids (round-3 advice)."""
    import pandas as pd
    import ray.data

    from ghcrawler_ray.ops.ann import ann_label_mrr

    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0], "label": [5],
        "embedding": [[1.0, 0.0]]}))
    out = ann_label_mrr(emb, k=3, n_queries=8)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert list(df["query_id"]) == [0]
    assert list(df["query_label"]) == [5]
    assert list(df["first_hit_rank"]) == [0]
    assert list(df["mrr_fp"]) == [0]
