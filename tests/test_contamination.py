"""Unit tests for benchmark decontamination, duplicate n-gram stats
(ghcrawler_ray/ops/contamination.py) and BM25 ranking (ops/search.py)
on tiny handcrafted corpora — behaviors the synthetic sf documents
can't pin precisely. The full value-vs-DuckDB-oracle gate runs in
test_ops_oracle.py (these ops all have SQL mirrors)."""

import numpy as np
import pandas as pd
import ray.data

from ghcrawler_ray.ops.contamination import (BENCH_MOD, decontaminate,
                                             duplicate_ngrams)
from ghcrawler_ray.ops.search import QUERY_TERMS, bm25_topk


def _docs_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_decontaminate_flags_shared_shingles(ray_session):
    bench_text = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        {"doc_id": 0, "text": bench_text},                      # benchmark
        # shares the 5-gram "alpha beta gamma delta epsilon"
        {"doc_id": 1, "text": "x alpha beta gamma delta epsilon y"},
        # same tokens but different order → no shared 5-gram
        {"doc_id": 2, "text": "beta alpha gamma delta epsilon zeta"},
        {"doc_id": 3, "text": "totally unrelated words here now then"},
    ]
    out = decontaminate(_docs_ds(rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3]   # benchmark doc excluded
    assert out["contaminated"].tolist() == [True, False, False]
    assert out["n_hits"].tolist() == [1, 0, 0]


def test_decontaminate_counts_multiple_hits(ray_session):
    bench = "a b c d e f g"                      # 5-grams: abcde bcdef cdefg
    rows = [
        {"doc_id": BENCH_MOD, "text": bench},    # BENCH_MOD % BENCH_MOD == 0
        {"doc_id": 1, "text": "a b c d e f"},    # shares abcde + bcdef
    ]
    out = decontaminate(_docs_ds(rows)).to_pandas()
    assert out.loc[out["doc_id"] == 1, "n_hits"].iloc[0] == 2


def test_duplicate_ngrams_counts_docs_and_occurrences(ray_session):
    shared = "one two three four five"
    rows = [
        # doc 1 contains the shared gram TWICE (repeat within doc)
        {"doc_id": 1, "text": f"{shared} six {shared}"},
        {"doc_id": 2, "text": f"zz {shared} qq"},
        {"doc_id": 3, "text": "nothing in common with the others at all"},
    ]
    out = duplicate_ngrams(_docs_ds(rows)).to_pandas()
    import hashlib
    gh = np.uint64(int.from_bytes(
        hashlib.md5(shared.encode()).digest()[:8], "big")).view(np.int64)
    row = out[out["gram_hash"] == gh]
    assert len(row) == 1
    assert row["n_docs"].iloc[0] == 2
    assert row["n_total"].iloc[0] == 3
    # every reported gram occurs in >= 2 distinct docs
    assert (out["n_docs"] >= 2).all()


def test_bm25_ranks_higher_tf_and_penalizes_length(ray_session):
    t0 = QUERY_TERMS[0]
    rows = [
        {"doc_id": 1, "text": f"{t0} {t0} {t0} filler"},
        {"doc_id": 2, "text": f"{t0} filler filler filler"},
        {"doc_id": 3, "text": "filler filler filler filler"},
        # same tf as doc 2 but much longer → lower score (length norm)
        {"doc_id": 4, "text": f"{t0} " + "pad " * 40},
    ]
    out = bm25_topk(_docs_ds(rows), k=4)
    assert out["rank"].tolist() == [1, 2, 3, 4]
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "rank"] == 1             # highest tf wins
    assert by_id.loc[2, "score"] > by_id.loc[4, "score"]
    assert by_id.loc[3, "score"] == 0.0
    assert by_id.loc[3, "rank"] == 4


def test_ngram_novelty_extremes(ray_session):
    """All-unique corpus → novelty 1.0 everywhere; an exact duplicate of
    an earlier doc → novelty 0 for the copy."""
    import pandas as pd
    import ray.data

    from ghcrawler_ray.ops.contamination import NOVELTY_FP, ngram_novelty

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": [t1, t2, t1]})   # doc 3 copies doc 1
    out = ngram_novelty(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "novelty_fp"] == NOVELTY_FP
    assert out.loc[1, "novelty_fp"] == NOVELTY_FP
    assert out.loc[2, "novelty_fp"] == 0
    assert out.loc[2, "n_shingles"] == out.loc[0, "n_shingles"]
