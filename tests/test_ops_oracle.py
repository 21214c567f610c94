"""Driver-faithful oracle comparison: run each queries() pipeline AND its
DuckDB SQL mirror on the same inputs (sf0.001), compare row count, column
set, and exact values after order-insensitive sort — the same gate the
driver applies at sf0.01 (CORRECTNESS_r{N}.json)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].fillna("").astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


SQL_CHECKED = sorted(set(entrymod._ops_sql()) | set(entrymod._crawl_sql(0.001)))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con, ray_session):
    q = entrymod.queries()[name]
    sql = {**entrymod._ops_sql(), **entrymod._crawl_sql(0.001)}[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  rtol=0, atol=0)


def test_rows_only_queries_run(ray_session):
    """Queries without SQL mirrors (stateful / sketch-based) still run and
    return stable deterministic results."""
    qs = entrymod.queries()
    fp1 = _canon(_to_pandas(qs["doc_fingerprints"](SF_DIR)))
    fp2 = _canon(_to_pandas(qs["doc_fingerprints"](SF_DIR)))
    pd.testing.assert_frame_equal(fp1, fp2)
    assert set(fp1.columns) == {"doc_id", "fingerprint", "n_selected"}

    sp = _canon(_to_pandas(qs["simhash_pairs"](SF_DIR)))
    assert set(sp.columns) == {"doc_a", "doc_b", "hamming"}
    if len(sp):
        assert (sp["hamming"] <= 3).all() and (sp["doc_a"] < sp["doc_b"]).all()

    lsh = _canon(_to_pandas(qs["embedding_lsh_pairs"](SF_DIR)))
    assert set(lsh.columns) == {"vec_a", "vec_b", "cos"}


def test_minhash_recall_equals_exact_on_separated_data(ray_session):
    """The planted near-dups sit at jaccard ≈ 0.99 ≫ 0.5 — 8x8 LSH recall
    at that similarity is ~1-1e-9, so MinHash-LSH must find exactly the
    exact-Jaccard pair set here."""
    qs = entrymod.queries()
    mh = _canon(_to_pandas(qs["minhash_lsh_pairs"](SF_DIR)))
    ex = _canon(_to_pandas(qs["ngram_jaccard_pairs"](SF_DIR)))
    mh2 = mh[["doc_a", "doc_b"]].reset_index(drop=True)
    # exact path blocks by lang; minhash does not — minhash ⊇ exact, and
    # extras (if any) must be cross-lang true dups
    exact_pairs = set(map(tuple, ex[["doc_a", "doc_b"]].values.tolist()))
    mh_pairs = set(map(tuple, mh2.values.tolist()))
    assert exact_pairs <= mh_pairs
    assert (mh["jaccard"] >= 0.5).all()


def test_session_paths_cross_consistency(ray_session):
    """Σ n_sessions over all paths == total session count from
    sessionize, and Σ (n_gaps over dwell_by_type) == total events −
    total per-user streams (every non-final event has exactly one
    gap)."""
    import __ray_entry__ as em
    from ghcrawler_ray.ops.events import dwell_by_type, session_paths, \
        sessionize

    ev = em._events(SF_DIR)
    n_sessions = sessionize(ev).count()
    paths = session_paths(ev).to_pandas()
    assert int(paths["n_sessions"].sum()) == n_sessions

    dw = dwell_by_type(ev)
    ed = ev.to_pandas()
    assert int(dw["n_gaps"].sum()) == len(ed) - ed["user_id"].nunique()
