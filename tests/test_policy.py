"""Traversal policy (fetch authority × freshness) — the reference's
central control surface (`lib/traversalPolicy.js:1-236`): decision-matrix
unit checks, engine↔oracle parity with freshness='always' rows bypassing
the 304 short-circuit, and the storage-authority reprocess pipeline."""

import os
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.reprocess import reprocess_docs
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.policy import (CANONICAL, decide_frame,
                                  decision_table_inputs, is_always,
                                  parse_policy)
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001
ORDER_COLS = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
              "attempt"]


def test_decision_matrix_invariants():
    out = decide_frame(decision_table_inputs().drop(columns=["case_id"]))
    # originOnly always fetches from origin and 'always' always processes
    oo = out[out["fetch"] == "originOnly"]
    assert (oo["content_origin"] == "origin").all()
    assert (out.loc[out["freshness"] == "always", "should_process"]
            | (out.loc[out["freshness"] == "always", "content_origin"] == "none")).all()
    # storageOnly + not stored → no content, never processed (markSkip)
    so = out[(out["fetch"] == "storageOnly") & ~out["in_storage"]]
    assert (so["content_origin"] == "none").all()
    assert (~so["should_process"]).all()
    # match processes iff content actually came from origin
    m = out[out["freshness"] == "match"]
    assert (m["should_process"] == (m["content_origin"] == "origin")).all()
    # version: behind (or never processed) → process, given content exists
    v = out[(out["freshness"] == "version") & (out["content_origin"] != "none")]
    assert (v["should_process"] == (v["stored_version"] < 1)).all()
    # etag cache hit requires the stored copy
    assert ((out["content_origin"] != "cacheOfOrigin") | out["in_storage"]).all()
    # short forms are the reference's letters
    assert set(out.loc[out["policy"] == "reprocess", "short_form"]) == {"SV"}
    assert set(out.loc[out["policy"] == "always", "short_form"]) == {"OA"}
    assert set(out.loc[out["policy"] == "default", "short_form"]) == {"mM"}


def test_canonical_policy_table():
    # the exact (fetch, freshness) pairs from traversalPolicy.js:106-142
    assert parse_policy("default") == ("mutables", "match")
    assert parse_policy("reload") == ("originStorage", "match")
    assert parse_policy("reprocess") == ("storageOnly", "version")
    assert parse_policy("reprocessAndDiscover") == ("storageOriginIfMissing", "version")
    assert parse_policy("reprocessAndUpdate") == ("mutables", "matchOrVersion")
    assert parse_policy("always") == ("originOnly", "always")
    assert parse_policy("reprocessAlways") == ("storageOnly", "always")
    assert is_always("always") and is_always("reprocessAlways")
    assert not is_always("default") and not is_always("garbage")
    # policy spec with a map suffix parses (mapSpec handled by visitor map)
    assert parse_policy("default:self") == CANONICAL["default"]


def _always_web_root(tmp_path: Path) -> Path:
    """Synthetic web whose two duplicate-content alias SEEDS carry
    policy='always' (everything else default)."""
    root = ensure_testdata(SF)
    custom = tmp_path / "web"
    custom.mkdir()
    for name in ("pages", "pages_meta"):
        os.symlink(root / name, custom / name)
    shutil.copy(root / "robots.parquet", custom / "robots.parquet")
    seeds = pq.read_table(str(root / "seeds.parquet")).to_pandas()
    alias = seeds["url"].str.contains("/dup/")
    assert alias.sum() >= 2
    seeds.loc[alias, "policy"] = "always"
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(seeds, preserve_index=False),
                   custom / "seeds.parquet")
    return custom


def _norm(df, cols):
    df = df[cols].copy()
    for c in cols:
        df[c] = df[c].astype("int64") if df[c].dtype.kind in "iu" \
            else df[c].fillna("").astype(str)
    return df.reset_index(drop=True)


def _read_order(out: Path) -> pd.DataFrame:
    files = sorted((out / "order").glob("wave=*.parquet"),
                   key=lambda p: int(p.stem.split("=")[1]))
    return pq.read_table([str(f) for f in files]).to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("threshold", [0, 1 << 20],
                         ids=["distributed", "local"])
def test_always_policy_bypasses_304_and_matches_oracle(tmp_path, threshold):
    web_root = _always_web_root(tmp_path)
    golden = SequentialOracle(load_web(web_root), CrawlConfig()).run()
    cfg = CrawlConfig(local_wave_threshold=threshold)
    CrawlEngine(web_root, tmp_path / "out", cfg).run()
    eo = _read_order(tmp_path / "out")
    pd.testing.assert_frame_equal(_norm(eo, ORDER_COLS),
                                  _norm(golden["order"], ORDER_COLS))
    # the always-policy duplicate-content seeds FETCHED (a default-policy
    # crawl 304s them — pinned by test_parity's wave-0 not_modified rows)
    alias0 = eo[(eo["wave"] == 0) & eo["url"].str.contains("/dup/")]
    assert len(alias0) == 2
    assert (alias0["outcome"] == "fetched").all()
    base = ensure_testdata(SF)
    ref = SequentialOracle(load_web(base), CrawlConfig()).run()
    ralias0 = ref["order"][(ref["order"]["wave"] == 0)
                           & ref["order"]["url"].str.contains("/dup/")]
    # default policy: the etag-group winner fetches, the duplicate 304s
    assert sorted(ralias0["outcome"]) == ["fetched", "not_modified"]


@pytest.mark.usefixtures("ray_session")
def test_reprocess_pipeline(tmp_path):
    web_root = ensure_testdata(SF)
    out = tmp_path / "out"
    CrawlEngine(web_root, out, CrawlConfig()).run()
    stored = pq.read_table(
        [str(p) for p in sorted((out / "pages").rglob("bucket=*.parquet"))],
        partitioning=None,   # physical `wave` column vs wave=K dirs
    ).to_pandas()
    assert (stored["version"] == 1).all()

    res = reprocess_docs(out, policy="reprocess", current_version=2)
    df = res.to_pandas()
    assert len(df) == len(stored)                  # v1 < v2: all reprocessed
    assert (df["version"] == 2).all() and (df["prev_version"] == 1).all()
    assert (df["n_ws_tokens"] > 0).all()
    assert (out / "docs_v2").exists()
    delta = pq.read_table(
        [str(p) for p in sorted((out / "delta").rglob("*.parquet"))],
        partitioning=None).to_pandas()
    assert (delta["change"] == "new").sum() == len(stored)
    assert (delta["change"] == "reprocessed").sum() == len(stored)

    # same version again: freshness='version' now skips everything
    res2 = reprocess_docs(out, policy="reprocess", current_version=2)
    assert res2.count() == 0
    # reprocessAlways ignores versions
    res3 = reprocess_docs(out, policy="reprocessAlways", current_version=2)
    assert res3.count() == len(stored)
    with pytest.raises(ValueError):
        reprocess_docs(out, policy="always")
