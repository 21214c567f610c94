"""Engine ↔ sequential-oracle parity — the crawl-ordering / seen-set golden
test (analogue of the reference's in-memory end-to-end ordering test,
`test/unit/processingTests.js:13-46`, per SURVEY.md §5 plan (c)).

The oracle (pipelines/oracle.py) reimplements the wave semantics as pure
sequential pandas; the engine must reproduce its crawl order, final seen
set, deadletters, metrics, and byte-identical extracted text.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001
ORDER_COLS = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
              "attempt"]


def _norm(df: pd.DataFrame, cols) -> pd.DataFrame:
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].fillna("").astype(str)
    return df.reset_index(drop=True)


def _read_order(out_dir: Path) -> pd.DataFrame:
    files = sorted((out_dir / "order").glob("wave=*.parquet"),
                   key=lambda p: int(p.stem.split("=")[1]))
    return pq.read_table([str(f) for f in files]).to_pandas()


def _read_dir(d: Path) -> pd.DataFrame:
    return pd.concat([pq.read_table(str(p)).to_pandas()
                      for p in sorted(d.rglob("*.parquet"))], ignore_index=True)


@pytest.fixture(scope="module")
def web_root():
    return ensure_testdata(SF)


@pytest.fixture(scope="module")
def golden(web_root):
    return SequentialOracle(load_web(web_root), CrawlConfig()).run()


@pytest.fixture(scope="module", params=["local", "distributed"])
def engine_out(request, web_root, ray_session, tmp_path_factory):
    """One full engine run per mode: 'local' exercises the small-wave fast
    path, 'distributed' forces every wave through the Ray Data pipeline."""
    out = tmp_path_factory.mktemp(f"crawl_{request.param}")
    threshold = 0 if request.param == "distributed" else 1 << 20
    cfg = CrawlConfig(local_wave_threshold=threshold)
    eng = CrawlEngine(web_root, out, cfg)
    res = eng.run()
    assert res["n_waves"] > 5
    return Path(res["out_dir"])


def test_crawl_order_parity(engine_out, golden):
    eo = _norm(_read_order(engine_out), ORDER_COLS)
    go = _norm(golden["order"], ORDER_COLS)
    pd.testing.assert_frame_equal(eo, go)


def test_seen_set_parity(engine_out, golden):
    es = pq.read_table(str(engine_out / "seen.parquet")).to_pandas()
    cols = ["url", "first_wave", "etag"]
    pd.testing.assert_frame_equal(
        _norm(es.sort_values("url"), cols),
        _norm(golden["seen"].sort_values("url"), cols))


def test_deadletter_parity(engine_out, golden):
    ed = _read_dir(engine_out / "deadletter").sort_values(["wave", "url"])
    gd = golden["deadletter"].sort_values(["wave", "url"])
    cols = ["url", "reason", "attempt", "wave"]
    pd.testing.assert_frame_equal(_norm(ed, cols), _norm(gd, cols))
    assert (gd["reason"].isin(["malformed", "attempt_cap"])).all()
    assert len(gd) > 0  # the probes actually exercised the deadletter path


def test_extracted_text_byte_identical(engine_out, web_root):
    pages = _read_dir(engine_out / "pages")
    src = pq.read_table(
        sorted(str(p) for p in (web_root / "pages").glob("bucket=*/part-0.parquet")),
        columns=["url", "text"]).to_pandas()
    j = pages.merge(src, on="url", suffixes=("", "_src"))
    assert len(j) == len(pages)
    assert (j["text"] == j["text_src"]).all()
    # each fetched url stored exactly once (etag dedup collapses aliases)
    assert not pages["url"].duplicated().any()


def test_metrics_parity(engine_out, golden):
    em = _read_dir(engine_out / "metrics")
    gm = golden["metrics"]
    cols = ["wave", "outcome", "n"]
    pd.testing.assert_frame_equal(
        _norm(em.sort_values(cols), cols), _norm(gm.sort_values(cols), cols))
    # per-partition metrics exist and reconcile with the totals
    ep = _read_dir(engine_out / "metrics_partition")
    tot = ep.groupby(["wave", "outcome"])["n"].sum().reset_index()
    m = tot.merge(em, on=["wave", "outcome"], suffixes=("_p", ""))
    assert (m["n_p"] == m["n"]).all()


def test_links_parity(engine_out, golden):
    el = _read_dir(engine_out / "links")
    gl = golden["links"]
    cols = ["wave", "src_url", "dst_url", "link_index"]
    pd.testing.assert_frame_equal(
        _norm(el.sort_values(cols), cols), _norm(gl.sort_values(cols), cols))


def test_delta_log_matches_store(engine_out):
    """S6 delta/changelog sink (`providers/storage/deltaStore.js:26-31,
    102-114` analogue): exactly one append-only 'new' delta row per store
    upsert, with the store's etag and wave."""
    delta = _read_dir(engine_out / "delta")
    pages = _read_dir(engine_out / "pages")
    assert (delta["change"] == "new").all()
    cols = ["url", "etag", "wave"]
    pd.testing.assert_frame_equal(
        _norm(delta.sort_values(cols), cols),
        _norm(pages.sort_values(cols), cols))


def test_truncated_crawl_seen_etag_parity(web_root, ray_session, tmp_path):
    """max_waves truncation with deferrals still pending: a url CLAIMED
    but never admitted must appear in seen.parquet with first_wave set
    and NO etag (the partition stage probes etags before politeness
    admission; that probe must not leak into the seen artifact — the
    etag index records fetch-time state only)."""
    import dataclasses

    cfg = dataclasses.replace(CrawlConfig(), max_waves=3,
                              local_wave_threshold=0)
    golden = SequentialOracle(load_web(web_root), cfg).run()
    res = CrawlEngine(web_root, tmp_path / "out", cfg).run()
    seen = pq.read_table(str(Path(res["out_dir"]) / "seen.parquet")) \
        .to_pandas()
    gs = golden["seen"]
    cols = ["url", "first_wave", "etag"]
    pd.testing.assert_frame_equal(
        _norm(seen.sort_values("url"), cols),
        _norm(gs.sort_values("url"), cols))
    # the scenario is non-degenerate: some claims must still be pending
    assert seen["etag"].fillna("").eq("").any(), \
        "fixture has no pending claims at truncation — shrink max_waves"
