"""Deadletter admin (list/count/delete/requeue with untrack) and
mid-crawl seed injection — reference parity: `lib/crawlerService.js:
107-134`, `routes/deadletters.js`, `routes/webhook.js:14-60`,
`providers/queuing/redisRequestTracker.js:43-53` (untrack)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.admin import (count_deadletters, delete_deadletters,
                                 inject_seeds, list_deadletters,
                                 requeue_deadletters)
from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001
ORDER_COLS = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
              "attempt"]


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


def _inject_seeds_df():
    return pd.DataFrame({
        "url": ["http://host1.example/p/2", "http://injected.example/x",
                "http://host0.example/missing/injected"],
        "priority": ["events", "normal", "soon"],
        "policy": "default",
        "seq": np.array([9001, 9002, 9003], dtype=np.int64),
    })


@pytest.mark.usefixtures("ray_session")
def test_mid_crawl_injection_matches_oracle(tmp_path):
    web_root = ensure_testdata(SF)
    inject = {2: _inject_seeds_df()}
    golden = SequentialOracle(load_web(web_root), CrawlConfig(),
                              inject=inject).run()
    eng = CrawlEngine(web_root, tmp_path / "out", CrawlConfig(),
                      inject=inject)
    eng.run()
    eo = _norm(_read_order(tmp_path / "out"), ORDER_COLS)
    go = _norm(golden["order"], ORDER_COLS)
    pd.testing.assert_frame_equal(eo, go)
    # the injected urls were actually processed
    assert (eo["url"] == "http://injected.example/x").any()      # filtered
    assert (eo["url"] == "http://host1.example/p/2").any()


@pytest.mark.usefixtures("ray_session")
def test_injection_into_checkpointed_crawl(tmp_path):
    """admin.inject_seeds between engine runs == in-process inject hook."""
    web_root = ensure_testdata(SF)
    inject = {2: _inject_seeds_df()}
    ref = CrawlEngine(web_root, tmp_path / "ref", CrawlConfig(), inject=inject)
    ref.run()

    eng = CrawlEngine(web_root, tmp_path / "out", CrawlConfig(max_waves=2))
    eng.run()
    inject_seeds(tmp_path / "out", _inject_seeds_df(), wave=2)
    CrawlEngine(web_root, tmp_path / "out", CrawlConfig()).run(resume=True)
    pd.testing.assert_frame_equal(
        _norm(_read_order(tmp_path / "out"), ORDER_COLS),
        _norm(_read_order(tmp_path / "ref"), ORDER_COLS))


@pytest.mark.usefixtures("ray_session")
def test_deadletter_admin_roundtrip(tmp_path):
    web_root = ensure_testdata(SF)
    out = tmp_path / "out"
    CrawlEngine(web_root, out, CrawlConfig()).run()

    dead = list_deadletters(out)
    assert len(dead) == count_deadletters(out) > 0
    assert set(dead["reason"]) == {"malformed", "attempt_cap"}

    # delete the malformed rows
    n_mal = int((dead["reason"] == "malformed").sum())
    assert delete_deadletters(out, reason="malformed") == n_mal
    remaining = list_deadletters(out)
    assert len(remaining) == len(dead) - n_mal
    assert (remaining["reason"] == "attempt_cap").all()

    # requeue one attempt-capped url: untrack + fresh frontier row
    target = remaining["url"].iloc[0]
    final_wave = int(_read_order(out)["wave"].max())
    assert requeue_deadletters(web_root, out, urls=[target]) == 1
    assert target not in set(list_deadletters(out)["url"])

    CrawlEngine(web_root, out, CrawlConfig()).run(resume=True)
    log = _read_order(out)
    tail = log[(log["wave"] > final_wave) & (log["url"] == target)]
    # untrack worked: the requeued url was re-claimed and re-attempted
    # (not bounced), restarting its retry ladder at attempt 0
    assert len(tail) > 0
    assert (tail["outcome"] == "fetch_error").all()
    assert int(tail["attempt"].min()) == 0
    # and it eventually deadlettered again at the attempt cap
    dead2 = list_deadletters(out)
    assert target in set(dead2["url"])
    assert (dead2.loc[dead2["url"] == target, "wave"] > final_wave).all()

    # seen set is stable: the url keeps its original first_wave
    seen = pq.read_table(str(out / "seen.parquet")).to_pandas()
    assert not seen["url"].duplicated().any()


def test_webhook_signature_accept_reject(tmp_path):
    """HMAC webhook-auth analogue (`routes/webhook.js:22-38`): a valid
    signature enqueues; a bad/missing one enqueues NOTHING and
    deadletters the payload with reason='bad_signature'."""
    from ghcrawler_ray.admin import webhook_signature

    seeds = _inject_seeds_df()
    secret = "s3cret"
    sig = webhook_signature(seeds, secret)
    # row-order invariance (parquet round-trips reorder nothing, but a
    # replayed payload might)
    assert sig == webhook_signature(
        seeds.iloc[::-1].reset_index(drop=True), secret)

    out = tmp_path / "out"
    n = inject_seeds(out, seeds, wave=2, secret=secret, signature=sig)
    assert n == len(seeds)
    assert (out / "frontier" / "wave=2" / "injected-0.parquet").exists()

    # bad signature → rejected (-1, distinct from a signed no-op's 0)
    # + deadlettered
    n = inject_seeds(out, seeds, wave=3, secret=secret,
                     signature="0" * 40)
    assert n == -1
    assert not (out / "frontier" / "wave=3").exists()
    dead = list_deadletters(out, reason="bad_signature")
    assert set(dead["url"]) == set(seeds["url"])
    assert (dead["wave"] == 3).all()

    # missing signature with a secret configured → same rejection
    n = inject_seeds(out, seeds, wave=4, secret=secret)
    assert n == -1
    assert len(list_deadletters(out, reason="bad_signature")) \
        == 2 * len(seeds)

    # no secret → unauthenticated legacy path still works
    n = inject_seeds(out, seeds, wave=5)
    assert n == len(seeds)


@pytest.mark.usefixtures("ray_session")
def test_signed_injection_end_to_end(tmp_path):
    """A correctly signed injection into a checkpointed crawl behaves
    exactly like the unauthenticated one (full order parity), and the
    rejected payload changes nothing when the crawl resumes."""
    from ghcrawler_ray.admin import webhook_signature

    web_root = ensure_testdata(SF)
    inject = {2: _inject_seeds_df()}
    ref = CrawlEngine(web_root, tmp_path / "ref", CrawlConfig(),
                      inject=inject)
    ref.run()

    eng = CrawlEngine(web_root, tmp_path / "out", CrawlConfig(max_waves=2))
    eng.run()
    seeds = _inject_seeds_df()
    secret = "hook-secret"
    # a tampered payload is rejected first...
    bad = seeds.copy()
    bad.loc[0, "url"] = "http://evil.example/x"
    assert inject_seeds(tmp_path / "out", bad, wave=2, secret=secret,
                        signature=webhook_signature(seeds, secret)) == -1
    # ...then the authentic one lands
    assert inject_seeds(tmp_path / "out", seeds, wave=2, secret=secret,
                        signature=webhook_signature(seeds, secret)) \
        == len(seeds)
    CrawlEngine(web_root, tmp_path / "out", CrawlConfig()).run(resume=True)
    pd.testing.assert_frame_equal(
        _norm(_read_order(tmp_path / "out"), ORDER_COLS),
        _norm(_read_order(tmp_path / "ref"), ORDER_COLS))
    dead = list_deadletters(tmp_path / "out", reason="bad_signature")
    assert (dead["url"] == "http://evil.example/x").any()
