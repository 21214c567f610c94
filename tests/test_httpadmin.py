"""HTTP admin shim (`app.js:24-33` express routes analogue) — the
operator surface over a checkpointed/running crawl: status, deadletter
list/count/delete, HMAC-authenticated seed injection (POST /requests →
`routes/requests.js:23-29` + `routes/webhook.js:22-38`), and live
config patching (PATCH /config → `routes/config.js` pub-sub analogue).

The end-to-end case is the verdict's done-criterion: spin the server
over a mid-crawl checkpoint, POST a SIGNED seed payload, resume — the
final crawl order must equal the in-process ``CrawlEngine(inject=...)``
reference run exactly.
"""

import json
import urllib.request
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.admin import webhook_signature
from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.httpadmin import serve_background
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001
ORDER_COLS = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
              "attempt"]


def _call(base: str, path: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _seeds_df():
    return pd.DataFrame({
        "url": ["http://h0.example/p/42", "http://h1.example/p/43"],
        "priority": ["immediate", "normal"],
        "seq": [9_000_001, 9_000_002],
    })


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


@pytest.fixture(scope="module")
def web_root():
    return ensure_testdata(SF)


@pytest.fixture(scope="module")
def half_crawl(web_root, ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("httpadmin") / "out"
    CrawlEngine(web_root, out, CrawlConfig(max_waves=2)).run()
    return out


@pytest.fixture()
def server(half_crawl):
    srv, _t = serve_background(half_crawl, secret="hook-secret")
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", half_crawl
    srv.shutdown()
    srv.server_close()


def test_status_and_deadletters_routes(server):
    base, out = server
    code, status = _call(base, "/status")
    assert code == 200
    assert status["waves_complete"] == 2
    assert "next_clock" in status["last_wave"]
    code, cnt = _call(base, "/deadletters/count")
    assert code == 200 and cnt["count"] >= 0
    code, dl = _call(base, "/deadletters?reason=nope")
    assert code == 200 and dl["deadletters"] == []
    code, _ = _call(base, "/nothing")
    assert code == 404


def test_patch_config_route_validates(server):
    base, out = server
    code, resp = _call(base, "/config", "PATCH",
                       {"wave": 3, "patch": {"wave_ms": "oops"}})
    assert code == 400 and "wave_ms" in resp["error"]
    assert not (out / "config_patches").exists()
    code, resp = _call(base, "/config", "PATCH",
                       {"wave": 3, "patch": {"requeue_delay_ms": 1000}})
    assert code == 200
    f = out / "config_patches" / "wave=3.json"
    assert json.loads(f.read_text()) == {"requeue_delay_ms": 1000}
    f.unlink()   # keep the parity test below patch-free


def test_signed_injection_over_http_order_parity(server, web_root,
                                                 ray_session,
                                                 tmp_path_factory):
    base, out = server
    seeds = _seeds_df()

    # tampered payload → 401, deadlettered, nothing enqueued
    bad = seeds.copy()
    bad.loc[0, "url"] = "http://evil.example/x"
    code, resp = _call(base, "/requests", "POST", {
        "wave": 2, "seeds": bad.to_dict(orient="records"),
        "signature": webhook_signature(seeds, "hook-secret")})
    assert code == 401
    code, dl = _call(base, "/deadletters?reason=bad_signature")
    assert any(r["url"] == "http://evil.example/x"
               for r in dl["deadletters"])

    # authentic payload lands
    code, resp = _call(base, "/requests", "POST", {
        "wave": 2, "seeds": seeds.to_dict(orient="records"),
        "signature": webhook_signature(seeds, "hook-secret")})
    assert code == 201 and resp["injected"] == len(seeds)

    # resume → identical order to the in-process inject reference
    CrawlEngine(web_root, out, CrawlConfig()).run(resume=True)
    ref_out = tmp_path_factory.mktemp("httpref") / "out"
    CrawlEngine(web_root, ref_out, CrawlConfig(),
                inject={2: _seeds_df()}).run()
    pd.testing.assert_frame_equal(
        _norm(_read_order(out), ORDER_COLS),
        _norm(_read_order(ref_out), ORDER_COLS))
