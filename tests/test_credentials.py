"""Credential classes (token trait-set analogue) — engine ↔ oracle parity.

The reference matches tokens to requests by trait set
(`providers/fetcher/tokenFactory.js:41-70` _traitsMatch) and on 401/403
retries a fetch once under an elevated/admin token
(`providers/fetcher/githubFetcher.js:67-72`). The analogue
(CrawlConfig.protected_url_regex / elevated_retry /
elevated_max_per_window) must reproduce the sequential oracle exactly:
auth_denied outcomes, the single privileged retry, per-(host, cred)
politeness budgets, and the deadletter path when the retry is disabled.
"""

from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001
PROT = r"/p/(?:3|7)$"
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
    if not d.exists():
        return pd.DataFrame(columns=["url", "reason", "attempt", "wave"])
    return pd.concat([pq.read_table(str(p)).to_pandas()
                      for p in sorted(d.rglob("*.parquet"))],
                     ignore_index=True)


@pytest.fixture(scope="module")
def web_root():
    return ensure_testdata(SF)


@pytest.fixture(scope="module")
def cfg_retry():
    return CrawlConfig(protected_url_regex=PROT, elevated_max_per_window=2)


@pytest.fixture(scope="module")
def golden_retry(web_root, cfg_retry):
    return SequentialOracle(load_web(web_root), cfg_retry).run()


@pytest.fixture(scope="module", params=["local", "distributed"])
def engine_retry(request, web_root, cfg_retry, ray_session,
                 tmp_path_factory):
    import dataclasses
    out = tmp_path_factory.mktemp(f"cred_{request.param}")
    threshold = 0 if request.param == "distributed" else 1 << 20
    cfg = dataclasses.replace(cfg_retry, local_wave_threshold=threshold)
    res = CrawlEngine(web_root, out, cfg).run()
    return Path(res["out_dir"])


def test_credential_order_parity(engine_retry, golden_retry):
    eo = _norm(_read_order(engine_retry), ORDER_COLS)
    go = _norm(golden_retry["order"], ORDER_COLS)
    pd.testing.assert_frame_equal(eo, go)


def test_privileged_retry_path_visible(golden_retry):
    """The crawl order must SHOW the retry: a protected url is
    auth_denied under the public class, then succeeds under the
    elevated class in a later wave (same attempt count)."""
    order = golden_retry["order"]
    denied = order[order["outcome"] == "auth_denied"]
    assert len(denied) > 0
    ok = order[order["outcome"].isin(["fetched", "not_modified"])]
    both = set(denied["url"]) & set(ok["url"])
    assert both, "no protected url succeeded on the elevated retry"
    u = sorted(both)[0]
    rows = order[order["url"] == u].sort_values(["wave", "seq_in_wave"])
    ocs = list(rows["outcome"])
    assert "auth_denied" in ocs
    assert ocs.index("auth_denied") < max(
        i for i, o in enumerate(ocs) if o in ("fetched", "not_modified"))


def test_elevated_budget_is_scarcer(golden_retry, cfg_retry):
    """The elevated class admits at most elevated_max_per_window rows
    per (host, salt) per wave — retries beyond it defer to later waves,
    so a host with many protected pages takes several waves to drain."""
    order = golden_retry["order"]
    denied_urls = set(order.loc[order["outcome"] == "auth_denied", "url"])
    ok = order[order["outcome"].isin(["fetched", "not_modified"])
               & order["url"].isin(denied_urls)]
    per_wave = ok.groupby(["host", "wave"]).size()
    assert (per_wave <= cfg_retry.elevated_max_per_window).all()


def test_no_retry_deadletters_parity(web_root, ray_session, tmp_path):
    import dataclasses
    cfg = CrawlConfig(protected_url_regex=PROT, elevated_retry=False,
                      local_wave_threshold=0)
    golden = SequentialOracle(load_web(web_root), cfg).run()
    res = CrawlEngine(web_root, tmp_path / "out", cfg).run()
    gd = golden["deadletter"]
    assert (gd["reason"] == "auth_denied").any()
    ed = _read_dir(Path(res["out_dir"]) / "deadletter")
    cols = ["url", "reason", "attempt", "wave"]
    pd.testing.assert_frame_equal(
        _norm(ed.sort_values(["wave", "url"]), cols),
        _norm(gd.sort_values(["wave", "url"]), cols))
    eo = _norm(_read_order(Path(res["out_dir"])), ORDER_COLS)
    go = _norm(golden["order"], ORDER_COLS)
    pd.testing.assert_frame_equal(eo, go)


def test_third_credential_class_order_parity(web_root, ray_session,
                                             tmp_path):
    """Trait-set generality (`tokenFactory.js:41-70`): ``cred`` is an
    OPEN class — a third class ('partner') with its own auth rule and
    politeness window must reproduce the oracle exactly, alongside the
    elevated class, in one run."""
    cfg = CrawlConfig(
        protected_url_regex=PROT,
        elevated_max_per_window=2,
        cred_rules=((r"/p/(?:5|9)$", "partner"),),
        cred_windows=(("partner", 1),),
        local_wave_threshold=0)
    golden = SequentialOracle(load_web(web_root), cfg).run()
    res = CrawlEngine(web_root, tmp_path / "out", cfg).run()
    order = golden["order"]
    part = order[order["url"].str.contains(r"/p/(?:5|9)$")]
    denied = part[part["outcome"] == "auth_denied"]
    assert len(denied), "no partner-protected url was denied"
    ok = part[part["outcome"].isin(["fetched", "not_modified"])]
    assert set(denied["url"]) & set(ok["url"]), \
        "no partner url succeeded on the class retry"
    pd.testing.assert_frame_equal(
        _norm(_read_order(Path(res["out_dir"])), ORDER_COLS),
        _norm(order, ORDER_COLS))


def test_first_matching_rule_defines_required_class(web_root):
    """A url matching several rules requires the FIRST rule's class: the
    retry carries that class and passes, even though a later rule names
    a different class (oracle-level pin; engine shares the rule list via
    CrawlConfig.effective_cred_rules)."""
    cfg = CrawlConfig(
        cred_rules=((PROT, "elevated"), (PROT, "partner")),
        elevated_max_per_window=2)
    assert cfg.effective_cred_rules() == ((PROT, "elevated"),
                                          (PROT, "partner"))
    golden = SequentialOracle(load_web(web_root), cfg).run()
    order = golden["order"]
    prot = order[order["url"].str.contains(PROT)]
    assert (prot["outcome"] == "auth_denied").any()
    # one retry under the first rule's class then succeeds — were the
    # second rule consulted after the retry, the row would deny forever
    ok = prot[prot["outcome"].isin(["fetched", "not_modified"])]
    assert len(ok)
    assert not (prot.groupby("url")["outcome"]
                .apply(lambda s: (s == "auth_denied").sum()) > 1).any()
