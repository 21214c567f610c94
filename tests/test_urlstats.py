"""Unit tests for the URL-space analyses (ghcrawler_ray/ops/urlstats.py):
trap-pattern collapsing/thresholding and anchor-text aggregation on a
hand-built page set. The value-vs-DuckDB gate runs via __ray_entry__'s
crawl_trap_patterns / crawl_anchor_text oracle entries.
"""

import pandas as pd
import pytest
import ray.data

from ghcrawler_ray.ops.urlstats import anchor_text_agg, trap_patterns


@pytest.mark.usefixtures("ray_session")
def test_trap_patterns_collapse_and_threshold():
    urls = (
        [f"http://cal.example/day/2024/{i}?sid=99{i}" for i in range(5)]
        + ["http://a.example/about", "http://a.example/contact"]
        + ["http://a.example/p/7#frag3", "http://a.example/p/12#frag9"]
    )
    ds = ray.data.from_pandas(pd.DataFrame(
        {"url": urls, "html": [""] * len(urls)}))
    out = trap_patterns(ds, threshold=5).to_pandas() \
        .set_index(["host", "path_pattern"]).sort_index()
    # digit runs in path AND query collapse; fragment is stripped
    assert out.loc[("cal.example", "/day/N/N?sid=N"), "n_urls"] == 5
    assert bool(out.loc[("cal.example", "/day/N/N?sid=N"), "is_trap"])
    assert out.loc[("a.example", "/p/N"), "n_urls"] == 2
    assert not bool(out.loc[("a.example", "/p/N"), "is_trap"])
    assert out.loc[("a.example", "/about"), "n_urls"] == 1
    assert len(out) == 4


@pytest.mark.usefixtures("ray_session")
def test_anchor_text_agg_counts_and_tiebreak():
    pages = pd.DataFrame({
        "url": ["http://s.example/1", "http://s.example/2",
                "http://s.example/3"],
        "html": [
            '<a href="http://t.example/x">beta</a>'
            '<a href="http://t.example/x">alpha</a>',
            '<a href="http://t.example/x">alpha</a>'
            '<a href="http://t.example/y">solo</a>',
            '<a href="http://t.example/x">beta</a>',
        ],
    })
    pages["html"] = pages["html"].str.encode("utf-8")
    out = anchor_text_agg(ray.data.from_pandas(pages)).to_pandas() \
        .set_index("dst_url")
    x = out.loc["http://t.example/x"]
    assert int(x["n_refs"]) == 4 and int(x["n_anchors"]) == 2
    # alpha and beta tie at 2 refs each → lexicographically smallest wins
    assert x["top_anchor"] == "alpha"
    y = out.loc["http://t.example/y"]
    assert int(y["n_refs"]) == 1 and y["top_anchor"] == "solo"


def test_robots_eval_longest_match_rfc9309():
    import ray.data
    from ghcrawler_ray.ops.urlstats import robots_eval
    rules = pd.DataFrame({
        "host": ["h.example"] * 3 + ["t.example"] * 2,
        "pattern": ["/p/13", "/p/130", "/deny/",
                    "/x/", "/x/"],          # t.example: exact tie
        "is_allow": [0, 1, 0, 0, 1]})
    pages = ray.data.from_pandas(pd.DataFrame({"url": [
        "http://h.example/p/131",     # denied: /p/13 matches, /p/130 no
        "http://h.example/p/1309",    # allowed: /p/130 (len 6) > /p/13
        "http://h.example/deny/a",    # denied
        "http://h.example/free",      # no rule -> allowed, match_len -1
        "http://t.example/x/1",       # tie -> allow wins (RFC 9309)
        "http://other.example/p/13",  # host without rules -> allowed
    ]}))
    out = robots_eval(pages, rules).to_pandas().set_index("url")
    v = out["allowed"]
    assert not v["http://h.example/p/131"]
    assert v["http://h.example/p/1309"]
    assert not v["http://h.example/deny/a"]
    assert v["http://h.example/free"]
    assert out.loc["http://h.example/free", "match_len"] == -1
    assert v["http://t.example/x/1"]
    assert v["http://other.example/p/13"]


def test_drain_plan_ceil_and_budget_floor():
    import ray.data
    from ghcrawler_ray.ops.urlstats import drain_plan
    pages = ray.data.from_pandas(pd.DataFrame({"url":
        [f"http://a.example/p/{i}" for i in range(7)]
        + [f"http://b.example/p/{i}" for i in range(3)]}))
    robots = pd.DataFrame({"host": ["a.example"], "max_per_window": [2]})
    out = drain_plan(pages, robots).to_pandas().set_index("host")
    assert out.loc["a.example", "waves_needed"] == 4      # ceil(7/2)
    # host with no robots row -> budget floor of 1
    assert out.loc["b.example", "per_wave_budget"] == 1
    assert out.loc["b.example", "waves_needed"] == 3


def test_host_content_dup_profile():
    import ray.data
    from ghcrawler_ray.ops.urlstats import host_content_dup
    pages = ray.data.from_pandas(pd.DataFrame({
        "url": ["http://m.example/1", "http://m.example/2",
                "http://m.example/3", "http://u.example/1"],
        "html": [b"<same/>", b"<same/>", b"<same/>", b"<unique/>"]}))
    out = host_content_dup(pages).to_pandas().set_index("host")
    assert out.loc["m.example", "n_pages"] == 3
    assert out.loc["m.example", "n_distinct"] == 1
    assert out.loc["m.example", "dup_frac_fp"] == 666666  # (3-1)e6//3
    assert out.loc["u.example", "dup_frac_fp"] == 0


def test_url_prefix_compression_exact():
    import ray.data
    from ghcrawler_ray.ops.urlstats import FC_FP, url_prefix_compression
    urls = ["http://h.example/p/1", "http://h.example/p/10",
            "http://h.example/p/2", "http://h.example/q",
            "http://solo.example/x"]
    out = url_prefix_compression(
        ray.data.from_pandas(pd.DataFrame({"url": urls}))) \
        .to_pandas().set_index("host")
    h = out.loc["h.example"]
    # sorted: /p/1, /p/10, /p/2, /q -> shared 0, 20, 19, 17
    assert h.n_urls == 4
    assert h.raw_bytes == 20 + 21 + 20 + 18
    assert h.coded_bytes == h.raw_bytes - (20 + 19 + 17) + 2 * 4
    assert h.savings_fp == (h.raw_bytes - h.coded_bytes) * FC_FP \
        // h.raw_bytes
    # single-url host: negative "savings" clamp to 0
    assert out.loc["solo.example", "savings_fp"] == 0


def test_host_closeness_harmonic_exact():
    import ray.data
    from ghcrawler_ray.ops.graph import HC_FP, host_closeness
    # path a-b-c plus a disconnected pair d-e
    links = ray.data.from_pandas(pd.DataFrame({
        "src_url": ["http://a.x/1", "http://b.x/1", "http://d.x/1"],
        "dst_url": ["http://b.x/2", "http://c.x/2", "http://e.x/2"]}))
    out = host_closeness(links).set_index("host")
    assert out.loc["a.x", "n_reachable"] == 2
    assert out.loc["a.x", "harmonic_fp"] == HC_FP + HC_FP // 2
    assert out.loc["b.x", "harmonic_fp"] == 2 * HC_FP   # two at dist 1
    assert out.loc["d.x", "n_reachable"] == 1           # only its pair
    assert out.loc["d.x", "harmonic_fp"] == HC_FP


def test_waterfill_level_remainder_and_saturation(ray_session):
    from ghcrawler_ray.ops.urlstats import waterfill_allocation

    def pages_of(counts):
        rows = [f"http://{h}.ex/p{i}" for h, c in counts.items()
                for i in range(c)]
        return ray.data.from_pandas(pd.DataFrame({"url": rows}))

    # binding budget: q = (a:5, b:10, c:20), B = 9 → level 3 (k=1:
    # 9//3=3), base (3,3,3), rem 0
    out = waterfill_allocation(pages_of({"a": 5, "b": 10, "c": 20}),
                               budget=9).set_index("host")
    assert out["allocated"].tolist() == [3, 3, 3]
    # remainder: B = 11 → level 3, rem 2 → +1 to a.ex and b.ex
    out = waterfill_allocation(pages_of({"a": 5, "b": 10, "c": 20}),
                               budget=11).set_index("host")
    assert out.loc["a.ex", "allocated"] == 4
    assert out.loc["b.ex", "allocated"] == 4
    assert out.loc["c.ex", "allocated"] == 3
    # small queue saturates below the level: q = (a:1, b:10), B = 8
    # → a gets its whole queue, b gets the rest
    out = waterfill_allocation(pages_of({"a": 1, "b": 10}),
                               budget=8).set_index("host")
    assert out.loc["a.ex", "allocated"] == 1
    assert out.loc["b.ex", "allocated"] == 7
    # saturation: B ≥ Σq → everyone gets their full queue, no +1s
    out = waterfill_allocation(pages_of({"a": 5, "b": 10}),
                               budget=100).set_index("host")
    assert out["allocated"].tolist() == [5, 10]
    assert int(out["allocated"].sum()) == 15


def test_dust_rules_support_is_pair_count(ray_session):
    """support(host, a, b) = n_a·n_b per content cluster, summed across
    clusters — pinned on a hand-built corpus."""
    import pandas as pd
    import ray.data

    from ghcrawler_ray.ops.urlstats import dust_rules

    h = b"<html>same</html>"
    rows = [("http://h.example/p/1", h), ("http://h.example/p/2", h),
            ("http://h.example/dup/1", h), ("http://h.example/dup/2", h),
            ("http://h.example/alt/1", h),
            ("http://h.example/p/9", b"<html>other</html>"),
            ("http://other.example/p/1", h)]   # other host: no pair
    df = pd.DataFrame(rows, columns=["url", "html"])
    out = dust_rules(ray.data.from_pandas(df)).to_pandas() \
        .sort_values(["host", "seg_from", "seg_to"]).reset_index(drop=True)
    got = {(r.host, r.seg_from, r.seg_to): r.support
           for r in out.itertuples()}
    assert got == {("h.example", "/alt", "/dup"): 2,
                   ("h.example", "/alt", "/p"): 2,
                   ("h.example", "/dup", "/p"): 4}


def test_canonical_map_losers_only(ray_session):
    import pandas as pd
    import ray.data

    from ghcrawler_ray.ops.urlstats import canonical_url_map

    h = b"<html>x</html>"
    df = pd.DataFrame({
        "url": ["http://a/2", "http://a/1", "http://a/3", "http://b/1"],
        "html": [h, h, h, b"<html>y</html>"]})
    out = canonical_url_map(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["url"].tolist() == ["http://a/2", "http://a/3"]
    assert (out["canonical_url"] == "http://a/1").all()
    assert (out["group_size"] == 3).all()
