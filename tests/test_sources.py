"""JSONL / CSV source-format adapters (ghcrawler_ray/sources.py):
round-trip fidelity to the canonical parquet tables and seed-frame
defaults (`routes/requests.js:64-80` buildRequestFromSpec analogue)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from ghcrawler_ray.frontier import seeds_to_frontier
from ghcrawler_ray.sources import (read_docs_jsonl, read_seeds_csv,
                                   write_docs_jsonl)

SF_DIR = "/root/testdata/sf0.001"


def test_docs_jsonl_roundtrip(ray_session, tmp_path):
    orig = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas().head(50)
    out = tmp_path / "jsonl"
    write_docs_jsonl(ray.data.from_pandas(orig), str(out))
    back = (read_docs_jsonl(str(out)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[sorted(orig.columns)],
                                  orig[sorted(orig.columns)],
                                  check_dtype=False)


def test_seeds_csv_defaults_and_frontier(ray_session, tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_text("url\nhttp://host0.example/p/0\nhttp://host1.example/p/1\n")
    seeds = read_seeds_csv(str(p))
    assert seeds["priority"].tolist() == ["normal", "normal"]
    assert seeds["policy"].tolist() == ["default", "default"]
    assert seeds["seq"].tolist() == [0, 1]
    fr = seeds_to_frontier(seeds)
    assert len(fr) == 2 and (fr["depth"] == 0).all()

    # explicit columns pass through
    p2 = tmp_path / "seeds2.csv"
    p2.write_text("url,priority,policy,seq\n"
                  "http://a.example/,events,default,7\n")
    s2 = read_seeds_csv(str(p2))
    assert s2.iloc[0]["priority"] == "events" and s2.iloc[0]["seq"] == 7


def test_sitemap_roundtrip(ray_session):
    import ray.data
    from ghcrawler_ray.sources import parse_sitemaps, sitemap_xml
    pages = ray.data.from_pandas(pd.DataFrame({"url": [
        "http://a.example/p/2", "http://a.example/p/1",
        "http://b.example/x", "http://b.example/y?page=2"]}))
    sm = sitemap_xml(pages).to_pandas()
    assert set(sm["host"]) == {"a.example", "b.example"}
    # urls serialized in lexicographic order inside each document
    a_xml = sm[sm.host == "a.example"]["xml"].iloc[0]
    assert a_xml.index("/p/1<") < a_xml.index("/p/2<")
    out = parse_sitemaps(sitemap_xml(pages)).to_pandas()
    assert sorted(out["url"]) == sorted(
        ["http://a.example/p/2", "http://a.example/p/1",
         "http://b.example/x", "http://b.example/y?page=2"])
    assert out["lastmod"].str.match(r"2025-01-\d\d").all()
    assert out["priority_x10"].between(0, 9).all()


def test_warc_file_roundtrip(ray_session, tmp_path):
    """pages → .warc shard files → read_warc → byte-identical (url,
    html) set, with the index fields parseable and self-consistent."""
    from ghcrawler_ray.sources import read_warc, write_warc
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(0.0001)
    files = sorted(str(p) for p in (root / "pages").glob("bucket=*/part-0.parquet"))
    pages = ray.data.read_parquet(files)
    orig = pq.read_table(files).to_pandas()[["url", "html"]]

    out = tmp_path / "warc"
    n = write_warc(pages, str(out))
    assert n == len(orig)
    shards = sorted(str(p) for p in out.glob("shard-*.warc"))
    assert shards, "no shard files written"

    back = read_warc(shards).to_pandas()
    assert len(back) == len(orig)
    merged = orig.merge(back, on="url", suffixes=("_a", "_b"))
    assert len(merged) == len(orig)
    assert all(bytes(a) == bytes(b) for a, b in
               zip(merged["html_a"], merged["html_b"]))
    # index fields: payload_len = http head + html bytes
    hl = back["html"].map(len)
    assert (back["payload_len"] == 77 + hl.astype(str).map(len) + hl).all()
    import hashlib
    assert (back["record_id"] == back["url"].map(
        lambda u: hashlib.md5(u.encode()).hexdigest())).all()


def test_warc_to_web_root_crawl_parity(ray_session, tmp_path):
    """End-to-end ingestion: pages → WARC shards → warc_to_web_root →
    CrawlEngine over the rebuilt root reproduces the original crawl's
    order log and seen set exactly (same seeds/robots/budgets; text is
    re-extracted from html, which is byte-identical)."""
    from ghcrawler_ray.config import CrawlConfig
    from ghcrawler_ray.pipelines.wave import CrawlEngine
    from ghcrawler_ray.sources import warc_to_web_root, write_warc
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(0.0001)
    files = sorted(str(p) for p in
                   (root / "pages").glob("bucket=*/part-0.parquet"))
    warc_dir = tmp_path / "warc"
    write_warc(ray.data.read_parquet(files), str(warc_dir))
    shards = sorted(str(p) for p in warc_dir.glob("shard-*.warc"))

    robots = pq.read_table(str(root / "robots.parquet")).to_pandas()
    seeds = pq.read_table(str(root / "seeds.parquet")).to_pandas()
    new_root, n_pages = warc_to_web_root(
        shards, str(tmp_path / "webroot"), robots=robots, seeds=seeds)
    n_orig = sum(len(pq.read_table(f)) for f in files)
    assert n_pages == n_orig

    cfg = CrawlConfig(max_waves=4)

    def order_of(out_dir):
        fs = sorted((out_dir / "order").glob("wave=*.parquet"),
                    key=lambda p: int(p.stem.split("=")[1]))
        df = pq.read_table([str(f) for f in fs]).to_pandas()
        return df.sort_values(["wave", "seq_in_wave", "url"],
                              kind="stable").reset_index(drop=True)

    CrawlEngine(root, tmp_path / "out_a", cfg).run()
    CrawlEngine(new_root, tmp_path / "out_b", cfg).run()
    a, b = order_of(tmp_path / "out_a"), order_of(tmp_path / "out_b")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    sa = pq.read_table(str(tmp_path / "out_a" / "seen.parquet")) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    sb = pq.read_table(str(tmp_path / "out_b" / "seen.parquet")) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb, check_dtype=False)


def test_seeds_from_sitemaps(ray_session):
    """Sitemap → seeds: deterministic order, priority mapped from the
    sitemap's own priority digit, frontier-compatible frame."""
    from ghcrawler_ray.frontier import seeds_to_frontier
    from ghcrawler_ray.sources import (seeds_from_sitemaps, sitemap_xml)
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(0.0001)
    files = sorted(str(p) for p in
                   (root / "pages").glob("bucket=*/part-0.parquet"))
    pages = ray.data.read_parquet(files)
    seeds = seeds_from_sitemaps(sitemap_xml(pages))
    n_pages = sum(len(pq.read_table(f)) for f in files)
    assert len(seeds) == n_pages
    assert set(seeds["priority"]) <= {"soon", "normal"}
    assert seeds["seq"].tolist() == list(range(len(seeds)))
    fr = seeds_to_frontier(seeds)
    assert len(fr) == len(seeds) and (fr["depth"] == 0).all()


def test_robots_txt_roundtrip(ray_session):
    """Structured robots table → REP text → parse → identical table,
    and the parsed table drives the same crawl (robots loading is by
    value)."""
    from ghcrawler_ray.sources import parse_robots_txt, robots_txt
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(0.0001)
    robots = pq.read_table(str(root / "robots.parquet")).to_pandas()
    txt = robots_txt(robots)
    assert (txt["body"].str.startswith("User-agent: *\n")).all()
    back = parse_robots_txt(txt)
    orig = robots.sort_values("host").reset_index(drop=True)
    orig["disallow_prefixes"] = orig["disallow_prefixes"] \
        .map(lambda x: sorted(list(x)))
    back2 = back.copy()
    back2["disallow_prefixes"] = back2["disallow_prefixes"] \
        .map(lambda x: sorted(list(x)))
    pd.testing.assert_frame_equal(
        back2.reset_index(drop=True)[orig.columns], orig,
        check_dtype=False)
    # comments / unknown directives / foreign groups are ignored
    messy = pd.DataFrame({"host": ["m.example"], "body": ["""
# banner comment
User-agent: gptbot
Disallow: /everything
User-agent: *
Disallow: /private  # trailing comment
Crawl-delay: 1.5
Sitemap: http://m.example/sitemap.xml
"""]})
    p = parse_robots_txt(messy)
    assert p.iloc[0]["disallow_prefixes"] == ["/private"]
    assert p.iloc[0]["crawl_delay_ms"] == 1500
