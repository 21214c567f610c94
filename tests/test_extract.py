"""Extractor golden tests (reference: per-type link/queue golden corpus,
`test/unit/gitHubProcessorTests.js`; pagination `githubProcessor.js:58-79`).
Locks the byte-identical text contract (BASELINE.json input_hint)."""

import pandas as pd
import pyarrow as pa

from ghcrawler_ray.stages.extract import (extract_links_df, extract_text,
                                          extract_text_batch)
from ghcrawler_ray.testgen import generate_web


def _html(text, hrefs):
    links = "".join(f'<li><a href="{h}">l{i}</a></li>' for i, h in enumerate(hrefs))
    return (f"<html><head><title>T</title></head><body><h1>T</h1>"
            f"<p>{text}</p><ul>{links}</ul></body></html>").encode()


def test_extract_text_scalar_cases():
    assert extract_text(_html("hello world", [])) == "hello world"
    assert extract_text(b"<html><body>no para</body></html>") == ""
    assert extract_text("<p>str input</p>") == "str input"


def test_extract_links_golden():
    urls = pd.Series(["http://a.example/1", "http://a.example/2"])
    html = [
        _html("t1", ["http://b.example/x", "http://a.example/1?page=2"]),
        _html("t2", []),                       # leaf page → no links
    ]
    links = extract_links_df(urls, html)
    assert links[["src_url", "dst_url", "link_index"]].values.tolist() == [
        ["http://a.example/1", "http://b.example/x", 0],
        ["http://a.example/1", "http://a.example/1?page=2", 1],
    ]
    # typed link relations (`lib/request.js:119-140` analogue): cross-host
    # → relation, same-host ?page= → siblings
    assert links["rel"].tolist() == ["relation", "siblings"]


def test_extract_text_batch_arrow_roundtrip():
    t = pa.table({
        "url": ["u1", "u2"],
        "html": [_html("alpha", ["http://x.example/"]), _html("beta", [])],
        "text": ["stale", "stale"],
    })
    out = extract_text_batch(t)
    assert out.column("text").to_pylist() == ["alpha", "beta"]
    assert out.column("url").to_pylist() == ["u1", "u2"]


def test_generated_web_text_is_byte_identical():
    """The synthesized pages table satisfies text == extract_text(html) on
    every row — the per-row invariant the whole crawl preserves."""
    web = generate_web(0.0001)
    pages = web["pages"]
    ext = [extract_text(h) for h in pages["html"]]
    assert ext == pages["text"].tolist()


def test_generated_web_has_required_features():
    web = generate_web(0.0001)
    pages, seeds, robots = web["pages"], web["seeds"], web["robots"]
    assert set(pages.columns) >= {"url", "warc_ts", "html", "text", "lang", "etag"}
    # duplicate-content aliases exist (304/etag path)
    assert pages["etag"].duplicated().any()
    # deny-regex targets and hub pagination pages exist
    assert pages["url"].str.contains("/handoff/").any()
    assert pages["url"].str.contains(r"\?page=").any()
    # seeds cover the probe cases
    assert (seeds["url"] == "not a url").any()
    assert seeds["url"].str.contains("outside.org").any()
    assert robots["disallow_prefixes"].map(len).gt(0).any()


def test_meta_probe_equals_string_lookup():
    """The compact hash-indexed pages_meta probe (engine_stages._meta_probe,
    ~40 B/url — the sf10 memory-ceiling fix) must answer exactly like the
    string-keyed lookup it replaced, including misses and a missing file."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ghcrawler_ray.stages.engine_stages import _meta_probe
    from ghcrawler_ray.testgen import ensure_testdata
    from ghcrawler_ray.urls import hash64_array

    root = ensure_testdata(0.001)
    path = str(root / "pages_meta" / "bucket=5" / "part-0.parquet")
    t = pq.read_table(path).to_pandas()
    ref = pd.Series(t["etag"].to_numpy(dtype=object),
                    index=t["url"].to_numpy(dtype=object))
    urls = list(t["url"].head(64)) + ["http://missing.example/x",
                                      "http://h0.example/p/999999999"]
    want = ref.reindex(urls).to_numpy()
    got = _meta_probe(path, hash64_array(pd.Series(urls)).astype(np.int64))
    assert all((a == b) or (pd.isna(a) and b is None)
               for a, b in zip(want, got))
    miss = _meta_probe(str(root / "pages_meta" / "bucket=999" /
                           "part-0.parquet"),
                       hash64_array(pd.Series(urls)).astype(np.int64))
    assert all(v is None for v in miss)
    assert all(v is None for v in
               _meta_probe(path, np.empty(0, dtype=np.int64)))
