"""URL scalar-function units (reference: trim `lib/request.js:260-262`,
malformed guard `lib/crawler.js:328-332`, org-from-path parse
`lib/crawler.js:587-589`)."""

import numpy as np
import pandas as pd

from ghcrawler_ray.urls import (content_etag, hash64, hash64_array,
                                is_malformed_series, normalize_series,
                                split_host_path)


def test_normalize_rules():
    s = pd.Series([
        "  http://Host0.Example/p/1#frag  ",   # strip + lower host + drop frag
        "HTTPS://A.example:443/x",             # scheme lower + default port
        "http://a.example:80",                 # default port + empty path
        "http://a.example:8080/x",             # non-default port kept
        "http://a.example/x?",                 # trailing empty query
        "http://a.example/P/Q?b=C",            # path/query case preserved
    ])
    out = normalize_series(s).tolist()
    assert out == [
        "http://host0.example/p/1",
        "https://a.example/x",
        "http://a.example/",
        "http://a.example:8080/x",
        "http://a.example/x",
        "http://a.example/P/Q?b=C",
    ]


def test_malformed():
    s = normalize_series(pd.Series(
        ["http://ok.example/", "not a url", "ftp://x/", "", "https://ok.example/a"]))
    assert is_malformed_series(s).tolist() == [False, True, True, True, False]


def test_split_host_path():
    host, path = split_host_path(pd.Series(
        ["http://h.example/a/b?c=1", "http://h.example", "nonsense"]))
    assert host.tolist() == ["h.example", "h.example", ""]
    assert path.tolist() == ["/a/b?c=1", "/", "/"]


def test_hash64_deterministic_and_vectorized():
    urls = [f"http://h{i}.example/p/{i}" for i in range(100)]
    arr = hash64_array(np.array(urls, dtype=object))
    assert arr.dtype == np.int64
    assert (arr >= 0).all()  # 63-bit, shard/bucket mod is safe
    assert [hash64(u) for u in urls] == arr.tolist()
    assert len(set(arr.tolist())) == 100


def test_content_etag_is_md5_hex():
    # md5 so the DuckDB oracle can recompute it with md5()
    assert content_etag(b"abc") == "900150983cd24fb0d6963f7d28e17f72"
