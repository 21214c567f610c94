"""URL scalar functions, vectorized over pandas Series / numpy arrays.

Reference parity (file:line into /root/reference):
- trim + canonicalize: `lib/request.js:260-262` (url trim); our canonical
  normalizer additionally lowercases scheme+host, strips fragments, default
  ports and trailing '?', and roots empty paths — the standard web-crawler
  canonicalization the reference delegates to GitHub API URL discipline.
- host/org parse from path: `lib/crawler.js:587-589` → ``split_host_path``.
- malformed guard (no type/url → deadletter): `lib/crawler.js:328-332` →
  ``is_malformed`` (no http(s) scheme or empty host).

All functions are deterministic pure functions of their input strings; the
sequential oracle (pipelines/oracle.py) imports THESE SAME functions so
engine↔oracle parity on normalization holds by construction (the interesting
parity — ordering / seen-set / politeness — is computed independently).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_SCHEME_HOST_RE = re.compile(r"^(https?)://([^/?#]+)(.*)$", re.DOTALL)

#: matches a valid http(s) absolute URL with a non-empty host
_VALID_RE = re.compile(r"^https?://[^/?#:\s][^/?#\s]*")


def _utf8(urls: pd.Series) -> "pa.Array":
    import pyarrow as pa
    return pa.Array.from_pandas(urls.astype("string").fillna(""),
                                type=pa.string())


def normalize_series(urls: pd.Series) -> pd.Series:
    """Canonicalize a Series of URL strings — pyarrow.compute RE2 kernels
    (the round-1 pandas ``.str.extract`` path cost ~8.5 µs/row; this is
    the per-row kernel that runs on every frontier row every wave).

    Rules (each mirrored in the oracle-SQL for ``crawl_url_normalize``):
    1. strip surrounding whitespace;
    2. lowercase scheme and host (path/query case preserved);
    3. drop ``#fragment``;
    4. drop default port (``:80`` for http, ``:443`` for https);
    5. drop a trailing ``?`` (empty query);
    6. empty path → ``/``.
    Malformed inputs (no http(s) scheme/host) pass through stripped —
    callers route them via :func:`is_malformed_series`.
    """
    import pyarrow.compute as pc
    s = pc.utf8_trim_whitespace(_utf8(urls))
    ex = pc.extract_regex(
        s, r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
           r"(?P<hostport>[^/?#]*)(?P<rest>.*)$")
    ok = pc.is_valid(ex)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(ex, "hostport"))
    rest = pc.replace_substring_regex(pc.struct_field(ex, "rest"),
                                      "#.*$", "")
    hostport = pc.if_else(pc.equal(scheme, "http"),
                          pc.replace_substring_regex(hostport, ":80$", ""),
                          hostport)
    hostport = pc.if_else(pc.equal(scheme, "https"),
                          pc.replace_substring_regex(hostport, ":443$", ""),
                          hostport)
    # strip a trailing '?' only when it is the query DELIMITER itself
    # (rest contains no other '?'): '/a?' → '/a' but '/??' (query '?',
    # non-empty) is untouched, keeping normalization idempotent
    rest = pc.replace_substring_regex(rest, r"^([^?]*)\?$", r"\1")
    rest = pc.if_else(pc.equal(rest, ""), "/", rest)
    out = pc.binary_join_element_wise(
        scheme, pc.binary_join_element_wise(hostport, rest, ""), "://")
    final = pc.if_else(ok, out, s)
    return pd.Series(final.to_pandas().to_numpy(dtype=object),
                     index=urls.index, dtype=str)


def is_malformed_series(urls: pd.Series) -> pd.Series:
    """True where the (already normalized) url is not a valid http(s) URL."""
    import pyarrow.compute as pc
    ok = pc.match_substring_regex(_utf8(urls), _VALID_RE.pattern)
    return pd.Series(~ok.to_pandas().to_numpy(dtype=bool), index=urls.index)


def split_host_path(urls: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Return (host, path+query) for valid urls; '' for malformed."""
    import pyarrow.compute as pc
    ex = pc.extract_regex(_utf8(urls),
                          r"^https?://(?P<host>[^/?#]+)(?P<path>[^#]*)")
    host_a = pc.fill_null(pc.struct_field(ex, "host"), "")
    path_a = pc.fill_null(pc.struct_field(ex, "path"), "")
    path_a = pc.if_else(pc.equal(path_a, ""), "/", path_a)
    host = pd.Series(host_a.to_pandas().to_numpy(dtype=object),
                     index=urls.index, dtype=str)
    path = pd.Series(path_a.to_pandas().to_numpy(dtype=object),
                     index=urls.index, dtype=str)
    return host, path


#: polars' stable seeded string hash (xxh-family, deterministic across
#: processes for a fixed polars version — verified in-repo). Replaces the
#: round-1 per-row blake2b Python loop (~1 µs/url) with a vectorized C
#: kernel: this hash runs on EVERY frontier row and every discovered link,
#: so at the 10^10-URL design point it is the hottest scalar kernel.
_HASH_SEED = 0


def hash64_array(urls) -> np.ndarray:
    """Vectorized stable 63-bit string hash → non-negative int64 array.

    The single definition shared by engine, oracle and testgen (bucket
    layout), so they can never disagree. Accepts any iterable of str.
    """
    import polars as pl
    if isinstance(urls, pd.Series):
        s = pl.from_pandas(urls.astype(str))
    else:
        s = pl.Series("u", [str(u) for u in urls], dtype=pl.String)
    h = s.hash(seed=_HASH_SEED).to_numpy()
    return (h >> np.uint64(1)).astype(np.int64, copy=False)


def hash64(url: str) -> int:
    """Scalar form of :func:`hash64_array` (shard/bucket keys, link seq)."""
    return int(hash64_array([url])[0])


def content_etag(html: bytes) -> str:
    """Content hash used as the etag (reference: HTTP etag + 304 flow,
    `providers/fetcher/githubFetcher.js:26-84`). md5 hex so the DuckDB
    oracle can recompute it with ``md5()``."""
    return hashlib.md5(html).hexdigest()


def content_etag_array(htmls) -> np.ndarray:
    md5 = hashlib.md5
    return np.fromiter((md5(h).hexdigest() for h in htmls), dtype=object, count=len(htmls))
