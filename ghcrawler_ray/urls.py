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


def normalize_series(urls: pd.Series) -> pd.Series:
    """Canonicalize a Series of URL strings (vectorized).

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
    s = urls.astype("string").fillna("").str.strip()
    # split once: scheme, host[:port], rest
    parts = s.str.extract(r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<hostport>[^/?#]*)(?P<rest>.*)$", expand=True)
    ok = parts["scheme"].notna()
    scheme = parts["scheme"].str.lower()
    hostport = parts["hostport"].str.lower()
    rest = parts["rest"].fillna("")
    # drop fragment
    rest = rest.str.replace(r"#.*$", "", regex=True)
    # drop default ports
    hostport = hostport.mask(scheme.eq("http"), hostport.str.replace(r":80$", "", regex=True))
    hostport = hostport.mask(scheme.eq("https"), hostport.str.replace(r":443$", "", regex=True))
    # trailing '?' and empty path
    rest = rest.str.replace(r"\?$", "", regex=True)
    rest = rest.mask(rest.eq(""), "/")
    out = scheme + "://" + hostport + rest
    return out.where(ok, s).astype(str)


def is_malformed_series(urls: pd.Series) -> pd.Series:
    """True where the (already normalized) url is not a valid http(s) URL."""
    s = urls.astype("string").fillna("")
    return ~s.str.match(_VALID_RE.pattern, na=False)


def split_host_path(urls: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Return (host, path+query) for valid urls; '' for malformed."""
    parts = urls.astype("string").fillna("").str.extract(
        r"^https?://([^/?#]+)([^#]*)", expand=True
    )
    host = parts[0].fillna("").astype(str)
    path = parts[1].fillna("").astype(str)
    path = pd.Series(np.where(path == "", "/", path), index=urls.index, dtype=str)
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
