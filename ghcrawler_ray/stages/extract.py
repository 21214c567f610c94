"""Extract stage: html → text (byte-identical contract) + out-links.

Reference parity: this is the analogue of the per-type processors
(`providers/fetcher/githubProcessor.js:124-434` entity handlers and
`:548-833` event handlers) — the stage that turns a fetched document into
(a) a normalized stored payload and (b) the set of child links to enqueue
(`lib/request.js:146-165` → `lib/crawler.js:559-576`).

Contract (BASELINE.json input_hint): extracted ``text`` must be
**byte-identical** per url to the pages table's ``text`` column. The
extractor is therefore a pure deterministic function of ``html`` and the
synthesizer (testgen.py) writes ``text = extract_text(html)`` by
construction; tests assert the round-trip on every row.

HTML shape produced by testgen (single-line text, one <p> block):
``<html><head><title>T</title></head><body><h1>T</h1><p>TEXT</p>
<ul><li><a href="U">anchor</a></li>...</ul></body></html>``

DuckDB-oracle equivalents (used by __ray_entry__.oracle_sql):
- text:  ``regexp_extract(decode(html), '<p>(.*?)</p>', 1)``
- links: ``unnest(regexp_extract_all(decode(html), '<a href="([^"]+)"', 1))``
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TEXT_RE = re.compile(r"<p>(.*?)</p>")
HREF_RE = re.compile(r'<a href="([^"]+)"')

#: SQL fragments kept next to the Python they must mirror.
TEXT_SQL = "regexp_extract(decode(html), '<p>(.*?)</p>', 1)"
HREF_SQL = "regexp_extract_all(decode(html), '<a href=\"([^\"]+)\"', 1)"


def _html_strings(html_col) -> pd.Series:
    """binary/string html column → pandas string Series (utf-8)."""
    s = pd.Series(html_col)
    if len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
        s = s.map(lambda b: b.decode("utf-8"))
    return s.astype(str)


def extract_text(html: bytes | str) -> str:
    """Scalar form of the byte-identical text extraction."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8")
    m = TEXT_RE.search(html)
    return m.group(1) if m else ""


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: add/replace ``text`` extracted from ``html``.

    Vectorized via pandas C-regex; Arrow in / Arrow out.
    """
    html = _html_strings(batch.column("html").to_pandas())
    text = html.str.extract(TEXT_RE, expand=False).fillna("")
    out = batch
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    return out.append_column("text", pa.array(text.to_numpy(dtype=object), type=pa.string()))


def extract_links_df(urls: pd.Series, html_col) -> pd.DataFrame:
    """Explode out-links: one row per (src_url, dst_url, link_index).

    ``rel`` is the typed link relation (`lib/request.js:119-140`
    linkResource/linkCollection/linkRelation analogues) classified from
    the URL relationship — see visitor_map.classify_rels.
    """
    from ..visitor_map import classify_rels
    html = _html_strings(html_col)
    hrefs = html.str.findall(HREF_RE)
    n = hrefs.str.len().to_numpy(dtype=np.int64)
    src = np.repeat(urls.to_numpy(dtype=object), n)
    dst = np.concatenate([np.array(h, dtype=object) if h else np.empty(0, dtype=object)
                          for h in hrefs]) if n.sum() else np.empty(0, dtype=object)
    idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n]) if n.sum() else np.empty(0, dtype=np.int64)
    out = pd.DataFrame({
        "src_url": pd.Series(src, dtype=str),
        "dst_url": pd.Series(dst, dtype=str),
        "link_index": idx,
    })
    out["rel"] = pd.Series(classify_rels(out["src_url"], out["dst_url"]),
                           dtype=str)
    return out
