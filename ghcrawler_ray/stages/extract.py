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


def _html_arrow(html_col) -> pa.ChunkedArray | pa.Array:
    """binary/string html column → Arrow utf8 (zero-copy validate-cast
    for binary; the round-1 per-row ``bytes.decode`` map is gone)."""
    if isinstance(html_col, (pa.Array, pa.ChunkedArray)):
        arr = html_col
    else:
        arr = pa.Array.from_pandas(pd.Series(html_col))
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string())
    return arr


def extract_text(html: bytes | str) -> str:
    """Scalar form of the byte-identical text extraction."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8")
    m = TEXT_RE.search(html)
    return m.group(1) if m else ""


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: add/replace ``text`` extracted from ``html``.

    Arrow in / Arrow out; the regex runs in polars' extract kernel
    (measured faster than both pandas-re and pc.extract_regex on this
    pattern), no per-row decode."""
    import polars as pl
    html = pl.from_arrow(_html_arrow(batch.column("html")))
    text = html.str.extract(r"<p>(.*?)</p>", 1).fill_null("")
    out = batch
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    return out.append_column("text", text.to_arrow().cast(pa.string()))


def extract_links_df(urls: pd.Series, html_col) -> pd.DataFrame:
    """Explode out-links: one row per (src_url, dst_url, link_index).

    Fully vectorized: polars ``str.extract_all`` finds every href in C
    (the round-1 pandas ``findall`` + Python list concat cost ~13 µs/
    page), the list explodes together with its per-page index range, and
    the quote-delimited prefix/suffix are sliced off columnar.

    ``rel`` is the typed link relation (`lib/request.js:119-140`
    linkResource/linkCollection/linkRelation analogues) classified from
    the URL relationship — see visitor_map.classify_rels.
    """
    import polars as pl

    from ..visitor_map import classify_rels
    h = pl.from_arrow(_html_arrow(html_col))
    m = h.str.extract_all(r'<a href="[^"]+"')
    d = (pl.DataFrame({
            "src_url": pl.Series(list(urls), dtype=pl.String),
            "dst": m})
         .with_columns(pl.int_ranges(0, m.list.len()).alias("link_index"))
         .explode(["dst", "link_index"], empty_as_null=True)
         .filter(pl.col("dst").is_not_null())
         .with_columns(pl.col("dst").str.slice(9)
                       .str.strip_chars_end('"').alias("dst_url")))
    out = d.select(["src_url", "dst_url", "link_index"]).to_pandas()
    out["link_index"] = out["link_index"].astype(np.int64)
    out["src_url"] = out["src_url"].astype(str)
    out["dst_url"] = out["dst_url"].astype(str)
    out["rel"] = pd.Series(classify_rels(out["src_url"], out["dst_url"]),
                           dtype=str)
    return out
