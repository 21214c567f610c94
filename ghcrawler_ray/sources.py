"""Alternate source / sink formats.

The reference's providers speak JSON everywhere — queue messages are
JSON-serialized requests (`providers/queuing/amqp10Queue.js:125-126`),
doc stores hold JSON blobs (`providers/storage/storageDocStore.js:
33-58`), seeds arrive as JSON request specs (`routes/requests.js:
55-80`). Parquet is this engine's native layout; these adapters let a
user hand over existing JSONL corpora / CSV seed lists and export
results back without a separate conversion job.

All readers return plain ``ray.data.Dataset``s with the engine's
canonical column types, so every downstream op works unchanged; all
writers stream (one file per block — never a driver-side collect).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

#: canonical documents-table dtypes (TESTDATA.md contract)
_DOC_CAST = {"doc_id": np.int64, "n_chars": np.int64}


def read_docs_jsonl(path: str) -> ray.data.Dataset:
    """JSONL → documents Dataset with canonical dtypes (doc_id/n_chars
    int64; text/lang/source strings)."""
    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c, t in _DOC_CAST.items():
            if c in df.columns:
                df[c] = df[c].astype(t)
        for c in ("text", "lang", "source"):
            if c in df.columns:
                df[c] = df[c].astype(str)
        return df

    return ray.data.read_json(path).map_batches(cast, batch_format="pandas")


def write_docs_jsonl(docs: ray.data.Dataset, out_dir: str) -> None:
    """Streaming JSONL export (one file per block)."""
    docs.write_json(out_dir)


def read_seeds_csv(path: str) -> pd.DataFrame:
    """CSV seed list → seed frame for ``frontier.seeds_to_frontier`` /
    ``admin.inject_seeds``. Columns: url (required); priority, policy,
    seq optional with the reference's defaults (`routes/requests.js:
    64-80` buildRequestFromSpec fills type/policy defaults)."""
    df = ray.data.read_csv(path).to_pandas()   # seed lists are small
    if "priority" not in df.columns:
        df["priority"] = "normal"
    if "policy" not in df.columns:
        df["policy"] = "default"
    if "seq" not in df.columns:
        df["seq"] = np.arange(len(df), dtype=np.int64)
    df["url"] = df["url"].astype(str)
    df["priority"] = df["priority"].astype(str)
    df["policy"] = df["policy"].astype(str)
    df["seq"] = df["seq"].astype(np.int64)
    return df[["url", "priority", "policy", "seq"]]


# ---- sitemap XML source (generate -> parse round-trip) ----

import re as _re

#: sitemaps.org <urlset> entry — lastmod day-of-month and priority are
#: deterministic url-hash functions so generation, parsing AND the SQL
#: oracle agree bit-for-bit.
_SITEMAP_URL_RE = _re.compile(
    r"<url><loc>([^<]+)</loc><lastmod>([^<]+)</lastmod>"
    r"<priority>([^<]+)</priority></url>")


def sitemap_xml(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(host, xml): one sitemaps.org <urlset> document per host, urls in
    lexicographic order — the deterministic sitemap fixture. lastmod =
    2025-01-(1 + md5_64(url) % 28), priority = (md5_64(url) % 10) / 10
    (the md5 hash primitive, so the SQL oracle reproduces both).

    Scale shape: urls are slim rows; ONE host groupby assembles each
    host's document (a host's sitemap must see all its urls — inherent
    to the format), vectorized string concat per group."""
    from .ops.dedup import _hash64_str

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("url", kind="mergesort")
        h = _hash64_str(g["url"].astype(str).tolist())
        day = (h % np.uint64(28)).astype(np.int64) + 1
        prio = (h % np.uint64(10)).astype(np.int64)
        ent = ("<url><loc>" + g["url"].astype(str)
               + "</loc><lastmod>2025-01-"
               + pd.Series(day, index=g.index).astype(str).str.zfill(2)
               + "</lastmod><priority>0."
               + pd.Series(prio, index=g.index).astype(str)
               + "</priority></url>")
        return pd.DataFrame({
            "host": [str(g["host"].iloc[0])],
            "xml": ["<urlset>" + "".join(ent.tolist()) + "</urlset>"]})

    def add_host(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)", expand=False)
                .fillna("").str.lower())
        return pd.DataFrame({"host": host, "url": df["url"].astype(str)})

    return (pages.select_columns(["url"])
            .map_batches(add_host, batch_format="pandas")
            .groupby("host").map_groups(build, batch_format="pandas"))


def parse_sitemaps(sitemaps: ray.data.Dataset) -> ray.data.Dataset:
    """(url, lastmod, priority_x10, host): parse <urlset> documents back
    to frontier-ready entry rows — the sitemap ingestion path (the
    reference seeds only via REST request lists, `routes/requests.js:
    55-80`; real crawls bootstrap from sitemaps). priority is kept as
    an exact int ×10 (sitemaps carry one decimal digit).

    Stateless ``map_batches`` with a compiled regex per entry — the xml
    payload never shuffles; output rows are slim."""
    def parse(df: pd.DataFrame) -> pd.DataFrame:
        urls, mods, prios, hosts = [], [], [], []
        for host, xml in zip(df["host"].astype(str), df["xml"].astype(str)):
            ms = _SITEMAP_URL_RE.findall(xml)
            urls.extend(m[0] for m in ms)
            mods.extend(m[1] for m in ms)
            prios.extend(int(m[2].split(".", 1)[1][:1]) for m in ms)
            hosts.extend([host] * len(ms))
        return pd.DataFrame({
            "url": np.asarray(urls, dtype=object),
            "lastmod": np.asarray(mods, dtype=object),
            "priority_x10": np.asarray(prios, dtype=np.int64),
            "host": np.asarray(hosts, dtype=object)})

    return sitemaps.map_batches(parse, batch_format="pandas")
