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


# ---- WARC (ISO 28500) response records: Common Crawl's native layout ----
#
# The engine's pages tables are "Common-Crawl-style" (BASELINE.json
# input_hint); real Common Crawl ships as WARC response records. These
# adapters round-trip pages ↔ WARC shards so a user can ingest raw
# CC segments or export a crawl in the archival format. Records are
# deterministic: record-id = urn:md5:<md5(url)>, WARC-Date = warc_ts,
# payload = a minimal HTTP/1.1 200 response head + the html bytes —
# so the index a parse yields is SQL-recomputable from pages directly
# (the crawl_warc_index oracle).

_WARC_HEAD_FIXED = 77     # fixed bytes of the HTTP payload head (see below)


def _http_head(n_html: int) -> bytes:
    # 17 + 40 + 16 + digits + 2 + 2 = 77 + digits bytes
    return (f"HTTP/1.1 200 OK\r\n"
            f"Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {n_html}\r\n\r\n").encode()


def _warc_record(url: str, date: str, html: bytes) -> bytes:
    import hashlib
    payload = _http_head(len(html)) + html
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:md5:{hashlib.md5(url.encode()).hexdigest()}>\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def _warc_dates(ts: pd.Series) -> list[str]:
    return pd.to_datetime(ts).dt.strftime("%Y-%m-%dT%H:%M:%SZ").tolist()


def warc_bytes(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(url, record): one serialized WARC response record per page —
    the streaming serializer ``write_warc`` shards to disk. Stateless
    map_batches; the html payload never shuffles."""
    def build(df: pd.DataFrame) -> pd.DataFrame:
        htmls = [b if isinstance(b, (bytes, bytearray)) else
                 str(b).encode() for b in df["html"]]
        recs = [_warc_record(u, d, h) for u, d, h in
                zip(df["url"].astype(str), _warc_dates(df["warc_ts"]),
                    htmls)]
        return pd.DataFrame({"url": df["url"].astype(str)
                             .to_numpy(dtype=object),
                             "record": pd.Series(recs, dtype=object)})

    return pages.select_columns(["url", "warc_ts", "html"]) \
        .map_batches(build, batch_format="pandas")


def write_warc(pages: ray.data.Dataset, out_dir: str) -> int:
    """Stream pages out as ``.warc`` shard files (one per batch,
    content-addressed name → task-retry idempotent, resumable output).
    Returns the number of records written."""
    import hashlib
    from pathlib import Path

    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)

    def sink(df: pd.DataFrame) -> pd.DataFrame:
        blob = b"".join(df["record"])
        name = hashlib.md5(blob).hexdigest()
        (d / f"shard-{name}.warc").write_bytes(blob)
        return pd.DataFrame({"n": [len(df)]})

    parts = warc_bytes(pages).map_batches(sink, batch_format="pandas")
    return int(sum(r["n"] for r in parts.take_all()))


def parse_warc_blob(blob: bytes) -> pd.DataFrame:
    """One WARC shard's bytes → (url, record_id, warc_date, payload_len,
    html) rows. Sequential scan: header block to the blank line, slice
    Content-Length payload bytes, skip the record separator."""
    rows = []
    i, n = 0, len(blob)
    while i < n:
        j = blob.find(b"\r\n\r\n", i)
        if j < 0:
            break
        head = blob[i:j].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        plen = int(fields.get("Content-Length", "0"))
        payload = blob[j + 4:j + 4 + plen]
        i = j + 4 + plen + 4            # skip \r\n\r\n separator
        sep = payload.find(b"\r\n\r\n")
        html = payload[sep + 4:] if sep >= 0 else payload
        rows.append((fields.get("WARC-Target-URI", ""),
                     fields.get("WARC-Record-ID", "")[len("<urn:md5:"):-1],
                     fields.get("WARC-Date", ""), plen, html))
    return pd.DataFrame(rows, columns=["url", "record_id", "warc_date",
                                       "payload_len", "html"]) \
        .astype({"payload_len": np.int64})


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """``.warc`` shard files → (url, record_id, warc_date, payload_len,
    html) Dataset — the Common Crawl ingestion path. One binary read
    per shard, parsed inside ``map_batches`` (records never transit the
    driver)."""
    def parse(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([parse_warc_blob(b) for b in df["bytes"]],
                         ignore_index=True)

    return ray.data.read_binary_files(paths) \
        .map_batches(parse, batch_format="pandas")


def warc_index(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(url, host, record_id, warc_date, payload_len, html_len): the
    CDX-style index of the corpus's WARC serialization, produced by
    building each record and parsing it straight back (an in-stream
    round-trip, so the serializer and parser are both value-pinned by
    the SQL oracle that recomputes the index from pages directly)."""
    def roundtrip(df: pd.DataFrame) -> pd.DataFrame:
        htmls = [b if isinstance(b, (bytes, bytearray)) else
                 str(b).encode() for b in df["html"]]
        blob = b"".join(_warc_record(u, d, h) for u, d, h in
                        zip(df["url"].astype(str),
                            _warc_dates(df["warc_ts"]), htmls))
        out = parse_warc_blob(blob)
        host = out["url"].str.extract(r"^https?://([^/?#]+)",
                                      expand=False).fillna("").str.lower()
        return pd.DataFrame({
            "url": out["url"].to_numpy(dtype=object),
            "host": host.to_numpy(dtype=object),
            "record_id": out["record_id"].to_numpy(dtype=object),
            "warc_date": out["warc_date"].to_numpy(dtype=object),
            "payload_len": out["payload_len"].to_numpy(np.int64),
            "html_len": np.fromiter((len(h) for h in out["html"]),
                                    dtype=np.int64, count=len(out))})

    return pages.select_columns(["url", "warc_ts", "html"]) \
        .map_batches(roundtrip, batch_format="pandas")


def warc_to_web_root(warc_paths: str | list[str], out_root: str,
                     robots: pd.DataFrame | None = None,
                     seeds: pd.DataFrame | None = None,
                     n_buckets: int = 64):
    """Ingest WARC shards into a crawlable web root — the engine's
    bucketed ``pages/`` + ``pages_meta/`` + ``seeds.parquet`` +
    ``robots.parquet`` layout — so a raw Common-Crawl-style archive
    becomes a CrawlEngine origin directly (the reference can only
    fetch from live HTTP, `providers/fetcher/githubFetcher.js`; here
    the archive IS the origin). ``n_buckets`` must match
    ``CrawlConfig.n_buckets`` (the fetch-join pruning key).

    text is re-extracted with the engine's own extractor and lang
    re-inferred with the marker classifier (a WARC carries neither);
    etag = md5(html), the engine's content-etag rule.

    Scale shape: one streaming parse+enrich pass (html never shuffles
    twice), ONE bucket co-partition writes each bucket's pages + meta
    files under idempotent names; the seeds/robots defaults come from
    a bounded per-host fold of the sink tasks' slim outputs.

    Returns (root, n_pages)."""
    import hashlib
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .ops.text import lang_id_batch
    from .stages.extract import extract_text_batch
    from .urls import hash64_array

    root = Path(out_root)
    root.mkdir(parents=True, exist_ok=True)

    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        html = [bytes(b) for b in df["html"]]
        t = pa.table({"html": pa.array(html, pa.binary())})
        text = extract_text_batch(t).column("text").to_pandas()
        lang = lang_id_batch(pd.DataFrame(
            {"doc_id": np.zeros(len(df), np.int64),
             "text": text.astype(str)}))["lang_guess"]
        u = df["url"].astype(str)
        host = u.str.extract(r"^https?://([^/?#]+)", expand=False) \
            .fillna("").str.lower()
        out = pd.DataFrame({
            "url": u.to_numpy(dtype=object),
            "warc_ts": pd.to_datetime(df["warc_date"], utc=True)
            .dt.tz_localize(None).astype("datetime64[us]"),
            "html": pd.Series(html, dtype=object),
            "text": text.astype(str).to_numpy(dtype=object),
            "lang": lang.to_numpy(dtype=object),
            "etag": [hashlib.md5(b).hexdigest() for b in html],
            "host": host.to_numpy(dtype=object)})
        out["bucket"] = (hash64_array(out["url"]) % n_buckets) \
            .astype(np.int32)
        return out

    page_schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()),
        ("lang", pa.string())])
    meta_schema = pa.schema([
        ("url", pa.string()), ("etag", pa.string()),
        ("host", pa.string())])

    def sink(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        g = g.sort_values("url", kind="stable")
        d1 = root / "pages" / f"bucket={b}"
        d2 = root / "pages_meta" / f"bucket={b}"
        d1.mkdir(parents=True, exist_ok=True)
        d2.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(
            g[["url", "warc_ts", "html", "text", "lang"]],
            schema=page_schema, preserve_index=False),
            d1 / "part-0.parquet")
        pq.write_table(pa.Table.from_pandas(
            g[["url", "etag", "host"]], schema=meta_schema,
            preserve_index=False), d2 / "part-0.parquet")
        first = g.groupby("host", as_index=False) \
            .agg(first_url=("url", "min"), n=("url", "size"))
        return first

    firsts = (read_warc(warc_paths)
              .map_batches(enrich, batch_format="pandas")
              .groupby("bucket").map_groups(sink, batch_format="pandas")
              .to_pandas())            # ≤ hosts × buckets slim rows
    n_pages = int(firsts["n"].sum())

    if seeds is None:
        s = firsts.groupby("host", as_index=False)["first_url"].min() \
            .sort_values("host")
        seeds = pd.DataFrame({
            "url": s["first_url"].to_numpy(dtype=object),
            "priority": "normal", "policy": "default",
            "seq": np.arange(len(s), dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(seeds, preserve_index=False),
                   root / "seeds.parquet")

    if robots is None:
        hosts = sorted(firsts["host"].unique())
        robots = pd.DataFrame({
            "host": np.asarray(hosts, dtype=object),
            "disallow_prefixes": [[] for _ in hosts],
            "crawl_delay_ms": np.int64(0),
            "max_per_window": np.int32(1000)})
    pq.write_table(pa.Table.from_pandas(robots, preserve_index=False),
                   root / "robots.parquet")
    return root, n_pages


def seeds_from_sitemaps(sitemaps: ray.data.Dataset) -> pd.DataFrame:
    """Sitemap entries → seed frame for ``frontier.seeds_to_frontier`` /
    ``admin.inject_seeds`` — the bootstrap path real crawls use (the
    reference can only seed via REST request lists,
    `routes/requests.js:55-80`). Sitemap priority maps to the queue
    priority the reference's weighted queues encode: priority ≥ 0.7 →
    ``soon``, else ``normal``; entries are ordered (host, url) so the
    seed sequence is deterministic."""
    rows = parse_sitemaps(sitemaps).to_pandas() \
        .sort_values(["host", "url"], kind="stable").reset_index(drop=True)
    return pd.DataFrame({
        "url": rows["url"].astype(str).to_numpy(dtype=object),
        "priority": np.where(rows["priority_x10"].to_numpy(np.int64) >= 7,
                             "soon", "normal").astype(object),
        "policy": "default",
        "seq": np.arange(len(rows), dtype=np.int64)})


# ---- robots.txt text format (REP; serialize <-> parse round-trip) ----

def robots_txt(robots: pd.DataFrame) -> pd.DataFrame:
    """(host, body): serialize the structured robots table to the REP
    text format a web server actually serves — one document per host
    with User-agent/Disallow/Crawl-delay lines (RFC 9309 §2.2; the
    engine-side extension directive ``Max-per-window`` carries the
    politeness budget the reference keeps in queue config,
    `lib/crawlerFactory.js:74-76`)."""
    rows = []
    for r in robots.sort_values("host").itertuples():
        lines = ["User-agent: *"]
        lines += [f"Disallow: {p}" for p in sorted(r.disallow_prefixes)]
        if int(r.crawl_delay_ms):
            lines.append(f"Crawl-delay: {int(r.crawl_delay_ms) / 1000:g}")
        lines.append(f"Max-per-window: {int(r.max_per_window)}")
        rows.append((r.host, "\n".join(lines) + "\n"))
    return pd.DataFrame(rows, columns=["host", "body"])


def parse_robots_txt(docs: pd.DataFrame,
                     default_max_per_window: int = 1000) -> pd.DataFrame:
    """(host, disallow_prefixes, crawl_delay_ms, max_per_window): parse
    REP text bodies back to the structured robots table the engine
    consumes — the ingestion path for real fetched robots.txt files.
    Unknown directives are ignored (RFC 9309 §2.2.4); a missing
    Crawl-delay means 0; group handling keeps the ``*`` agent group
    (the only group the engine models)."""
    out = []
    for r in docs.itertuples():
        dis, delay_ms, mpw = [], 0, default_max_per_window
        in_star = False
        for raw in str(r.body).splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                in_star = val == "*"
            elif in_star and key == "disallow" and val:
                dis.append(val)
            elif in_star and key == "crawl-delay":
                delay_ms = int(float(val) * 1000)
            elif in_star and key == "max-per-window":
                mpw = int(val)
        out.append((r.host, sorted(dis), delay_ms, mpw))
    df = pd.DataFrame(out, columns=["host", "disallow_prefixes",
                                    "crawl_delay_ms", "max_per_window"])
    df["crawl_delay_ms"] = df["crawl_delay_ms"].astype(np.int64)
    df["max_per_window"] = df["max_per_window"].astype(np.int32)
    return df.sort_values("host").reset_index(drop=True)
