"""Deterministic synthesis of the crawlable web (pages/seeds/robots tables).

This is the analogue of the reference's canned-fixture layer — the
TestFetcher + canned documents its tests crawl against
(`test/unit/processingTests.js:13-46`, `test/unit/gitHubProcessorTests.js`) —
scaled up: a fully deterministic link graph embedded in ``html`` so the
whole crawl (ordering, seen set, deadletters) is a pure function of
(sf, seed=42). Schema is the driver-fixed input shape (BASELINE.json):
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Graph features exercised (FIXTURES.md §1):
- Zipf-ish host skew (hot hosts → politeness salting tests);
- leaf pages (no links) and hub pages (~40 links + ``?page=N`` siblings,
  the pagination analogue of `providers/fetcher/githubProcessor.js:58-79`);
- duplicate-content alias pages (same html ⇒ same etag; the 304/etag
  analogue of `providers/fetcher/githubFetcher.js:78-84`);
- links to missing urls (fetch-error → retry → attempt-cap deadletter,
  `lib/crawler.js:304-319`);
- ``/handoff/`` urls (deny-regex filter, `lib/crawler.js:594-599`);
- robots-disallowed path prefixes per host (FIXTURES.md §3).

Output layout (bucket = hash64(url) % n_buckets, the fetch-join key):
``{root}/pages/bucket={b}/part-0.parquet``       full rows
``{root}/pages_meta/bucket={b}/part-0.parquet``  (url, etag) probe sidecar
``{root}/seeds.parquet``  (url, priority, policy, seq)
``{root}/robots.parquet`` (host, disallow_prefixes, crawl_delay_ms, max_per_window)

Everything is cached under /tmp keyed by a generator version; generation is
one-time per (sf, version) and atomic (tmp dir + rename).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import re
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .config import PRIORITIES
from .urls import hash64_array

GENVER = "g5"   # g5: hash64 switched to vectorized polars hash (bucket layout)
CACHE_ROOT = Path(os.environ.get("GHCRAWLER_RAY_CACHE", "/tmp/ghcrawler_ray_cache"))

_ADJ = ["quiet", "rapid", "brittle", "golden", "weary", "sharp", "hollow"]
_NOUN = ["river", "archive", "engine", "harbor", "signal", "ledger", "forest"]
_LANGS = ["en", "de", "fr"]

EPOCH = datetime.datetime(2024, 1, 1)


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", str(sf_dir))
    if not m:
        raise ValueError(f"cannot parse scale factor from {sf_dir!r}")
    return float(m.group(1))


def _mk_html(title: str, text: str, hrefs: list[str]) -> str:
    links = "".join(f'<li><a href="{h}">l{i}</a></li>' for i, h in enumerate(hrefs))
    return (f"<html><head><title>{title}</title></head><body>"
            f"<h1>{title}</h1><p>{text}</p><ul>{links}</ul></body></html>")


def generate_web(sf: float) -> dict[str, pd.DataFrame]:
    """Build the synthetic web purely in memory. Deterministic in sf."""
    n_base = max(60, int(2_000_000 * sf))
    n_hosts = max(5, n_base // 200)
    rng = np.random.RandomState(42)

    w = 1.0 / np.arange(1, n_hosts + 1) ** 1.05
    host_of = rng.choice(n_hosts, size=n_base, p=w / w.sum())
    k_within = pd.Series(host_of).groupby(host_of).cumcount().to_numpy()

    hosts = np.array([f"host{h}.example" for h in range(n_hosts)], dtype=object)

    # base urls; k==17 pages sit under /handoff/ (deny-regex targets)
    urls = np.array(
        [f"http://{hosts[h]}/handoff/{k}" if k == 17 else f"http://{hosts[h]}/p/{k}"
         for h, k in zip(host_of, k_within)],
        dtype=object,
    )
    url_of_index = urls  # link targets address base pages by index

    is_leaf = (host_of * 7 + k_within) % 10 == 0
    is_hub = k_within == 1
    out_deg = rng.randint(2, 9, size=n_base)
    out_deg[is_leaf] = 0
    out_deg[is_hub] = 40

    # duplicate-content aliases of the first n_dup base pages (urls known up
    # front so base pages can link to them → exercises the 304 path)
    n_dup = max(4, n_base // 50)
    alias_urls = np.array(
        [f"http://{hosts[host_of[i]]}/dup/{k_within[i]}-{i}" for i in range(n_dup)],
        dtype=object,
    )

    rows: list[tuple] = []  # (url, host, html, text, lang)

    def text_of(h: int, k: int) -> str:
        a = _ADJ[(h + k) % len(_ADJ)]
        nn = _NOUN[(h * 3 + k) % len(_NOUN)]
        rep = 1 + (k % 3)
        base = f"Record {k} from host{h} tells a {a} story about the {nn} number {(k * 7) % 97}."
        return " ".join([base] * rep)

    for i in range(n_base):
        h, k, d = int(host_of[i]), int(k_within[i]), int(out_deg[i])
        hrefs: list[str] = []
        if is_hub[i]:
            hrefs.extend(f"{urls[i]}?page={j}" for j in range(2, 5))
        if d:
            tgt = rng.randint(0, n_base, size=d)
            hrefs.extend(url_of_index[t] for t in tgt)
            # ~ one missing link per 200 links
            if rng.randint(0, 25) == 0:
                hrefs.append(f"http://{hosts[h]}/missing/{k}")
            # occasional link to a duplicate-content alias (304 analogue)
            if rng.randint(0, 20) == 0:
                hrefs.append(alias_urls[rng.randint(0, n_dup)])
        lang = _LANGS[(h + k) % 3]
        text = text_of(h, k)
        rows.append((urls[i], hosts[h], _mk_html(f"Page {k} of host{h}", text, hrefs), text, lang))

    # hub ?page= siblings: real pages with few links
    for i in np.flatnonzero(is_hub):
        h, k = int(host_of[i]), int(k_within[i])
        for j in range(2, 5):
            u = f"{urls[i]}?page={j}"
            tgt = rng.randint(0, n_base, size=3)
            text = text_of(h, k * 100 + j)
            rows.append((u, hosts[h],
                         _mk_html(f"Page {k} of host{h} pt{j}", text,
                                  [url_of_index[t] for t in tgt]),
                         text, _LANGS[(h + k + j) % 3]))

    for i in range(n_dup):
        h = int(host_of[i])
        rows.append((alias_urls[i], hosts[h], rows[i][2], rows[i][3], rows[i][4]))

    pages = pd.DataFrame(rows, columns=["url", "host", "html", "text", "lang"])
    pages = pages.drop_duplicates(subset="url", keep="first").reset_index(drop=True)
    pages["warc_ts"] = pd.to_datetime(EPOCH) + pd.to_timedelta(np.arange(len(pages)), unit="s")
    pages["html"] = pages["html"].map(lambda s: s.encode("utf-8"))
    pages["etag"] = pages["html"].map(lambda b: hashlib.md5(b).hexdigest())

    # robots: deterministic per host
    hmod = np.arange(n_hosts) % 3
    robots = pd.DataFrame({
        "host": hosts,
        "disallow_prefixes": [["/p/13", "/deny/"] if h % 4 == 0 else [] for h in range(n_hosts)],
        "crawl_delay_ms": np.array([0, 100, 500])[hmod].astype(np.int64),
        "max_per_window": np.array([1000, 200, 50])[hmod].astype(np.int32),
    })

    # seeds: page k=0 of every host, + error/malformed/dup/filtered probes
    first_of_host = pd.DataFrame({"h": host_of, "k": k_within, "url": urls}) \
        .sort_values(["h", "k"]).groupby("h").head(1)
    seed_urls = list(first_of_host["url"])
    seed_urls += [
        "http://nosuchhost.example/x",          # fetch_error → retries → deadletter
        "http://host0.example/missing/seed",    # fetch_error
        "not a url",                            # malformed → deadletter
        "ftp://host0.example/f",                # malformed (non-http scheme)
        seed_urls[0],                           # duplicate seed → bounce
        "HTTP://HOST0.EXAMPLE/p/0#frag",        # normalizes to an existing url → bounce
        "http://host1.example/handoff/x",       # deny-regex filtered
        "http://outside.org/p/0",               # scope-filtered (host suffix)
    ]
    if n_hosts > 4:  # a robots-disallowed target on a h%4==0 host
        seed_urls.append("http://host4.example/deny/x")
    seed_urls.extend(alias_urls[:2])  # direct duplicate-content seeds
    seeds = pd.DataFrame({
        "url": seed_urls,
        "priority": [PRIORITIES[i % len(PRIORITIES)] for i in range(len(seed_urls))],
        "policy": "default",
        "seq": np.arange(len(seed_urls), dtype=np.int64),
    })
    return {"pages": pages, "seeds": seeds, "robots": robots}


def _write_bucketed(pages: pd.DataFrame, root: Path, n_buckets: int) -> None:
    bucket = hash64_array(pages["url"].to_numpy(dtype=object)) % n_buckets
    pages = pages.assign(bucket=bucket)
    page_schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")), ("html", pa.binary()),
        ("text", pa.string()), ("lang", pa.string()),
    ])
    meta_schema = pa.schema([("url", pa.string()), ("etag", pa.string()), ("host", pa.string())])
    for b, g in pages.groupby("bucket"):
        d1 = root / "pages" / f"bucket={b}"
        d2 = root / "pages_meta" / f"bucket={b}"
        d1.mkdir(parents=True, exist_ok=True)
        d2.mkdir(parents=True, exist_ok=True)
        t = pa.Table.from_pandas(g[["url", "warc_ts", "html", "text", "lang"]],
                                 schema=page_schema, preserve_index=False)
        pq.write_table(t, d1 / "part-0.parquet")
        m = pa.Table.from_pandas(g[["url", "etag", "host"]], schema=meta_schema,
                                 preserve_index=False)
        pq.write_table(m, d2 / "part-0.parquet")


def ensure_testdata(sf: float, n_buckets: int = 64) -> Path:
    """Synthesize (or reuse cached) web at scale sf; returns the root dir."""
    root = CACHE_ROOT / f"v{GENVER}-b{n_buckets}" / f"sf{sf}"
    manifest = root / "MANIFEST.json"
    if manifest.exists():
        return root
    tmp = root.with_name(root.name + f".tmp{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    web = generate_web(sf)
    _write_bucketed(web["pages"], tmp, n_buckets)
    seeds_t = pa.Table.from_pandas(web["seeds"], preserve_index=False)
    pq.write_table(seeds_t, tmp / "seeds.parquet")
    robots_t = pa.Table.from_pandas(web["robots"], preserve_index=False)
    pq.write_table(robots_t, tmp / "robots.parquet")
    (tmp / "MANIFEST.json").write_text(json.dumps({
        "sf": sf, "genver": GENVER, "n_buckets": n_buckets,
        "n_pages": len(web["pages"]), "n_seeds": len(web["seeds"]),
        "n_hosts": len(web["robots"]),
    }))
    root.parent.mkdir(parents=True, exist_ok=True)
    try:
        tmp.rename(root)
    except OSError:
        if manifest.exists():   # lost a benign race: another process finished first
            shutil.rmtree(tmp)
        else:
            raise
    return root


def ensure_testdata_for_dir(sf_dir: str, n_buckets: int = 64) -> Path:
    return ensure_testdata(sf_of_dir(sf_dir), n_buckets=n_buckets)
