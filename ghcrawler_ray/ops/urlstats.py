"""URL-space analyses over the crawled web: crawl-trap detection and
anchor-text aggregation.

Crawler-operations complements to the frontier (SURVEY.md §2.6 ordering
/ §2.2 filters). The reference bounds runaway URL spaces only indirectly
(attempt caps `lib/crawler.js:320-344`, queue weights
`providers/queuing/queueSet.js:46-65`); a production crawl ALSO needs to
*detect* the runaway spaces — calendar pages, session-id permutations,
faceted search — before they eat the fetch budget. ``trap_patterns``
is that detector: digit-runs in the path+query collapse to ``N`` and
hosts whose single pattern explodes past a threshold get flagged, the
standard crawler-trap heuristic (Heydon & Najork, "Mercator: A scalable,
extensible Web crawler", WWW 1999, §3.2 — URL canonicalization and trap
avoidance).

``anchor_text_agg`` is the classic link-text signal (anchor text
describes the *target* page better than the target itself — Brin & Page
1998 §2.2): per destination URL, how many pages link to it, with how
many distinct anchor texts, and which anchor dominates. Used for search
indexing and as crawl-priority evidence.

Scale shape (both ops): per-batch pandas/polars combiner emits partial
count rows only (the html/url payload never shuffles), then ONE coarse
int-keyed co-partition (`hash64 % N_URL_PARTS`) folds partials
shard-locally — the same slim-combiner → small-shuffle shape as
`ops/text.token_stats`. Driver holds nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..urls import hash64_array

N_URL_PARTS = 64

#: hosts whose collapsed URL pattern has at least this many distinct
#: URLs are flagged as potential traps (tests/bench override it).
TRAP_THRESHOLD = 100

# SQL fragments mirrored by __ray_entry__._crawl_sql (kept adjacent to
# the Python they must reproduce bit-for-bit).
HOST_SQL = "lower(regexp_extract(url, '^https?://([^/?#]+)', 1))"
PATTERN_SQL = ("regexp_replace(regexp_replace(regexp_replace(url, "
               "'^https?://[^/?#]+', ''), '#.*$', ''), '[0-9]+', 'N', 'g')")
ANCHOR_TAG_RE = r'<a href="([^"]+)">([^<]*)</a>'


def _host_pattern(urls: pd.Series) -> pd.DataFrame:
    host = (urls.str.extract(r"^https?://([^/?#]+)", expand=False)
            .fillna("").str.lower())
    pat = (urls.str.replace(r"^https?://[^/?#]+", "", regex=True)
           .str.replace(r"#.*$", "", regex=True)
           .str.replace(r"[0-9]+", "N", regex=True))
    return pd.DataFrame({"host": host, "path_pattern": pat})


def trap_patterns(pages: ray.data.Dataset,
                  threshold: int = TRAP_THRESHOLD) -> ray.data.Dataset:
    """(host, path_pattern, n_urls, is_trap): distinct-URL count per
    collapsed URL pattern; ``is_trap`` when the pattern's population
    reaches ``threshold`` (input URLs are unique by contract — the
    pages table is keyed by url — so count(*) == count distinct)."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        hp = _host_pattern(df["url"].astype(str))
        g = (hp.groupby(["host", "path_pattern"], sort=False)
             .size().rename("cnt").reset_index())
        key = g["host"] + "\x00" + g["path_pattern"]
        g["part"] = (hash64_array(key) % N_URL_PARTS).astype(np.int32)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["host", "path_pattern"], sort=False)["cnt"]
               .sum().rename("n_urls").reset_index())
        out["n_urls"] = out["n_urls"].astype(np.int64)
        out["is_trap"] = out["n_urls"] >= threshold
        return out[["host", "path_pattern", "n_urls", "is_trap"]]

    return (pages.select_columns(["url"])
            .map_batches(partials, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


def anchor_text_agg(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(dst_url, n_refs, n_anchors, top_anchor): per link target, total
    in-references, distinct anchor texts, and the most frequent anchor
    (ties broken by lexicographically smallest anchor — deterministic)."""

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        from ..stages.extract import _html_arrow
        h = pl.from_arrow(_html_arrow(df["html"]))
        tags = (pl.DataFrame({"tag": h.str.extract_all(ANCHOR_TAG_RE)})
                .explode("tag").drop_nulls("tag")
                .with_columns(
                    pl.col("tag").str.extract(r'<a href="([^"]+)"', 1)
                    .alias("dst_url"),
                    pl.col("tag").str.extract(r">([^<]*)</a>", 1)
                    .alias("anchor"))
                .group_by(["dst_url", "anchor"]).len(name="cnt")
                .to_pandas())
        tags["cnt"] = tags["cnt"].astype(np.int64)
        tags["part"] = (hash64_array(tags["dst_url"].astype(str))
                        % N_URL_PARTS).astype(np.int32)
        return tags[["part", "dst_url", "anchor", "cnt"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # all partials for a dst live in this partition: finish counts,
        # then one vectorized per-dst argmax over (-cnt, anchor) order
        c = (g.groupby(["dst_url", "anchor"], sort=False)["cnt"]
             .sum().reset_index())
        c = c.sort_values(["dst_url", "cnt", "anchor"],
                          ascending=[True, False, True], kind="stable")
        agg = c.groupby("dst_url", sort=False).agg(
            n_refs=("cnt", "sum"), n_anchors=("anchor", "size"),
            top_anchor=("anchor", "first")).reset_index()
        agg["n_refs"] = agg["n_refs"].astype(np.int64)
        agg["n_anchors"] = agg["n_anchors"].astype(np.int64)
        return agg[["dst_url", "n_refs", "n_anchors", "top_anchor"]]

    return (pages.select_columns(["html"])
            .map_batches(pair_partials, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- robots longest-match evaluation (full REP semantics) ----

#: path incl. query, fragment stripped — mirrored by the oracle
PATH_SQL = ("regexp_replace(regexp_replace(url, '^https?://[^/?#]+', ''), "
            "'#.*$', '')")


def robots_eval(pages: ray.data.Dataset,
                rules: pd.DataFrame) -> ray.data.Dataset:
    """(url, allowed, match_len): Google-REP verdict for every input URL
    against a (host, pattern, is_allow) rule table — the MOST SPECIFIC
    (longest) matching pattern wins, allow beats disallow on a length
    tie, and a URL matching no rule is allowed (match_len = -1).

    This is the full Robots Exclusion Protocol decision rule (RFC 9309
    §2.2.2 "longest match"), generalizing the engine's deny-prefix
    gating (PrepareBatch robots prefixes — deny-only, any-match): an
    Allow carve-out under a disallowed subtree is honored here and
    invisible there.

    Scale shape: the rule table is robots-sized (per-host handfuls) and
    rides in ONE ``ray.put`` broadcast — the same shape as the engine's
    robots_ref — and the verdict pass is stateless ``map_batches``
    (per rule-host vectorized startswith; URLs never shuffle). If the
    rule table itself outgrew a broadcast, co-partition both sides by
    host hash instead."""
    by_host: dict[str, list[tuple[str, int]]] = {}
    for r in rules.itertuples():
        by_host.setdefault(r.host, []).append((r.pattern, int(r.is_allow)))
    rules_ref = ray.put(by_host)

    def verdicts(df: pd.DataFrame) -> pd.DataFrame:
        rl = ray.get(rules_ref)
        urls = df["url"].astype(str)
        hs = (urls.str.extract(r"^https?://([^/?#]+)", expand=False)
              .fillna("").str.lower().to_numpy(dtype=object))
        path = (urls.str.replace(r"^https?://[^/?#]+", "", regex=True)
                .str.replace(r"#.*$", "", regex=True))
        la = np.full(len(df), -1, dtype=np.int64)
        ld = np.full(len(df), -1, dtype=np.int64)
        for h, pats in rl.items():
            sel = hs == h
            if not sel.any():
                continue
            sub = path[sel]
            for pat, is_allow in pats:
                hit = sub.str.startswith(pat).to_numpy()
                tgt = la if is_allow else ld
                tgt[sel] = np.where(hit, np.maximum(tgt[sel], len(pat)),
                                    tgt[sel])
        return pd.DataFrame({
            "url": urls.to_numpy(dtype=object),
            "allowed": la >= ld,
            "match_len": np.maximum(la, ld)})

    return pages.select_columns(["url"]).map_batches(
        verdicts, batch_format="pandas")


# ---- crawl pacing: per-host drain plan under politeness budgets ----

def drain_plan(pages: ray.data.Dataset,
               robots: pd.DataFrame) -> ray.data.Dataset:
    """(host, n_urls, per_wave_budget, waves_needed): how many polite
    waves each host needs to drain its URL space —
    waves_needed = ceil(n_urls / max_per_window). The capacity-planning
    readout of the politeness ledger (`state/politeness.host_budget`):
    the crawl's wall-clock is max(waves_needed) over hosts, so this is
    where the long-tail host that will dominate the schedule shows up
    BEFORE the crawl runs.

    Scale shape: urls collapse to per-host partial counts per batch
    (combiner), ONE #hosts-bounded hash-agg finishes the counts, and
    the robots budget table (per-host scalars) is a driver-side merge
    on that bounded result."""
    from ray.data.aggregate import Sum

    def host_counts(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)", expand=False)
                .fillna("").str.lower())
        g = host.groupby(host, sort=False).size()
        return pd.DataFrame({"host": g.index.to_numpy(dtype=object),
                             "n": g.to_numpy(dtype=np.int64)})

    counts = (pages.select_columns(["url"])
              .map_batches(host_counts, batch_format="pandas")
              .groupby("host").aggregate(Sum("n", alias_name="n_urls"))
              .to_pandas())                       # ≤ #hosts rows
    bud = robots[["host", "max_per_window"]].copy()
    out = counts.merge(bud, on="host", how="left")
    out["per_wave_budget"] = out["max_per_window"] \
        .fillna(1).astype(np.int64).clip(lower=1)
    out["n_urls"] = out["n_urls"].astype(np.int64)
    out["waves_needed"] = -(-out["n_urls"] // out["per_wave_budget"])
    return ray.data.from_pandas(
        out[["host", "n_urls", "per_wave_budget", "waves_needed"]])


# ---- host content-duplication profile (mirror detection) ----

def host_content_dup(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(host, n_pages, n_distinct, dup_frac_fp): per-host exact-content
    duplication — n_distinct = distinct md5(html) among the host's
    pages, dup_frac_fp = (n_pages − n_distinct)·FP // n_pages. Hosts
    serving the same bytes under many URLs (mirrors, session-id traps)
    jump out; the content-level complement to ``trap_patterns``'s
    URL-shape heuristic.

    Scale shape: each batch folds to slim (host, md5) rows — html never
    shuffles — and ONE host-hash co-partition computes both counts
    vectorized across all of a partition's hosts."""
    import hashlib

    FP = 10 ** 6

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)", expand=False)
                .fillna("").str.lower())
        html = df["html"]
        if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
            ch = [hashlib.md5(b).hexdigest() for b in html]
        else:
            ch = [hashlib.md5(str(s).encode()).hexdigest() for s in html]
        out = pd.DataFrame({"host": host.to_numpy(dtype=object),
                            "h": np.asarray(ch, dtype=object)})
        out["part"] = (hash64_array(out["host"]) % N_URL_PARTS) \
            .astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("host", sort=False)["h"] \
            .agg(n_pages="size", n_distinct="nunique").reset_index()
        n = agg["n_pages"].to_numpy(dtype=np.int64)
        d = agg["n_distinct"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"host": agg["host"].to_numpy(dtype=object),
                             "n_pages": n, "n_distinct": d,
                             "dup_frac_fp": (n - d) * FP // n})

    return (pages.select_columns(["url", "html"])
            .map_batches(slim, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- URL front-coding: frontier/index storage estimate ----

FC_FP = 10 ** 6


def url_prefix_compression(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(host, n_urls, raw_bytes, coded_bytes, savings_fp): per-host
    front-coding estimate — URLs sorted within their host, each stored
    as (shared-prefix length with its predecessor, suffix). The storage
    planner for the frontier / CDX / seen-set spill files: crawl URL
    spaces are massively prefix-shared, and this measures exactly how
    much (savings_fp = (raw − coded)·FP // raw; coded charges 2 bytes
    per URL for the prefix-length varint).

    Scale shape: slim (host, url) rows, ONE host-hash co-partition;
    the within-host sort is partition-local (a host's URLs co-locate)
    and prefix lengths are one vectorized zip-compare per partition —
    the op never global-sorts."""
    def slim(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)", expand=False)
                .fillna("").str.lower())
        out = pd.DataFrame({"host": host.to_numpy(dtype=object),
                            "url": df["url"].astype(str)
                            .to_numpy(dtype=object)})
        out["part"] = (hash64_array(out["host"]) % N_URL_PARTS) \
            .astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for host, sub in g.groupby("host", sort=False):
            urls = np.sort(sub["url"].to_numpy(dtype=object))
            lens = np.fromiter((len(u.encode()) for u in urls),
                               dtype=np.int64, count=len(urls))
            raw = int(lens.sum())
            shared = np.zeros(len(urls), dtype=np.int64)
            if len(urls) > 1:
                # vectorized adjacent common-prefix: pad to a byte
                # matrix, leading-equal run via cumprod; NUL padding can
                # only extend a run when one url prefixes the other, so
                # clamping by min(len, len_pred) restores exactness
                L = int(lens.max())
                buf = b"".join(u.encode().ljust(L, b"\0") for u in urls)
                m = np.frombuffer(buf, dtype=np.uint8).reshape(-1, L)
                lead = np.cumprod(m[1:] == m[:-1], axis=1) \
                    .sum(axis=1).astype(np.int64)
                shared[1:] = np.minimum(lead,
                                        np.minimum(lens[1:], lens[:-1]))
            coded = int((lens - shared).sum()) + 2 * len(urls)
            # clamp at 0: tiny hosts can "save" negative bytes, and
            # floor-vs-truncate division diverges below zero
            rows.append((host, len(urls), raw, coded,
                         max(raw - coded, 0) * FC_FP // raw
                         if raw else 0))
        return pd.DataFrame(rows, columns=[
            "host", "n_urls", "raw_bytes", "coded_bytes", "savings_fp"]) \
            .astype({"n_urls": np.int64, "raw_bytes": np.int64,
                     "coded_bytes": np.int64, "savings_fp": np.int64})

    return (pages.select_columns(["url"])
            .map_batches(slim, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- URL structure mix per host (frontier-shape diagnostics) ----

def url_mix_profile(pages: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_urls, n_query, sum_path_depth, max_path_depth,
    n_top_dirs): per-host URL-structure profile — how much of a site is
    parameterized (query strings ⇒ likely dynamic / paginated), how
    deep its path tree runs, and how many distinct top-level sections
    it exposes. The dashboard readout crawl planners use next to
    ``trap_patterns`` (Mercator's URL-space diagnostics): a host with
    exploding depth or query share gets a budget cap before it eats the
    frontier.

    All-integer columns, so the SQL mirror is exact. Scale shape:
    per-batch combiner groups by (host, top_dir) — bounded by
    #hosts × #sections — then one tiny fold; URLs never shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["url"].astype(str)
        host = u.str.extract(r"^https?://([^/?#]+)")[0].str.lower()
        path = (u.str.replace(r"^https?://[^/?#]+", "", regex=True)
                .str.replace(r"[?#].*$", "", regex=True))
        segs = path.str.split("/").map(
            lambda xs: [s for s in xs if s] if isinstance(xs, list) else [])
        depth = segs.map(len).astype(np.int64)
        top = segs.map(lambda xs: xs[0] if xs else "")
        q = u.str.contains(r"\?", regex=True).astype(np.int64)
        f = pd.DataFrame({"host": host, "top_dir": top, "n_urls": 1,
                          "n_query": q, "sum_depth": depth,
                          "max_depth": depth}).dropna(subset=["host"])
        return f.groupby(["host", "top_dir"], sort=False).agg(
            n_urls=("n_urls", "sum"), n_query=("n_query", "sum"),
            sum_depth=("sum_depth", "sum"),
            max_depth=("max_depth", "max")).reset_index()

    parts = (pages.select_columns(["url"])
             .map_batches(partial, batch_format="pandas")
             .to_pandas())              # ≤ #hosts × #sections × #blocks
    bysec = parts.groupby(["host", "top_dir"], sort=True).agg(
        n_urls=("n_urls", "sum"), n_query=("n_query", "sum"),
        sum_depth=("sum_depth", "sum"),
        max_depth=("max_depth", "max")).reset_index()
    g = bysec.groupby("host", sort=True).agg(
        n_urls=("n_urls", "sum"), n_query=("n_query", "sum"),
        sum_path_depth=("sum_depth", "sum"),
        max_path_depth=("max_depth", "max"),
        n_top_dirs=("top_dir", "size")).reset_index()
    for c in ("n_urls", "n_query", "sum_path_depth", "max_path_depth",
              "n_top_dirs"):
        g[c] = g[c].astype(np.int64)
    return g


# ---- Jain fairness of per-host page counts ----

def host_fairness(pages: ray.data.Dataset) -> pd.DataFrame:
    """One-row (n_hosts, n_pages, jain): Jain's fairness index
    (Σx)²/(n·Σx²) of per-host page counts — 1.0 when the crawl budget
    spread evenly across hosts, →1/n when one host ate the frontier
    (the scalar the drain_plan table rolls up to; Jain, Chiu & Hawe
    1984). Exact integer moments; the single IEEE division is the same
    expression in the SQL mirror — bit-exact, unrounded.

    Scale shape: per-batch host-count combiner → #hosts-bounded fold →
    three scalars."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["url"].astype(str).str.extract(r"^https?://([^/?#]+)")[0]
             .str.lower())
        c = h.dropna().value_counts()
        return pd.DataFrame({"host": c.index.to_numpy(dtype=object),
                             "n": c.to_numpy(np.int64)})

    parts = (pages.select_columns(["url"])
             .map_batches(partial, batch_format="pandas")
             .to_pandas())                    # ≤ #hosts × #blocks rows
    x = parts.groupby("host", sort=False)["n"].sum().to_numpy(np.int64)
    n = np.int64(len(x))
    sx, sxx = np.int64(x.sum()), np.int64((x * x).sum())
    jain = float(sx * sx) / float(n * sxx) if n > 0 else 0.0
    return pd.DataFrame({"n_hosts": [n], "n_pages": [sx], "jain": [jain]})


# ---- per-host robots coverage rollup (sitemap-vs-robots hygiene) ----

def robots_coverage(pages: ray.data.Dataset,
                    rules: pd.DataFrame) -> pd.DataFrame:
    """(host, n_urls, n_allowed, n_blocked): how much of each host's
    advertised URL space (its sitemap lists every crawled page —
    ``sources.sitemap_xml``) the full-REP robots verdict actually
    permits — the crawl-hygiene audit that catches "sitemap advertises
    what robots blocks". Rolls ``robots_eval``'s per-URL verdicts up to
    the host readout.

    Scale shape: robots_eval's broadcast-rules stateless pass, then a
    per-batch (host, allowed) count combiner → #hosts-bounded driver
    fold; URLs never shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["url"].astype(str).str.extract(r"^https?://([^/?#]+)")[0]
             .str.lower())
        out = pd.DataFrame({"host": h,
                            "allowed": df["allowed"].astype(bool)})
        g = out.groupby(["host", "allowed"], sort=False,
                        as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["host", "allowed", "n"]]

    rows = (robots_eval(pages, rules)
            .map_batches(partial, batch_format="pandas")
            .to_pandas())                 # ≤ #hosts × 2 × #blocks rows
    agg = rows.groupby(["host", "allowed"], sort=True)["n"].sum() \
        .reset_index()
    hosts = sorted(agg["host"].unique())
    al = agg[agg["allowed"]].set_index("host")["n"]
    bl = agg[~agg["allowed"]].set_index("host")["n"]
    n_allowed = np.array([int(al.get(h, 0)) for h in hosts],
                         dtype=np.int64)
    n_blocked = np.array([int(bl.get(h, 0)) for h in hosts],
                         dtype=np.int64)
    return pd.DataFrame({"host": np.array(hosts, dtype=object),
                         "n_urls": n_allowed + n_blocked,
                         "n_allowed": n_allowed,
                         "n_blocked": n_blocked})


# ---- max-min fair wave-budget allocation (water-filling) ----

WATERFILL_BUDGET = 4999     # global per-wave fetch budget B


def waterfill_allocation(pages: ray.data.Dataset,
                         budget: int = WATERFILL_BUDGET) -> pd.DataFrame:
    """(host, n_urls, allocated): split ONE global per-wave fetch
    budget B across hosts max-min fairly (water-filling): every host
    gets min(queue, L) where the integer water level L is the largest
    feasible, and the leftover B − Σ min(queue, L) goes +1 each to the
    lexicographically-smallest still-unsaturated hosts. The global
    companion to ``drain_plan``'s per-host independent budgets — what a
    coordinator sets when the FLEET (not each host) is the bottleneck.

    Exact integer throughout: with queues sorted asc (ties → host), the
    level is L = max over k of (B − prefix_{k−1}) // (n−k+1) restricted
    to k where the previous queue is ≤ that candidate (the classic
    sorted water-fill; when B ≥ Σqueue the k=n candidate saturates
    everyone and no +1s are spent). Mirrored term-for-term in SQL.

    Scale shape: per-batch per-host combiner → ONE #hosts-bounded
    hash-agg; the fill itself is a ≤ #hosts-row driver fold."""
    from ray.data.aggregate import Sum

    def host_counts(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)", expand=False)
                .fillna("").str.lower())
        g = host.groupby(host, sort=False).size()
        return pd.DataFrame({"host": g.index.to_numpy(dtype=object),
                             "n": g.to_numpy(dtype=np.int64)})

    q = (pages.select_columns(["url"])
         .map_batches(host_counts, batch_format="pandas",
                      batch_size=65536)
         .groupby("host").aggregate(Sum("n", alias_name="n_urls"))
         .to_pandas())                        # ≤ #hosts rows
    q = q.sort_values(["n_urls", "host"], kind="stable") \
        .reset_index(drop=True)
    nu = q["n_urls"].to_numpy(np.int64)
    n = len(q)
    pre = np.concatenate([[0], np.cumsum(nu)])       # prefix_{k-1}
    k = np.arange(1, n + 1, dtype=np.int64)
    lk = (budget - pre[:-1]) // (n - k + 1)
    valid = np.concatenate([[True], nu[:-1] <= lk[1:]])
    level = int(lk[valid].max())
    base = np.minimum(nu, level)
    unsat = nu > level
    rem = int(budget - base.sum())
    plus = np.zeros(n, dtype=np.int64)
    if rem > 0 and unsat.any():
        hosts_unsat = q["host"].to_numpy(object)[unsat].astype(str)
        order = np.argsort(hosts_unsat, kind="stable")
        idx = np.flatnonzero(unsat)[order][:rem]
        plus[idx] = 1
    out = pd.DataFrame({"host": q["host"].astype(object),
                        "n_urls": nu, "allocated": base + plus})
    return out.sort_values("host", kind="stable").reset_index(drop=True)


# ---- per-host content quality profile ----

HOSTQ_FP = 10 ** 6


def host_quality_profile(pages: ray.data.Dataset) -> pd.DataFrame:
    """(host, n_pages, sum_quality_fp, mean_quality_fp): the composite
    ``quality_batch`` score of each crawled page's extracted text,
    rolled up per host — the "is this site worth recrawling" triage
    signal next to ``host_profile``/``host_mirror`` (a host whose mean
    quality sags is template spam regardless of its size). Each page's
    bit-exact IEEE score is floored to 1e-6 fixed point BEFORE summing,
    so the rollup is order-independent exact integers and the SQL
    mirror matches bit-for-bit.

    Scale shape: one streaming pass — quality + host extraction +
    per-host partial sums per batch (combiner) → ONE #hosts-bounded
    fold; html never leaves the scan."""
    from ray.data.aggregate import Sum
    from .text import quality_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(pd.DataFrame({
            "doc_id": np.arange(len(df), dtype=np.int64),
            "text": df["text"].astype(str)}))
        fp = np.floor(q["quality_score"].to_numpy(np.float64)
                      * HOSTQ_FP).astype(np.int64)
        host = (df["url"].astype(str)
                .str.extract(r"^https?://([^/?#]+)", expand=False)
                .fillna("").str.lower())
        g = pd.DataFrame({"host": host.to_numpy(object), "s": fp,
                          "n": np.ones(len(df), dtype=np.int64)}) \
            .groupby("host", sort=False, as_index=False).sum()
        g["s"] = g["s"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = (pages.select_columns(["url", "text"])
           .map_batches(partial, batch_format="pandas",
                        batch_size=16384)
           .groupby("host")
           .aggregate(Sum("s", alias_name="sum_quality_fp"),
                      Sum("n", alias_name="n_pages"))
           .to_pandas())                        # ≤ #hosts rows
    agg["n_pages"] = agg["n_pages"].astype(np.int64)
    agg["sum_quality_fp"] = agg["sum_quality_fp"].astype(np.int64)
    agg["mean_quality_fp"] = (agg["sum_quality_fp"].to_numpy(np.int64)
                              // np.maximum(agg["n_pages"]
                                            .to_numpy(np.int64), 1))
    return agg[["host", "n_pages", "sum_quality_fp",
                "mean_quality_fp"]].sort_values("host") \
        .reset_index(drop=True)


# ---- URL depth × content quality correlation ----

def depth_quality_correlation(pages: ray.data.Dataset) -> pd.DataFrame:
    """One row (n_pages, mean_depth_fp, mean_quality_fp, r): Pearson
    correlation between a page's URL path depth (number of '/'
    segments, query/fragment stripped) and its content quality score —
    the "does depth predict junk" readout that justifies (or kills)
    depth-capped crawl policies (`lib/traversalPolicy.js` depth
    limits). All five moments are EXACT integer sums (depth int,
    quality floored to 1e-6 fp), so both sides derive r from identical
    integers with one IEEE division chain at the end (the
    ``host_assortativity`` convention).

    Scale shape: one streaming pass → each batch folds to a single
    6-moment partial row → scalar Sum."""
    from ray.data.aggregate import Sum
    from .text import quality_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        path = (df["url"].astype(str)
                .str.replace(r"^https?://[^/?#]+", "", regex=True)
                .str.replace(r"[?#].*$", "", regex=True))
        x = path.str.count("/").to_numpy(np.int64)
        q = quality_batch(pd.DataFrame({
            "doc_id": np.arange(len(df), dtype=np.int64),
            "text": df["text"].astype(str)}))
        y = np.floor(q["quality_score"].to_numpy(np.float64)
                     * HOSTQ_FP).astype(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(df))], "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()], "sxx": [(x * x).sum()],
            "syy": [(y * y).sum()]})

    a = (pages.select_columns(["url", "text"])
         .map_batches(partial, batch_format="pandas", batch_size=16384)
         .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                    Sum("sy", alias_name="sy"),
                    Sum("sxy", alias_name="sxy"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("syy", alias_name="syy")))
    n, sx, sy = int(a["n"]), int(a["sx"]), int(a["sy"])
    sxy, sxx, syy = int(a["sxy"]), int(a["sxx"]), int(a["syy"])
    import math
    num = n * sxy - sx * sy        # python bigints: n·syy can pass 2^63
    den2x = n * sxx - sx * sx
    den2y = n * syy - sy * sy
    r = (float(num) / (math.sqrt(float(den2x)) * math.sqrt(float(den2y)))
         if den2x > 0 and den2y > 0 else 0.0)
    return pd.DataFrame({
        "n_pages": np.array([n], dtype=np.int64),
        "mean_depth_fp": np.array([10 ** 6 * sx // max(n, 1)],
                                  dtype=np.int64),
        "mean_quality_fp": np.array([sy // max(n, 1)], dtype=np.int64),
        "r": np.array([r], dtype=np.float64)})


# ---- DUST rule mining (Bar-Yossef et al., WWW 2007) ----

#: first path segment incl. leading slash — the rule alphabet
SEG_RE = r"^https?://[^/?#]+(/[^/?#]*)"


def dust_rules(pages: ray.data.Dataset,
               min_support: int = 1) -> ray.data.Dataset:
    """(host, seg_from, seg_to, support): candidate DUST rewrite rules
    — Different URLs with Similar (here: byte-identical) Text. For every
    same-host pair of urls serving identical content (equal md5(html)),
    the pair votes for the substitution between their first path
    segments (seg_from < seg_to lexically; equal segments are not a
    rewrite). support = number of such url pairs. The classic crawler
    dedup-at-the-frontier move: a high-support rule ("/dup/ ≡ /p/")
    lets the scheduler canonicalize urls BEFORE fetching ("do not crawl
    in the DUST", Bar-Yossef et al. 2007 §1; the reference reaches the
    same state only after fetch via its etag/304 path,
    `providers/fetcher/githubFetcher.js:26-84`).

    Scale shape: html never shuffles — each batch folds to slim
    (host, md5, seg) rows; ONE hash(host,md5) co-partition co-locates
    every content-duplicate cluster (clusters are tiny by nature), the
    per-cluster segment cross-products fold to rule partials, and a
    final rule-keyed Sum groupby over rule-cardinality rows finishes."""
    import hashlib

    from ray.data.aggregate import Sum

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        u = df["url"].astype(str)
        host = u.str.extract(r"^https?://([^/?#]+)", expand=False) \
            .fillna("").str.lower()
        seg = u.str.extract(SEG_RE, expand=False).fillna("")
        html = df["html"]
        if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
            ch = [hashlib.md5(b).hexdigest() for b in html]
        else:
            ch = [hashlib.md5(str(s).encode()).hexdigest() for s in html]
        out = pd.DataFrame({"host": host.to_numpy(dtype=object),
                            "h": np.asarray(ch, dtype=object),
                            "seg": seg.to_numpy(dtype=object)})
        out["part"] = (hash64_array(out["host"].str.cat(out["h"]))
                       % N_URL_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # per (host, content) cluster: segment multiplicities → each
        # unordered segment pair contributes n_a·n_b url pairs
        cnt = g.groupby(["host", "h", "seg"], sort=False).size() \
            .rename("n").reset_index()
        rows = []
        for (host, _), sub in cnt.groupby(["host", "h"], sort=False):
            if len(sub) < 2:
                continue
            segs = sub["seg"].to_numpy(dtype=object)
            ns = sub["n"].to_numpy(np.int64)
            o = np.argsort(segs)
            segs, ns = segs[o], ns[o]
            for i in range(len(segs) - 1):
                for j in range(i + 1, len(segs)):
                    rows.append((host, segs[i], segs[j],
                                 int(ns[i] * ns[j])))
        return pd.DataFrame(rows, columns=["host", "seg_from", "seg_to",
                                           "n"]) \
            .astype({"n": np.int64})

    agg = (pages.select_columns(["url", "html"])
           .map_batches(slim, batch_format="pandas")
           .groupby("part")
           .map_groups(lambda g: fold(g.drop(columns=["part"])),
                       batch_format="pandas")
           .groupby(["host", "seg_from", "seg_to"])
           .aggregate(Sum("n", alias_name="support")))
    if min_support > 1:
        agg = agg.filter(expr=f"support >= {min_support}")
    return agg


# ---- pagination family detection (link-header paginator analogue) ----

PAGE_RE = r"^(.*)[?&]page=([0-9]+)$"


def pagination_families(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(host, base_url, n_pages, min_page, max_page, has_base): every
    pagination family in the corpus — urls ending in ``?page=N`` (or
    ``&page=N``) grouped by their base url, with the page-number range
    and whether the bare base url itself was crawled. The analytical
    face of the reference's Link-header paginator (`providers/fetcher/
    githubFetcher.js:153-172` collectPages / M6): the crawler's "did I
    get every page of every listing?" audit (a family with has_base
    false or a gap in [min,max] is an incomplete traversal).

    Scale shape: one slim projection pass (member rows + url-presence
    rows, tagged), ONE base-url-hash co-partition; each family resolves
    vectorized inside its partition; output is family-cardinality."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        u = df["url"].astype(str)
        m = u.str.extract(PAGE_RE)
        is_m = m[0].notna()
        members = pd.DataFrame({
            "base": m.loc[is_m, 0].to_numpy(dtype=object),
            "pg": m.loc[is_m, 1].astype(np.int64).to_numpy(),
            "kind": np.int8(1)})
        present = pd.DataFrame({
            "base": u.to_numpy(dtype=object),
            "pg": np.int64(0), "kind": np.int8(0)})
        out = pd.concat([members, present], ignore_index=True)
        out["pg"] = out["pg"].astype(np.int64)
        out["part"] = (hash64_array(out["base"]) % N_URL_PARTS) \
            .astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        mem = g[g["kind"] == 1]
        if not len(mem):
            return pd.DataFrame({
                "host": pd.Series(dtype=object),
                "base_url": pd.Series(dtype=object),
                "n_pages": pd.Series(dtype=np.int64),
                "min_page": pd.Series(dtype=np.int64),
                "max_page": pd.Series(dtype=np.int64),
                "has_base": pd.Series(dtype=bool)})
        present = set(g.loc[g["kind"] == 0, "base"])
        agg = mem.groupby("base", sort=False)["pg"] \
            .agg(n_pages="nunique", min_page="min", max_page="max") \
            .reset_index()
        base = agg["base"].astype(str)
        host = base.str.extract(r"^https?://([^/?#]+)", expand=False) \
            .fillna("").str.lower()
        return pd.DataFrame({
            "host": host.to_numpy(dtype=object),
            "base_url": agg["base"].to_numpy(dtype=object),
            "n_pages": agg["n_pages"].to_numpy(np.int64),
            "min_page": agg["min_page"].to_numpy(np.int64),
            "max_page": agg["max_page"].to_numpy(np.int64),
            "has_base": np.fromiter((b in present for b in agg["base"]),
                                    dtype=bool, count=len(agg))})

    return (pages.select_columns(["url"])
            .map_batches(slim, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- recrawl priority (staleness × authority scheduler feed) ----

RECRAWL_REF_US = 1_751_328_000_000_000    # 2025-07-01T00:00:00Z in epoch µs
DAY_US = 86_400_000_000


def recrawl_priority(pages: ray.data.Dataset,
                     links: ray.data.Dataset) -> ray.data.Dataset:
    """(url, age_days, indegree, score_fp): the recrawl scheduler feed —
    staleness (whole days since the page's warc_ts, against a fixed
    reference instant) weighted with link authority (in-degree over the
    extracted link graph, capped at 100 so hubs don't monopolize the
    budget): score_fp = 10·age_days + min(indegree, 100). The static
    companion to ``ops/events.revisit_schedule``'s learned change rate —
    together they are the freshness half of the reference's traversal
    policies (`lib/traversalPolicy.js` N-days fetch decisions) turned
    into a rankable column.

    Scale shape: the relational tagged-union join — links fold to
    per-batch (dst, count) partials, pages to slim (url, ts) rows, ONE
    shared url-hash co-partition merges them vectorized; neither html
    nor full link rows shuffle."""
    def page_rows(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["warc_ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        out = pd.DataFrame({
            "url": df["url"].astype(str).to_numpy(dtype=object),
            "ts_us": ts,
            "n": np.zeros(len(df), dtype=np.int64),
            "kind": np.zeros(len(df), dtype=np.int8)})
        out["part"] = (hash64_array(out["url"]) % N_URL_PARTS) \
            .astype(np.int32)
        return out

    def link_rows(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("dst_url", sort=False).size().reset_index(name="n")
        out = pd.DataFrame({
            "url": c["dst_url"].astype(str).to_numpy(dtype=object),
            "ts_us": np.zeros(len(c), dtype=np.int64),
            "n": c["n"].to_numpy(np.int64),
            "kind": np.ones(len(c), dtype=np.int8)})
        out["part"] = (hash64_array(out["url"]) % N_URL_PARTS) \
            .astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["kind"] == 0]
        ind_map = g[g["kind"] == 1].groupby("url")["n"].sum()
        ind = p["url"].map(ind_map).fillna(0).to_numpy(np.int64)
        age = (RECRAWL_REF_US - p["ts_us"].to_numpy(np.int64)) // DAY_US
        return pd.DataFrame({
            "url": p["url"].to_numpy(dtype=object),
            "age_days": age, "indegree": ind,
            "score_fp": age * 10 + np.minimum(ind, 100)})

    return (pages.select_columns(["url", "warc_ts"])
            .map_batches(page_rows, batch_format="pandas")
            .union(links.select_columns(["src_url", "dst_url"])
                   .map_batches(link_rows, batch_format="pandas"))
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas"))


# ---- content-identity canonical url rewrite map ----

def canonical_url_map(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(url, canonical_url, group_size): the rewrite map content dedup
    implies — for every url whose bytes duplicate another page's, the
    lexicographically-smallest url of its md5 group and the group size.
    ``crawl_pages_exact_dedup`` keeps the winners; this emits the
    losers WITH their winner — the table a frontier canonicalizer (or a
    301-style redirect layer) actually consumes, and the per-url
    application of the segment-level ``dust_rules``.

    Scale shape: html folds to slim (md5, url) rows in the map pass;
    ONE content-hash co-partition resolves each duplicate group's min
    and size vectorized; output is duplicate-cardinality (empty on a
    dup-free corpus)."""
    import hashlib

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        ch = [hashlib.md5(bytes(b)).hexdigest() for b in df["html"]]
        out = pd.DataFrame({
            "h": np.asarray(ch, dtype=object),
            "url": df["url"].astype(str).to_numpy(dtype=object)})
        out["part"] = (hash64_array(out["h"]) % N_URL_PARTS) \
            .astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("h", sort=False)["url"] \
            .agg(canonical_url="min", group_size="size").reset_index()
        m = g.merge(grp, on="h")
        m = m[m["url"] != m["canonical_url"]]
        return pd.DataFrame({
            "url": m["url"].to_numpy(dtype=object),
            "canonical_url": m["canonical_url"].to_numpy(dtype=object),
            "group_size": m["group_size"].to_numpy(np.int64)})

    return (pages.select_columns(["url", "html"])
            .map_batches(slim, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: fold(g.drop(columns=["part"])),
                        batch_format="pandas"))
