"""Engine-side stage callables for the wave pipeline.

The wave does ONE full-row shuffle (groupby the coarse politeness
partition) plus slim aggregates:

    frontier.map_batches(PrepareBatch)             # vectorized, stateless
            .groupby("polite_part")                # the single exchange
            .map_groups(partition_stage)           # dedup+claim+probe+polite
            → slim etag aggregate / pull           # 304 winner detection
            .map_batches(ResolveEtags)             # content-dedup claim

Stage → reference parity (file:line into /root/reference):
- PrepareBatch: url canon (`lib/request.js:260-262`), malformed guard
  (`lib/crawler.js:328-332`), allow-list/deny-regex scope filters
  (`lib/crawler.js:578-599`), robots gating (visitor-map analogue,
  `lib/visitorMap.js:47-117`), not-before gating (`lib/crawler.js:73-86`).
- partition_stage: attenuation dedup (`providers/queuing/attenuatedQueue.
  js:24-52`), tracker-tag claim/bounce (`providers/queuing/
  redisRequestTracker.js:22-30,95-134`) via the shard pool, the fetch
  probe — bucket-pruned lookups against the pages_meta sidecar, the
  stand-in for HTTP fetch + doc-store lookup (`providers/fetcher/
  githubFetcher.js:18-109`, `providers/storage/storageDocStore.js:61-93`)
  — and token-bench politeness (`providers/fetcher/tokenFactory.js:81-93`,
  call caps `lib/crawlerFactory.js:74-76`) as per-host wave budgets with
  deterministic hot-host salting. html never enters any shuffle
  (SURVEY.md §7.4).
- ResolveEtags: etag/304 content dedup
  (`providers/fetcher/githubFetcher.js:26-84`).
- make_extract_stage: the processor stage (html → text + out-links,
  `providers/fetcher/githubProcessor.js:81-122` + per-type handlers) and
  doc-store upsert (`lib/crawler.js:470-485`) as idempotent partitioned
  Parquet (`providers/storage/storageDocStore.js:33-58`).
"""

from __future__ import annotations

import re
from functools import lru_cache
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..config import PRIORITY_RANK, CrawlConfig
from ..state.politeness import (ORDER_COLS, admit_first_n, group_budget,
                                host_budget, polite_salt)
from ..urls import (hash64_array, is_malformed_series, normalize_series,
                    split_host_path)
from .extract import (HREF_RE, TEXT_RE, extract_links_df,
                      extract_text_batch)


def _pages_bucket(path: str) -> pd.DataFrame:
    """One immutable pages bucket (url, html, lang). NOT cached: html is
    the fat column — caching it per worker multiplies to cluster-crushing
    memory (measured: 32 workers × all-bucket LRU ⇒ thrash, 3× slowdown).
    The extract stage is bucket-grouped, so each wave reads each bucket
    exactly once, in parallel."""
    return pq.read_table(path, columns=["url", "html", "lang"]).to_pandas()


@lru_cache(maxsize=256)
def _meta_series(path: str) -> pd.Series:
    """url → etag lookup Series for one immutable pages_meta bucket
    (worker-local cache; O(1) hash probes instead of per-group merges)."""
    if not Path(path).exists():
        return pd.Series(dtype=object)
    t = pq.read_table(path, columns=["url", "etag"]).to_pandas()
    return pd.Series(t["etag"].to_numpy(dtype=object),
                     index=t["url"].to_numpy(dtype=object))

#: columns a frontier row carries between waves (checkpoint schema)
FRONTIER_COLS = ["url", "priority", "rank", "seq", "attempt", "not_before",
                 "depth", "claimed", "discovered_from", "policy"]

FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()), ("priority", pa.string()), ("rank", pa.int8()),
    ("seq", pa.int64()), ("attempt", pa.int32()), ("not_before", pa.int64()),
    ("depth", pa.int32()), ("claimed", pa.bool_()), ("discovered_from", pa.string()),
    ("policy", pa.string()),
])

#: columns after PrepareBatch (frontier + derived + routing)
TAGGED_COLS = FRONTIER_COLS + ["host", "path", "url_hash", "bucket",
                               "outcome", "newly_claimed"]

#: slim per-row record pulled to the driver per wave (order log + routing)
ORDER_META = ["url", "host", "priority", "outcome", "attempt", "rank", "seq",
              "depth", "discovered_from", "bucket", "newly_claimed", "etag", "found"]


def frontier_table(df: pd.DataFrame) -> pa.Table:
    """Coerce to the canonical frontier Arrow schema so every union along
    the wave has an identical schema."""
    return pa.Table.from_pandas(df[FRONTIER_COLS], schema=FRONTIER_SCHEMA,
                                preserve_index=False)


class PrepareBatch:
    """Normalize + scope/robots filter + carry split (stateless, vectorized).

    Also assigns the wave's ONE shuffle key ``polite_key = host#salt``
    (salt from last wave's hot-host set): same url ⇒ same host ⇒ same salt
    (salt = url_hash % salt_factor), so a single host-keyed exchange
    co-locates everything the wave needs grouped — duplicate urls (in-wave
    dedup), per-host politeness budgets, and the claim/probe rows."""

    def __init__(self, cfg: CrawlConfig, robots_ref, clock: int,
                 n_buckets: int, hot_hosts: set[str] = frozenset()):
        self.cfg = cfg
        self.robots_ref = robots_ref
        self.clock = clock
        self.n_buckets = n_buckets
        self.hot_hosts = set(hot_hosts)
        self._robots = None
        self._deny = re.compile(cfg.deny_url_regex)

    def robots(self) -> dict:
        if self._robots is None:
            self._robots = ray.get(self.robots_ref)
        return self._robots

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        b = batch.copy()
        b["url"] = normalize_series(b["url"])
        host, path = split_host_path(b["url"])
        b["host"], b["path"] = host, path
        b["url_hash"] = hash64_array(b["url"].to_numpy(dtype=object))
        b["bucket"] = (b["url_hash"] % self.n_buckets).astype(np.int32)
        b["rank"] = b["priority"].map(PRIORITY_RANK).astype(np.int8)
        b["outcome"] = ""
        b["newly_claimed"] = False
        b.loc[b["not_before"] > self.clock, "outcome"] = "carry"
        ok = b["outcome"] == ""
        mal = is_malformed_series(b["url"]).to_numpy()
        b.loc[ok & mal, "outcome"] = "malformed"
        ok = b["outcome"] == ""
        in_scope = b["host"].str.endswith(tuple(cfg.allowed_host_suffixes))
        denied = b["url"].str.contains(self._deny)
        b.loc[ok & (~in_scope | denied), "outcome"] = "filtered"
        ok = b["outcome"] == ""
        if ok.any():
            robots = self.robots()
            rden = np.zeros(len(b), dtype=bool)
            hosts = b["host"].to_numpy()
            paths = b["path"].to_numpy()
            for h in pd.unique(hosts[ok.to_numpy()]):
                rule = robots.get(h)
                if not rule or not rule[2]:
                    continue
                sel = ok.to_numpy() & (hosts == h)
                for p in rule[2]:
                    rden[sel] |= np.char.startswith(paths[sel].astype(str), p)
            b.loc[rden, "outcome"] = "robots_denied"
        hot = b["host"].isin(self.hot_hosts).to_numpy() if self.hot_hosts \
            else np.zeros(len(b), dtype=bool)
        salt = np.where(hot, b["url_hash"].to_numpy() % cfg.salt_factor,
                        0).astype(np.int16)
        b["salt"] = salt
        # coarse co-group partition: all rows of one (host, salt) politeness
        # group — and hence all duplicates of one url — land in the same
        # partition; one partition holds MANY hosts so the shuffle has a
        # bounded number of int-keyed groups regardless of host count
        hh = hash64_array(b["host"].to_numpy(dtype=object))
        b["polite_part"] = ((hh + salt.astype(np.int64))
                            % cfg.n_polite_parts).astype(np.int32)
        return b[TAGGED_COLS + ["salt", "polite_part"]]


def make_partition_stage(pool, web_root: str, cfg: CrawlConfig, robots_ref,
                         hot_hosts: set[str], hot_dir: str | None = None,
                         etag_dir: str | None = None):
    """groupby('polite_part') — the wave's ONLY full-row shuffle, over a
    bounded number of int-keyed coarse partitions (cfg.n_polite_parts).
    One partition co-locates complete (host, salt) politeness groups and
    hence all duplicates of any url; within it, everything is vectorized
    across ALL its hosts (no per-host Python or RPC):

    1. in-wave dedup: first-by-ORDER_COLS per url (attenuation analogue,
       `providers/queuing/attenuatedQueue.js:24-52`);
    2. sharded claim: one vectorized RPC bundle per partition to the
       seen-set shards (`providers/queuing/redisRequestTracker.js:22-30`);
    3. fetch probe: bucket-pruned lookups into the cached pages_meta
       sidecars (`providers/fetcher/githubFetcher.js:18-109`,
       `providers/storage/storageDocStore.js:61-93`);
    4. politeness admission: candidates sorted by ORDER_COLS, position =
       cumcount within (host, salt), admitted iff position < that group's
       budget (token-bench analogue `providers/fetcher/tokenFactory.js:
       81-93`; salted budgets sum to the host budget, SURVEY.md §7.4);
       admitted-but-missing rows become fetch_error
       (`providers/fetcher/githubFetcher.js:44-87`)."""
    holder: dict = {}

    def _budgets(robots: dict) -> dict:
        wave_ms = cfg.wave_ms
        return {h: host_budget(r[0], r[1], wave_ms) for h, r in robots.items()}

    def partition_stage(g: pd.DataFrame) -> pd.DataFrame:
        if "budgets" not in holder:
            robots = ray.get(robots_ref)
            holder["budgets"] = _budgets(robots)
            holder["default_budget"] = host_budget(
                cfg.default_crawl_delay_ms, cfg.default_max_per_window,
                cfg.wave_ms)
        g = g.reset_index(drop=True)
        elig = (g["outcome"] == "") & ~g["claimed"]
        if elig.any():
            sub = g[elig].sort_values(ORDER_COLS, kind="stable")
            losers = sub.index[sub["url"].duplicated(keep="first")]
            g.loc[losers, "outcome"] = "dup_wave"
            todo = (g["outcome"] == "") & ~g["claimed"]
            if todo.any():
                new = pool.claim(g.loc[todo, "url_hash"].to_numpy(dtype=np.int64))
                idx = g.index[todo]
                g.loc[idx[new], "claimed"] = True
                g.loc[idx[new], "newly_claimed"] = True
                g.loc[idx[~new], "outcome"] = "bounced"
        et = np.full(len(g), None, dtype=object)
        for b, sub in g.groupby("bucket", sort=True):
            s = _meta_series(str(Path(web_root) / "pages_meta"
                                 / f"bucket={int(b)}" / "part-0.parquet"))
            et[sub.index] = s.reindex(sub["url"]).to_numpy()
        g["etag"] = pd.Series(et, index=g.index)
        g["found"] = g["etag"].notna()
        g["etag"] = g["etag"].fillna("")
        cand = (g["outcome"] == "") & g["claimed"]
        if hot_dir is not None:
            # hotness side-output: exact per-host candidate counts, one
            # tiny parquet per partition (deterministic name → task-retry
            # idempotent); the driver sums them — no extra aggregate exec
            hc = g.loc[cand, "host"].value_counts()
            d = Path(hot_dir)
            d.mkdir(parents=True, exist_ok=True)
            part = int(g["polite_part"].iloc[0])
            pq.write_table(
                pa.table({"host": hc.index.astype(str),
                          "n": hc.to_numpy(dtype=np.int64)}),
                d / f"part={part}.parquet")
        if cand.any():
            order = g[cand].sort_values(ORDER_COLS, kind="stable")
            pos = order.groupby(["host", "salt"], sort=False).cumcount() \
                .to_numpy()
            hb = order["host"].map(holder["budgets"]) \
                .fillna(holder["default_budget"]).to_numpy(dtype=np.int64)
            sf = cfg.salt_factor
            if hot_hosts:
                hot = order["host"].isin(hot_hosts).to_numpy()
                salt = order["salt"].to_numpy(dtype=np.int64)
                # salted_budgets(b, sf)[s] == b//sf + (s < b % sf)
                b_vec = np.where(hot, hb // sf + (salt < hb % sf), hb)
            else:
                b_vec = hb
            deferred = order.index[pos >= b_vec]
            g.loc[deferred, "outcome"] = "deferred"
            adm = (g["outcome"] == "") & g["claimed"]
            g.loc[adm & ~g["found"], "outcome"] = "fetch_error"
        if etag_dir is not None:
            # etag side-output: per-partition (etag, n, best candidate by
            # ORDER key) over admitted rows. The driver merges partitions
            # to find cross-partition competing etags + their winners —
            # replacing a full groupby(etag) aggregate execution per wave
            # (measured 15-25 s at ~1M rows). Volume is bounded by the
            # wave's politeness-admitted count.
            sub = g.loc[g["outcome"] == "",
                        ["etag", "url", "rank", "seq", "depth"]]
            agg = sub.sort_values(["rank", "seq", "depth"], kind="stable") \
                .groupby("etag", sort=False) \
                .agg(url=("url", "first"), rank=("rank", "first"),
                     seq=("seq", "first"), depth=("depth", "first"),
                     n=("url", "size")).reset_index()
            d = Path(etag_dir)
            d.mkdir(parents=True, exist_ok=True)
            part = int(g["polite_part"].iloc[0])
            pq.write_table(pa.Table.from_pandas(agg, preserve_index=False),
                           d / f"part={part}.parquet")
        return g

    partition_stage.__name__ = "partition_stage"
    return partition_stage


def route_next_frontier(df: pd.DataFrame, cfg: CrawlConfig,
                        clock: int) -> pa.Table:
    """Carry + deferred + retry rows of one resolved frame → next-wave
    frontier rows (requeue-delay semantics `lib/crawler.js:152-154`,
    attempt cap `lib/crawler.js:304-319`). Shared by the golden branch,
    the local fast path and the scale-mode side-output writer."""
    parts = []
    carry = df[df["outcome"] == "carry"]
    if len(carry):
        parts.append(carry[FRONTIER_COLS])
    dfr = df[df["outcome"] == "deferred"]
    if len(dfr):
        dfr = dfr.copy()
        dfr["not_before"] = clock + cfg.wave_ms
        parts.append(dfr[FRONTIER_COLS])
    err = df[df["outcome"] == "fetch_error"]
    if len(err):
        err = err.copy()
        err["attempt"] = (err["attempt"] + 1).astype(np.int32)
        err = err[err["attempt"] <= cfg.attempt_cap]
        if len(err):
            err["not_before"] = clock + cfg.requeue_delay_ms * err["attempt"]
            parts.append(err[FRONTIER_COLS])
    merged = pd.concat(parts, ignore_index=True) if parts else \
        pd.DataFrame(columns=FRONTIER_COLS)
    return frontier_table(merged)


class ResolveEtags:
    """Vectorized distributed etag resolution (semantics identical to
    mark_etag_winner + ClaimEtags, pinned by tests/test_parity.py).

    Inputs (broadcast refs): the set of *competing* etags this wave
    (> 1 candidate row, found via one hash-aggregate over a slim
    projection) and the pre-resolved winner url per competing etag (first
    by ORDER_COLS — the in-wave 304 rule,
    `providers/fetcher/githubFetcher.js:78-84`). Non-competing candidates
    are winners by construction, so the per-batch work is two hash-set
    probes + one shard-pool claim RPC — no per-group Python tasks."""

    def __init__(self, pool, competing_ref, winners_ref,
                 side_cfg: tuple | None = None):
        self.pool = pool
        self.competing_ref = competing_ref
        self.winners_ref = winners_ref
        #: scale-mode side outputs: (cfg, clock, wave, stats_dir, dead_dir,
        #: frontier_dir) — per-BLOCK deterministic files (task retries
        #: rewrite the same name/content), replacing a stats aggregate,
        #: the deadletter pull and three keep-branch re-reads per wave
        self.side_cfg = side_cfg
        self._cache = None

    def _maps(self):
        if self._cache is None:
            comp, win = self.competing_ref, self.winners_ref
            if isinstance(comp, ray.ObjectRef):
                comp = ray.get(comp)
            if isinstance(win, ray.ObjectRef):
                win = ray.get(win)
            self._cache = (comp, win)
        return self._cache

    @staticmethod
    def competing_and_winners(cur: pd.DataFrame) -> tuple[set, dict]:
        """Driver-side (local-path) equivalent of the distributed competing-
        etag aggregate + winner pull: etags with >1 candidate row and the
        first candidate per such etag by ORDER_COLS."""
        cand = cur["outcome"] == ""
        vc = cur.loc[cand, "etag"].value_counts()
        competing = set(vc.index[vc > 1])
        winners: dict = {}
        if competing:
            sub = cur[cand & cur["etag"].isin(competing)]
            w = sub.sort_values(ORDER_COLS, kind="stable").drop_duplicates("etag")
            winners = dict(zip(w["etag"], w["url"]))
        return competing, winners

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        competing, winner_url = self._maps()
        b = batch.copy()
        cand = (b["outcome"] == "").to_numpy()
        b["etag_winner"] = False
        if not cand.any():
            return b
        et = b["etag"].to_numpy(dtype=object)
        urls = b["url"].to_numpy(dtype=object)
        in_comp = np.fromiter((e in competing for e in et), dtype=bool,
                              count=len(b)) if competing else \
            np.zeros(len(b), dtype=bool)
        is_winner = cand & (~in_comp | np.fromiter(
            (winner_url.get(e) == u for e, u in zip(et, urls)),
            dtype=bool, count=len(b)))
        b.loc[cand & ~is_winner, "outcome"] = "not_modified"
        b.loc[is_winner, "etag_winner"] = True
        win = b["etag_winner"] & (b["outcome"] == "")
        if win.any():
            ehash = hash64_array(b.loc[win, "etag"].to_numpy(dtype=object))
            first = self.pool.claim_etags(ehash)
            idx = b.index[win]
            b.loc[idx[first], "outcome"] = "fetched"
            b.loc[idx[~first], "outcome"] = "not_modified"
        if self.side_cfg is not None:
            self._write_side(b)
        return b

    def _write_side(self, b: pd.DataFrame) -> None:
        cfg, clock, wave, stats_dir, dead_dir, frontier_dir = self.side_cfg
        # deterministic per-block name: blocks are disjoint partition-group
        # ranges, so (part range, rows, min url_hash) identifies a block
        # across retries without colliding between blocks
        parts = b["polite_part"].to_numpy()
        name = (f"b{int(parts.min())}-{int(parts.max())}"
                f"-{len(b)}-{int(b['url_hash'].min()) & 0xFFFFFF:x}")
        d = Path(stats_dir)
        d.mkdir(parents=True, exist_ok=True)
        s = b.groupby(["bucket", "outcome"]).size().rename("n").reset_index()
        pq.write_table(pa.Table.from_pandas(s, preserve_index=False),
                       d / f"{name}.parquet")
        mal = b[b["outcome"] == "malformed"]
        err = b[b["outcome"] == "fetch_error"]
        bumped = err["attempt"].astype(np.int32) + 1
        over = bumped > cfg.attempt_cap
        if len(mal) or bool(over.any()):
            dead = pd.concat([
                pd.DataFrame({"url": mal["url"].astype(str),
                              "reason": "malformed",
                              "attempt": mal["attempt"].astype(np.int32)}),
                pd.DataFrame({"url": err.loc[over, "url"].astype(str),
                              "reason": "attempt_cap",
                              "attempt": bumped[over]}),
            ], ignore_index=True)
            dead["wave"] = np.int32(wave)
            dd = Path(dead_dir)
            dd.mkdir(parents=True, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(dead, preserve_index=False),
                           dd / f"{name}.parquet")
        nf = route_next_frontier(b, cfg, clock)
        if nf.num_rows:
            fd = Path(frontier_dir)
            fd.mkdir(parents=True, exist_ok=True)
            pq.write_table(nf, fd / f"{name}.parquet")


def make_extract_stage(web_root: str, out_dir: str, wave: int):
    """groupby('bucket') over fetched rows: join html partition, extract
    text + links, write the pages_out partition idempotently, emit links."""

    def extract_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        pages = _pages_bucket(str(Path(web_root) / "pages"
                                  / f"bucket={b}" / "part-0.parquet"))
        j = g[["url", "seq", "rank", "depth", "etag"]].merge(pages, on="url", how="inner")
        t = pa.Table.from_pandas(j[["url", "html", "lang", "etag"]], preserve_index=False)
        t = extract_text_batch(t)
        t = t.append_column("wave", pa.array(np.full(len(t), wave, dtype=np.int32)))
        out = Path(out_dir) / "pages" / f"wave={wave}"
        out.mkdir(parents=True, exist_ok=True)
        pq.write_table(t.drop_columns(["html"]), out / f"bucket={b}.parquet")
        links = extract_links_df(j["url"], j["html"])
        links = links.merge(j[["url", "depth"]].rename(columns={"url": "src_url"}),
                            on="src_url", how="left")
        links["depth"] = links["depth"].astype(np.int32)
        links["wave"] = np.int32(wave)
        return links[["wave", "src_url", "dst_url", "link_index", "depth"]]

    extract_bucket.__name__ = "extract_bucket"
    return extract_bucket
