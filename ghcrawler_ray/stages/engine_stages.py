"""Engine-side stage callables for the wave pipeline.

Round-2 shape: one wave = ONE Ray Data execution — a linear chain of
stages over progressively slimmer rows, with every per-wave artifact
written as an idempotent side-output from inside the owning stage
(deterministic per-group filenames, so task retries rewrite the same
file instead of colliding):

    frontier.map_batches(PrepareBatch)             # vectorized, stateless
            .groupby("polite_part")                # shuffle 1: full slim rows
            .map_groups(partition_stage)           # dedup+claim+probe+polite
                → side: routing rows, deadletters, stats, hot counts,
                  (golden) order rows; RETURNS candidates only
            .groupby("etag_part")                  # shuffle 2: candidates
            .map_groups(resolve_stage)             # etag winner + 304 claim
                → side: stats, (golden) order rows; RETURNS fetched only
            .groupby("bucket")                     # shuffle 3: fetched
            .map_groups(extract_stage)             # html join, text, links
                → side: pages partition, links partition; RETURNS links
            .map_batches(links_to_frontier)
            .groupby("lpart").map_groups(dedup)    # shuffle 4: global dedup
            .write_parquet(next_frontier_dir)      # the one terminal

The round-1 design paid ~5 separate Ray executions per wave (prepare+
partition materialize, slim etag pull/aggregate barrier, resolve
materialize, extract materialize, link-dedup + frontier write); their
fixed scheduling latency was the serial floor that capped scaling
efficiency at 0.27. Chaining everything into one streaming execution
pays that cost once per wave.

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
- resolve_stage: etag/304 content dedup
  (`providers/fetcher/githubFetcher.js:26-84`): all wave candidates for
  one etag are co-located by the etag_part shuffle; the winner is the
  first by ORDER_COLS (the same tie-break as the oracle), claims the
  etag against the shard pool (first wave wins), losers → not_modified.
- make_extract_stage: the processor stage (html → text + out-links,
  `providers/fetcher/githubProcessor.js:81-122` + per-type handlers) and
  doc-store upsert (`lib/crawler.js:470-485`) as idempotent partitioned
  Parquet (`providers/storage/storageDocStore.js:33-58`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..config import PRIORITY_RANK, CrawlConfig
from ..state.politeness import ORDER_COLS, host_budget
from ..urls import (hash64_array, is_malformed_series, normalize_series,
                    split_host_path)
from .extract import extract_links_df, extract_text_batch


def _as_salt_map(hot_hosts, cfg: CrawlConfig) -> dict:
    """Normalize a hotness argument to the host → n_salts dict (adaptive
    salting, politeness.n_salts_for). Plain sets — legacy manifests and
    direct test callers — mean the fixed cfg.salt_factor per host."""
    if isinstance(hot_hosts, dict):
        return {h: int(n) for h, n in hot_hosts.items() if int(n) > 1}
    return {h: cfg.salt_factor for h in hot_hosts}


def _pages_bucket(path: str) -> pd.DataFrame:
    """One immutable pages bucket (url, html, lang). NOT cached: html is
    the fat column — caching it per worker multiplies to cluster-crushing
    memory (measured: 32 workers × all-bucket LRU ⇒ thrash, 3× slowdown).
    The extract stage is bucket-grouped, so each wave reads each bucket
    exactly once, in parallel."""
    return pq.read_table(path, columns=["url", "html", "lang"]).to_pandas()


@lru_cache(maxsize=256)
def _meta_lookup(path: str) -> tuple[np.ndarray, np.ndarray]:
    """COMPACT url → etag lookup for one immutable pages_meta bucket
    (worker-local cache): (sorted uint64 url-hash array, fixed-width
    etag bytes in the same order). Probes are vectorized searchsorted
    on the frontier's existing ``url_hash`` column; hash64 is already
    the engine's url identity (seen-set claims, etag claims), so no new
    identity assumption is introduced.

    Why not a pandas object-index Series (the round-4 shape): the sf10
    scale probe measured partition-stage workers at ~4.5 GB RSS — the
    per-worker LRU legitimately ends up holding EVERY bucket's meta
    (a polite_part group spans all url-hash buckets), and an
    object-index Series costs ~175 B/url (measured) vs ~40 B/url here
    (8 B hash + 32 B etag bytes): 20.7 M urls → 0.8 GB, not 4.5 GB,
    per worker."""
    if not Path(path).exists():
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype="S1"))
    t = pq.read_table(path, columns=["url", "etag"])
    h = hash64_array(t["url"].to_pandas()).astype(np.uint64)
    e = t["etag"].to_numpy(zero_copy_only=False).astype("S")
    order = np.argsort(h)
    return h[order], e[order]


def _meta_probe(path: str, url_hash: np.ndarray) -> np.ndarray:
    """etag (str) or None per probed url hash, via the compact cache."""
    hs, es = _meta_lookup(path)
    out = np.full(len(url_hash), None, dtype=object)
    if not len(hs) or not len(url_hash):
        return out
    q = url_hash.astype(np.uint64)
    idx = np.searchsorted(hs, q)
    idx_c = np.minimum(idx, len(hs) - 1)
    ok = hs[idx_c] == q
    if ok.any():
        out[ok] = es[idx_c[ok]].astype("U")
    return out

#: columns a frontier row carries between waves (checkpoint schema)
FRONTIER_COLS = ["url", "priority", "rank", "seq", "attempt", "not_before",
                 "depth", "claimed", "discovered_from", "policy", "cred"]

FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()), ("priority", pa.string()), ("rank", pa.int8()),
    ("seq", pa.int64()), ("attempt", pa.int32()), ("not_before", pa.int64()),
    ("depth", pa.int32()), ("claimed", pa.bool_()), ("discovered_from", pa.string()),
    ("policy", pa.string()), ("cred", pa.string()),
])

#: columns after PrepareBatch (frontier + derived + routing)
TAGGED_COLS = FRONTIER_COLS + ["host", "path", "url_hash", "bucket",
                               "outcome", "newly_claimed"]

#: slim per-row record for the golden order log (order sidecars + local path)
ORDER_META = ["url", "host", "priority", "outcome", "attempt", "rank", "seq",
              "depth", "discovered_from", "bucket", "newly_claimed", "etag", "found",
              "cred"]

#: columns the partition stage forwards for candidates (the etag shuffle)
CAND_COLS = ORDER_META + ["url_hash", "etag_hash", "etag_part", "policy"]

#: slim columns the resolve stage forwards for fetched rows (the extract
#: shuffle); policy rides along so child links inherit it
#: (`lib/request.js:146-165` getNextPolicy analogue)
FETCHED_COLS = ["url", "seq", "rank", "depth", "etag", "bucket", "policy"]

#: processing version stamped on stored docs (traversal-policy 'version'
#: freshness compares against this; see pipelines/reprocess.py)
PROCESSING_VERSION = 1


def frontier_table(df: pd.DataFrame) -> pa.Table:
    """Coerce to the canonical frontier Arrow schema so every union along
    the wave has an identical schema."""
    return pa.Table.from_pandas(df[FRONTIER_COLS], schema=FRONTIER_SCHEMA,
                                preserve_index=False)


@dataclass(frozen=True)
class WaveSide:
    """Per-wave side-output locations (all idempotent per-group files).

    ``order_dir`` is None in scale mode (no golden order artifact): the
    driver's only per-wave reads are then O(#hosts + #buckets×#outcomes)
    sidecar merges, never O(rows)."""
    wave: int
    clock: int
    nf_dir: str
    dead_dir: str
    stats_dir: str
    hot_dir: str
    order_dir: str | None


def _write_sidecar(d: str, name: str, df: pd.DataFrame) -> None:
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   p / f"{name}.parquet")


class PrepareBatch:
    """Normalize + scope/robots filter + carry split (stateless, vectorized).

    Also assigns the wave's first shuffle key ``polite_part`` (coarse
    (host, salt) co-group; salt from last wave's hot-host set): same url ⇒
    same host ⇒ same partition, so a single host-keyed exchange co-locates
    everything the wave needs grouped — duplicate urls (in-wave dedup),
    per-host politeness budgets, and the claim/probe rows."""

    def __init__(self, cfg: CrawlConfig, robots_ref, clock: int,
                 n_buckets: int, hot_hosts=frozenset()):
        self.cfg = cfg
        self.robots_ref = robots_ref
        self.clock = clock
        self.n_buckets = n_buckets
        # host → n_salts (adaptive, politeness.n_salts_for); a plain set
        # (legacy callers/tests) means the fixed cfg.salt_factor
        self.salts = _as_salt_map(hot_hosts, cfg)
        self._robots = None
        self._rules = None          # (ruled-host set, exploded host→prefix df)
        self._deny = re.compile(cfg.deny_url_regex)

    def robots(self) -> dict:
        if self._robots is None:
            self._robots = ray.get(self.robots_ref)
        return self._robots

    def _rule_frame(self) -> tuple[set, pd.DataFrame]:
        """Once per worker: robots disallow rules exploded to one
        (host, prefix) row each, plus the set of hosts that have any —
        the per-batch check is then one isin + one host merge instead of
        a Python loop over every distinct host (measured 66 µs/row at
        10k hosts, dominated by that loop)."""
        if self._rules is None:
            rows = [(h, p) for h, r in self.robots().items() for p in r[2]]
            df = pd.DataFrame(rows, columns=["host", "prefix"]) if rows else \
                pd.DataFrame({"host": [], "prefix": []})
            self._rules = (set(df["host"]), df)
        return self._rules

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        b = batch.copy()
        b["url"] = normalize_series(b["url"])
        host, path = split_host_path(b["url"])
        b["host"], b["path"] = host, path
        b["url_hash"] = hash64_array(b["url"])
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
            ruled_hosts, rules = self._rule_frame()
            if ruled_hosts:
                cand = ok & b["host"].isin(ruled_hosts)
                if cand.any():
                    sub = b.loc[cand, ["host", "path"]].reset_index()
                    m = sub.merge(rules, on="host")
                    if len(m):
                        hit = np.fromiter(
                            (p.startswith(q) for p, q in
                             zip(m["path"].tolist(), m["prefix"].tolist())),
                            dtype=bool, count=len(m))
                        b.loc[m.loc[hit, "index"].unique(),
                              "outcome"] = "robots_denied"
        if self.salts:
            ns = b["host"].map(self.salts).fillna(1).to_numpy(dtype=np.int64)
            salt = np.where(ns > 1, b["url_hash"].to_numpy() % ns,
                            0).astype(np.int16)
        else:
            salt = np.zeros(len(b), dtype=np.int16)
        b["salt"] = salt
        # coarse co-group partition: all rows of one (host, salt) politeness
        # group — and hence all duplicates of one url — land in the same
        # partition; one partition holds MANY hosts so the shuffle has a
        # bounded number of int-keyed groups regardless of host count
        hh = hash64_array(b["host"])
        b["polite_part"] = ((hh + salt.astype(np.int64))
                            % cfg.n_polite_parts).astype(np.int32)
        return b[TAGGED_COLS + ["salt", "polite_part"]]


def make_partition_stage(pool, web_root: str, cfg: CrawlConfig, robots_ref,
                         hot_hosts, side: WaveSide | None = None):
    """groupby('polite_part') — the wave's only FULL-row shuffle, over a
    bounded number of int-keyed coarse partitions (cfg.n_polite_parts).
    One partition co-locates complete (host, salt) politeness groups and
    hence all duplicates of any url; within it, everything is vectorized
    across ALL its hosts (no per-host Python or RPC):

    1. in-wave dedup: first-by-ORDER_COLS per url (attenuation analogue,
       `providers/queuing/attenuatedQueue.js:24-52`);
    2. sharded claim: one vectorized RPC bundle per partition to the
       seen-set shards (`providers/queuing/redisRequestTracker.js:22-30`);
       claims are wave-idempotent (retried tasks re-claim cleanly);
    3. fetch probe: bucket-pruned lookups into the cached pages_meta
       sidecars (`providers/fetcher/githubFetcher.js:18-109`,
       `providers/storage/storageDocStore.js:61-93`);
    4. politeness admission: candidates sorted by ORDER_COLS, position =
       cumcount within (host, salt), admitted iff position < that group's
       budget (token-bench analogue `providers/fetcher/tokenFactory.js:
       81-93`; salted budgets sum to the host budget, SURVEY.md §7.4);
       admitted-but-missing rows become fetch_error
       (`providers/fetcher/githubFetcher.js:44-87`).

    With ``side`` set (the distributed path), every finalized row is
    side-written here — routing (carry/deferred/retry) into the next
    frontier dir, deadletters, stats, hot-host counts, golden order rows
    — under the deterministic name ``p{polite_part}``, and only the
    admitted candidates are RETURNED (the etag shuffle input). Without
    ``side`` (the driver-local fast path) the full tagged frame is
    returned unchanged for the caller to route."""
    holder: dict = {}

    salts = _as_salt_map(hot_hosts, cfg)
    # trait-set auth rules (tokenFactory.js:41-70 _traitsMatch analogue):
    # first matching rule DEFINES a url's required credential class
    cred_rules = [(re.compile(rx), str(need))
                  for rx, need in cfg.effective_cred_rules()]

    def _budgets(robots: dict) -> dict:
        wave_ms = cfg.wave_ms
        return {h: host_budget(r[0], r[1], wave_ms) for h, r in robots.items()}

    def _class_budgets(c: str):
        """Lazily-built per-credential-class budget map (None = the class
        has no window override → use the host's robots/public budget)."""
        cls = holder["cls"]
        if c not in cls:
            w = cfg.cred_window(c)
            cls[c] = None if w is None else (
                {h: host_budget(r[0], w, cfg.wave_ms)
                 for h, r in holder["robots"].items()},
                host_budget(cfg.default_crawl_delay_ms, w, cfg.wave_ms))
        return cls[c]

    def partition_stage(g: pd.DataFrame) -> pd.DataFrame:
        if "budgets" not in holder:
            robots = ray.get(robots_ref)
            holder["robots"] = robots
            holder["budgets"] = _budgets(robots)
            holder["default_budget"] = host_budget(
                cfg.default_crawl_delay_ms, cfg.default_max_per_window,
                cfg.wave_ms)
            holder["cls"] = {}
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
            et[sub.index] = _meta_probe(
                str(Path(web_root) / "pages_meta"
                    / f"bucket={int(b)}" / "part-0.parquet"),
                sub["url_hash"].to_numpy(dtype=np.int64))
        g["etag"] = pd.Series(et, index=g.index)
        g["found"] = g["etag"].notna()
        g["etag"] = g["etag"].fillna("")
        cand = (g["outcome"] == "") & g["claimed"]
        part = int(g["polite_part"].iloc[0]) if len(g) else 0
        if side is not None:
            # hotness side-output: exact per-host candidate counts, one
            # tiny parquet per partition (deterministic name → task-retry
            # idempotent); the driver sums them — no extra aggregate exec
            hc = g.loc[cand, "host"].value_counts()
            _write_sidecar(side.hot_dir, f"p{part}", pd.DataFrame(
                {"host": hc.index.astype(str),
                 "n": hc.to_numpy(dtype=np.int64)}))
        if cand.any():
            order = g[cand].sort_values(ORDER_COLS, kind="stable")
            # politeness groups are per (host, salt, CRED): each
            # credential class has its own bench (trait-set analogue).
            # All-public waves (the common case: no auth rules fired and
            # no seed pinned a class) skip the extra string groupby key —
            # string-key groupbys measurably dominate this stage's time
            creds = order["cred"].to_numpy()
            multi_cred = bool((creds != "public").any())
            if multi_cred:
                pos = order.groupby(["host", "salt", "cred"], sort=False) \
                    .cumcount().to_numpy()
            else:
                pos = order.groupby(["host", "salt"], sort=False) \
                    .cumcount().to_numpy()
            hb = order["host"].map(holder["budgets"]) \
                .fillna(holder["default_budget"]).to_numpy(dtype=np.int64)
            if multi_cred:
                for c in pd.unique(creds[creds != "public"]):
                    bm = _class_budgets(str(c))
                    if bm is None:   # class without a window override
                        continue
                    m = creds == c
                    hb[m] = order.loc[m, "host"].map(bm[0]) \
                        .fillna(bm[1]).to_numpy(dtype=np.int64)
            if salts:
                ns = order["host"].map(salts).fillna(1) \
                    .to_numpy(dtype=np.int64)
                salt = order["salt"].to_numpy(dtype=np.int64)
                # salted_budgets(b, ns)[s] == b//ns + (s < b % ns)
                b_vec = np.where(ns > 1, hb // ns + (salt < hb % ns), hb)
            else:
                b_vec = hb
            deferred = order.index[pos >= b_vec]
            g.loc[deferred, "outcome"] = "deferred"
            adm = (g["outcome"] == "") & g["claimed"]
            if cred_rules:
                # 401/403 analogue: the first matching rule defines the
                # url's required class; any OTHER class is rejected
                # before any content question is asked
                req = np.full(len(g), "", dtype=object)
                unmatched = np.ones(len(g), dtype=bool)
                for rx, need in cred_rules:
                    m = unmatched & g["url"].str.contains(rx).to_numpy()
                    req[m] = need
                    unmatched &= ~m
                g["need_cred"] = req
                deny = (req != "") & (g["cred"].to_numpy() != req)
                g.loc[adm & deny, "outcome"] = "auth_denied"
                adm = (g["outcome"] == "") & g["claimed"]
            g.loc[adm & ~g["found"], "outcome"] = "fetch_error"
        if side is None:
            return g
        # ---- distributed path: side-write everything finalized here ----
        name = f"p{part}"
        done = g[g["outcome"] != ""]
        write_stats(side.stats_dir, name, done)
        write_deadletters(side.dead_dir, name, done, cfg, side.wave)
        nf = route_next_frontier(g, cfg, side.clock)
        if nf.num_rows:
            d = Path(side.nf_dir)
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(nf, d / f"{name}.parquet")
        if side.order_dir is not None:
            rows = done[done["outcome"] != "carry"]
            if len(rows):
                _write_sidecar(side.order_dir, name, rows[ORDER_META])
        out = g[g["outcome"] == ""].copy()
        ehash = hash64_array(out["etag"]) if len(out) else \
            np.empty(0, dtype=np.int64)
        out["etag_hash"] = ehash
        out["etag_part"] = (ehash % cfg.n_polite_parts).astype(np.int32)
        return out[CAND_COLS]

    partition_stage.__name__ = "partition_stage"
    return partition_stage


def write_stats(stats_dir: str, name: str, done: pd.DataFrame) -> None:
    """(bucket, outcome, n) sidecar for the rows finalized by one group
    task (excluding carry — carried rows are not processed this wave, so
    they are not part of the wave's metrics, matching the oracle)."""
    rows = done[done["outcome"] != "carry"]
    s = rows.groupby(["bucket", "outcome"]).size().rename("n").reset_index()
    if len(s):
        _write_sidecar(stats_dir, name, s)


def write_deadletters(dead_dir: str, name: str, done: pd.DataFrame,
                      cfg: CrawlConfig, wave: int) -> None:
    """Deadletter sidecar (`lib/crawler.js:523-557`): malformed rows now;
    attempt-capped fetch errors with the bumped attempt count."""
    mal = done[done["outcome"] == "malformed"]
    err = done[done["outcome"] == "fetch_error"]
    # auth_denied rows deadletter only when the privileged retry is off
    ad = done[done["outcome"] == "auth_denied"] if not cfg.elevated_retry \
        else done.iloc[0:0]
    bumped = err["attempt"].astype(np.int32) + 1
    over = bumped > cfg.attempt_cap
    if len(mal) or len(ad) or bool(over.any()):
        dead = pd.concat([
            pd.DataFrame({"url": mal["url"].astype(str),
                          "reason": "malformed",
                          "attempt": mal["attempt"].astype(np.int32)}),
            pd.DataFrame({"url": err.loc[over, "url"].astype(str),
                          "reason": "attempt_cap",
                          "attempt": bumped[over]}),
            pd.DataFrame({"url": ad["url"].astype(str),
                          "reason": "auth_denied",
                          "attempt": ad["attempt"].astype(np.int32)}),
        ], ignore_index=True)
        dead["wave"] = np.int32(wave)
        _write_sidecar(dead_dir, name, dead)


def route_next_frontier(df: pd.DataFrame, cfg: CrawlConfig,
                        clock: int) -> pa.Table:
    """Carry + deferred + retry rows of one frame → next-wave frontier
    rows (requeue-delay semantics `lib/crawler.js:152-154`, attempt cap
    `lib/crawler.js:304-319`). Shared by the partition stage's side-write
    and the local fast path."""
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
    if cfg.elevated_retry:
        ad = df[df["outcome"] == "auth_denied"]
        if len(ad):
            # one privileged retry (`githubFetcher.js:67-72` analogue):
            # same attempt count, the RULE'S required class (trait-set
            # generality — 'elevated' for the protected_url_regex sugar),
            # normal requeue delay
            ad = ad.copy()
            if "need_cred" in ad.columns:
                nc = ad["need_cred"].astype(str)
                ad["cred"] = nc.where(nc != "", "elevated")
            else:
                ad["cred"] = "elevated"
            ad["not_before"] = clock + cfg.requeue_delay_ms
            parts.append(ad[FRONTIER_COLS])
    merged = pd.concat(parts, ignore_index=True) if parts else \
        pd.DataFrame(columns=FRONTIER_COLS)
    return frontier_table(merged)


def resolve_etag_frame(g: pd.DataFrame, pool) -> pd.DataFrame:
    """Etag/304 resolution over a frame that contains ALL of the wave's
    candidate rows for every etag it holds (the etag_part shuffle — or,
    on the local path, the whole wave). Semantics identical to the
    oracle (`providers/fetcher/githubFetcher.js:26-84` analogue):

    - in-wave winner per etag = first candidate by ORDER_COLS (the full
      tie-break, including discovered_from — shared with the oracle);
    - the winner claims the etag against the shard pool: first claim
      across all waves → 'fetched'; already claimed → 'not_modified';
    - in-wave losers → 'not_modified';
    - EXCEPT freshness='always' policies (traversal policy
      `lib/traversalPolicy.js:170-174` — always/reprocessAlways): those
      rows process no matter what, bypassing the 304 short-circuit; the
      etag store is still updated through the group's winner claim.

    Vectorized across ALL etags in the frame: one sort + one claim RPC
    bundle, never per-etag Python."""
    from ..policy import is_always
    cand = (g["outcome"] == "").to_numpy()
    if not cand.any():
        return g
    sub = g[cand].sort_values(["etag"] + ORDER_COLS, kind="stable")
    winner_idx = sub.index[~sub["etag"].duplicated(keep="first").to_numpy()]
    g.loc[g.index[cand], "outcome"] = "not_modified"
    if "etag_hash" in g.columns:
        ehash = g.loc[winner_idx, "etag_hash"].to_numpy(dtype=np.int64)
    else:
        ehash = hash64_array(g.loc[winner_idx, "etag"])
    first = pool.claim_etags(ehash)
    g.loc[winner_idx[first], "outcome"] = "fetched"
    alw = cand & g["policy"].map(is_always).to_numpy(dtype=bool)
    if alw.any():
        g.loc[g.index[alw], "outcome"] = "fetched"
    return g


def make_resolve_stage(pool, cfg: CrawlConfig, side: WaveSide):
    """groupby('etag_part') — the wave's second (candidate-only) shuffle:
    co-locates every candidate of one etag, resolves winners + the 304
    claim vectorized across etags, side-writes its stats/order rows, and
    returns only the fetched rows (slim FETCHED_COLS) for the extract
    shuffle."""

    def resolve_stage(g: pd.DataFrame) -> pd.DataFrame:
        g = resolve_etag_frame(g.reset_index(drop=True), pool)
        part = int(g["etag_part"].iloc[0]) if len(g) else 0
        name = f"e{part}"
        write_stats(side.stats_dir, name, g)
        if side.order_dir is not None and len(g):
            _write_sidecar(side.order_dir, name, g[ORDER_META])
        return g.loc[g["outcome"] == "fetched", FETCHED_COLS]

    resolve_stage.__name__ = "resolve_stage"
    return resolve_stage


def make_extract_stage(web_root: str, out_dir: str, wave: int):
    """groupby('bucket') over fetched rows: join html partition, extract
    text + links, write the pages_out partition and the links partition
    idempotently, emit links rows for the frontier conversion."""

    def extract_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        pages = _pages_bucket(str(Path(web_root) / "pages"
                                  / f"bucket={b}" / "part-0.parquet"))
        j = g[["url", "seq", "rank", "depth", "etag", "policy"]] \
            .merge(pages, on="url", how="inner")
        t = pa.Table.from_pandas(j[["url", "html", "lang", "etag"]], preserve_index=False)
        t = extract_text_batch(t)
        t = t.append_column("wave", pa.array(np.full(len(t), wave, dtype=np.int32)))
        t = t.append_column("version", pa.array(
            np.full(len(t), PROCESSING_VERSION, dtype=np.int32)))
        out = Path(out_dir) / "pages" / f"wave={wave}"
        out.mkdir(parents=True, exist_ok=True)
        pq.write_table(t.drop_columns(["html"]), out / f"bucket={b}.parquet")
        # per-upsert delta/changelog sink (`providers/storage/deltaStore.
        # js:26-31,102-114` analogue): slim append-only (url, etag,
        # change, wave) partition per store write
        if len(j):
            _write_sidecar(str(Path(out_dir) / "delta" / f"wave={wave}"),
                           f"bucket={b}", pd.DataFrame({
                               "url": j["url"].astype(str),
                               "etag": j["etag"].astype(str),
                               "change": "new",
                               "wave": np.int32(wave)}))
        links = extract_links_df(j["url"], j["html"])
        links = links.merge(
            j[["url", "depth", "policy"]].rename(columns={"url": "src_url"}),
            on="src_url", how="left")
        links["depth"] = links["depth"].astype(np.int32)
        links["wave"] = np.int32(wave)
        links = links[["wave", "src_url", "dst_url", "link_index", "depth",
                       "policy"]]
        if len(links):
            _write_sidecar(str(Path(out_dir) / "links" / f"wave={wave}"),
                           f"bucket={b}", links)
        return links

    extract_bucket.__name__ = "extract_bucket"
    return extract_bucket
