"""Sequential reference-semantics oracle — the golden source for parity.

This is the analogue of running the reference crawler single-loop with a
seeded RNG (SURVEY.md §7.4 "ordering parity", §5 test plan (c)): a pure
sequential pandas implementation of the wave semantics — priority ranks
(`providers/queuing/queueSet.js:46-65` determinized), malformed guard
(`lib/crawler.js:328-332`), scope + deny filters (`lib/crawler.js:578-599`),
enqueue dedup (`providers/queuing/redisRequestTracker.js`), per-host
politeness budgets (`providers/fetcher/tokenFactory.js:81-93`), etag/304
content dedup (`providers/fetcher/githubFetcher.js:26-84`), attempt-cap
deadletter (`lib/crawler.js:304-319`), and link expansion
(`providers/fetcher/githubProcessor.js:58-122`).

It shares only *scalar* definitions with the engine (url normalization,
hash64, budget/salting formulas, extractor regexes); all orchestration —
queues, dedup sets, politeness ledgers, the wave loop itself — is
independent sequential code, so an engine bug cannot cancel out.

Outputs (FIXTURES.md §4 golden tables):
  order:      wave, seq_in_wave, url, host, priority, outcome, attempt
  seen:       url, first_wave, etag
  deadletter: url, reason, attempt, wave
  links:      wave, src_url, dst_url, link_index
  pages_out:  url, text, lang, etag, wave
  metrics:    wave, outcome, n
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..policy import is_always
from ..frontier import (FRONTIER_COLS, dedup_discovered,
                        links_to_frontier, seeds_to_frontier)
from ..stages.extract import extract_links_df, extract_text
from ..state.politeness import (ORDER_COLS, admit_first_n, group_budget,
                                host_budget, polite_salt, salt_map)
from ..urls import (hash64_array, is_malformed_series, normalize_series,
                    split_host_path)


def load_web(root: str | Path) -> dict[str, pd.DataFrame]:
    root = Path(root)
    pages = pq.read_table(sorted((root / "pages").glob("bucket=*/part-0.parquet"))).to_pandas()
    meta = pq.read_table(sorted((root / "pages_meta").glob("bucket=*/part-0.parquet"))).to_pandas()
    pages = pages.merge(meta[["url", "etag"]], on="url", how="left")
    seeds = pq.read_table(root / "seeds.parquet").to_pandas()
    robots = pq.read_table(root / "robots.parquet").to_pandas()
    return {"pages": pages, "seeds": seeds, "robots": robots}



class SequentialOracle:
    def __init__(self, web: dict[str, pd.DataFrame], cfg: CrawlConfig | None = None,
                 inject: dict[int, pd.DataFrame] | None = None,
                 patches: dict[int, dict] | None = None):
        self.inject = inject or {}
        self.patches = {int(k): dict(v) for k, v in (patches or {}).items()}
        self.cfg = cfg or CrawlConfig()
        self.pages = web["pages"].set_index("url", drop=False)
        self.seeds = web["seeds"]
        self.robots = {
            r.host: (int(r.crawl_delay_ms), int(r.max_per_window), tuple(r.disallow_prefixes))
            for r in web["robots"].itertuples()
        }
        self.deny_re = re.compile(self.cfg.deny_url_regex)
        self.cred_rules = [(re.compile(rx), str(c))
                           for rx, c in self.cfg.effective_cred_rules()]

    def _robots_denied(self, host: str, path: str) -> bool:
        rule = self.robots.get(host)
        if not rule:
            return False
        return any(path.startswith(p) for p in rule[2])

    def _budget(self, host: str, cred: str = "public") -> int:
        delay, maxw, _ = self.robots.get(
            host, (self.cfg.default_crawl_delay_ms, self.cfg.default_max_per_window, ()))
        w = self.cfg.cred_window(cred)
        if w is not None:
            # non-public class: same robots delay, class-specific window
            # (token trait-set analogue — see CrawlConfig.cred_windows)
            maxw = w
        return host_budget(delay, maxw, self.cfg.wave_ms)

    def run(self) -> dict[str, pd.DataFrame]:
        cfg = self.cfg
        frontier = seeds_to_frontier(self.seeds)
        clock, wave = 0, 0
        seen: dict[str, int] = {}
        seen_etag: dict[str, str] = {}
        etag_first: set[str] = set()
        hot_prev: dict[str, int] = {}  # host → n_salts from the previous wave
        order_rows, dead_rows, link_frames, page_rows, metric_rows = [], [], [], [], []

        while wave < cfg.max_waves:
            if wave in self.patches:
                # hot-config hook (engine: CrawlEngine(patches=...) /
                # the config_patches file channel)
                import dataclasses as _dc
                patch = {k: (tuple(v) if isinstance(
                    getattr(cfg, k), tuple) and not isinstance(v, tuple)
                    else v) for k, v in self.patches[wave].items()}
                self.cfg = cfg = _dc.replace(cfg, **patch)
                self.deny_re = re.compile(cfg.deny_url_regex)
                self.cred_rules = [(re.compile(rx), str(c))
                                   for rx, c in cfg.effective_cred_rules()]
            if wave in self.inject:
                # webhook-analogue mid-crawl seed injection (identical
                # hook on the engine: CrawlEngine(inject=...))
                frontier = pd.concat(
                    [frontier, seeds_to_frontier(self.inject[wave])],
                    ignore_index=True)
            if not len(frontier):
                break
            mn = int(frontier["not_before"].min())
            if mn > clock:  # nothing eligible: fast-forward (polling-delay analogue)
                clock = mn
            df = frontier.reset_index(drop=True).copy()
            eligible = df["not_before"] <= clock
            carry = df[~eligible]
            cur = df[eligible].copy()

            cur["url"] = normalize_series(cur["url"])
            host, path = split_host_path(cur["url"])
            cur["host"], cur["path"] = host, path
            cur["url_hash"] = hash64_array(cur["url"].to_numpy(dtype=object))
            cur["outcome"] = ""

            mal = is_malformed_series(cur["url"]).to_numpy()
            cur.loc[mal, "outcome"] = "malformed"
            ok = cur["outcome"] == ""
            in_scope = cur["host"].str.endswith(tuple(cfg.allowed_host_suffixes))
            denied = cur["url"].str.contains(self.deny_re)
            cur.loc[ok & (~in_scope | denied), "outcome"] = "filtered"
            ok = cur["outcome"] == ""
            rdenied = cur.apply(lambda r: self._robots_denied(r["host"], r["path"]), axis=1) \
                if len(cur) else pd.Series(dtype=bool)
            cur.loc[ok & rdenied, "outcome"] = "robots_denied"

            # in-wave dedup of unclaimed rows (first by ORDER_COLS)
            ok = (cur["outcome"] == "") & ~cur["claimed"]
            sub = cur[ok].sort_values(ORDER_COLS, kind="stable")
            losers = sub.index[sub["url"].duplicated(keep="first")]
            cur.loc[losers, "outcome"] = "dup_wave"

            # claim against global seen set
            ok = (cur["outcome"] == "") & ~cur["claimed"]
            for i in cur.index[ok]:
                u = cur.at[i, "url"]
                if u in seen:
                    cur.at[i, "outcome"] = "bounced"
                else:
                    seen[u] = wave
                    cur.at[i, "claimed"] = True

            # politeness: per-host budget, hot-host salting (hotness from
            # the previous wave's candidate counts — shared contract with
            # the engine, see state/politeness.py)
            cand = cur[(cur["outcome"] == "") & cur["claimed"]].copy()
            deferred_idx = []
            if len(cand):
                cand["salt"] = 0
                for h, g in cand.groupby("host", sort=False):
                    ns = hot_prev.get(h, 1)
                    cand.loc[g.index, "salt"] = polite_salt(
                        g["url_hash"].to_numpy(), ns > 1, ns)
                for (h, s, c), g in cand.groupby(["host", "salt", "cred"],
                                                 sort=False):
                    ns = hot_prev.get(h, 1)
                    b = group_budget(self._budget(h, str(c)), ns > 1, ns,
                                     int(s))
                    mask = admit_first_n(g, b)
                    deferred_idx.extend(g.index[~mask])
            cur.loc[deferred_idx, "outcome"] = "deferred"
            hot_prev = salt_map(cand.groupby("host").size(), cfg) \
                if len(cand) else {}

            # auth gate (401/403 analogue): the FIRST matching rule
            # defines a url's required credential class; any other class
            # is rejected before the fetch probe (tokenFactory trait-set
            # semantics — shared rule order with the engine)
            cur["need_cred"] = ""
            if self.cred_rules and len(cur):
                req = np.full(len(cur), "", dtype=object)
                unmatched = np.ones(len(cur), dtype=bool)
                for rx, need in self.cred_rules:
                    m = unmatched & cur["url"].str.contains(rx).to_numpy()
                    req[m] = need
                    unmatched &= ~m
                cur["need_cred"] = req
                deny = pd.Series((req != "") & (cur["cred"].to_numpy() != req),
                                 index=cur.index)
                cur.loc[(cur["outcome"] == "") & cur["claimed"] & deny,
                        "outcome"] = "auth_denied"

            # fetch probe against the pages table
            adm = cur[(cur["outcome"] == "") & cur["claimed"]]
            known = adm["url"].isin(self.pages.index)
            cur.loc[adm.index[~known], "outcome"] = "fetch_error"

            # content dedup (etag / 304 analogue)
            found = cur.loc[adm.index[known]].copy()
            if len(found):
                found["etag"] = self.pages.loc[found["url"], "etag"].to_numpy()
                for i in found.index:
                    seen_etag[found.at[i, "url"]] = found.at[i, "etag"]
                w = found.sort_values(ORDER_COLS, kind="stable")
                first_in_wave = ~w["etag"].duplicated(keep="first")
                for i in w.index:
                    e = w.at[i, "etag"]
                    newly = first_in_wave.loc[i] and e not in etag_first
                    if newly:
                        etag_first.add(e)
                    # freshness='always' bypasses the 304 short-circuit
                    # (`lib/traversalPolicy.js:170-174`)
                    if newly or is_always(w.at[i, "policy"]):
                        cur.at[i, "outcome"] = "fetched"
                    else:
                        cur.at[i, "outcome"] = "not_modified"

            # extract + expand on fetched rows
            fetched = cur[cur["outcome"] == "fetched"]
            new_frontier = pd.DataFrame(columns=FRONTIER_COLS)
            if len(fetched):
                rows = self.pages.loc[fetched["url"]]
                for u, r in zip(fetched["url"], rows.itertuples()):
                    page_rows.append((u, extract_text(r.html), r.lang, r.etag, wave))
                links = extract_links_df(rows["url"], rows["html"])
                if len(links):
                    links = links.merge(fetched[["url", "depth", "policy"]],
                                        left_on="src_url", right_on="url", how="left")
                    link_frames.append(links.assign(wave=wave)[
                        ["wave", "src_url", "dst_url", "link_index"]])
                    new_frontier = dedup_discovered(links_to_frontier(
                        links, links["depth"], clock, cfg))
                    if cfg.discovery_seen_filter and len(new_frontier):
                        # discovery-time seen filter (engine: bloom
                        # pre-check + frozen-view exact confirm): drop
                        # links whose target was claimed BEFORE this wave
                        drop = np.fromiter(
                            (seen.get(u, wave) < wave
                             for u in new_frontier["url"]),
                            dtype=bool, count=len(new_frontier))
                        new_frontier = new_frontier[~drop] \
                            .reset_index(drop=True)

            # retries / deadletters
            carries = [carry[FRONTIER_COLS]]
            dfr = cur[cur["outcome"] == "deferred"].copy()
            if len(dfr):
                dfr["not_before"] = clock + cfg.wave_ms
                carries.append(dfr[FRONTIER_COLS])
            err = cur[cur["outcome"] == "fetch_error"].copy()
            if len(err):
                err["attempt"] = err["attempt"] + 1
                dead = err[err["attempt"] > cfg.attempt_cap]
                for r in dead.itertuples():
                    dead_rows.append((r.url, "attempt_cap", int(r.attempt), wave))
                retry = err[err["attempt"] <= cfg.attempt_cap].copy()
                if len(retry):
                    retry["not_before"] = clock + cfg.requeue_delay_ms * retry["attempt"]
                    carries.append(retry[FRONTIER_COLS])
            ad = cur[cur["outcome"] == "auth_denied"].copy()
            if len(ad):
                if cfg.elevated_retry:
                    # one privileged retry, same attempt count, the
                    # rule's required class
                    nc = ad["need_cred"].astype(str)
                    ad["cred"] = nc.where(nc != "", "elevated")
                    ad["not_before"] = clock + cfg.requeue_delay_ms
                    carries.append(ad[FRONTIER_COLS])
                else:
                    for r in ad.itertuples():
                        dead_rows.append((r.url, "auth_denied",
                                          int(r.attempt), wave))
            for r in cur[cur["outcome"] == "malformed"].itertuples():
                dead_rows.append((r.url, "malformed", int(r.attempt), wave))
            if len(new_frontier):
                carries.append(new_frontier)

            # order log + metrics for this wave
            logd = cur.sort_values(ORDER_COLS, kind="stable").reset_index(drop=True)
            for j, r in enumerate(logd.itertuples()):
                order_rows.append((wave, j, r.url, r.host, r.priority, r.outcome,
                                   int(r.attempt)))
            for oc, n in logd["outcome"].value_counts().items():
                metric_rows.append((wave, oc, int(n)))

            frontier = pd.concat(carries, ignore_index=True) if carries else \
                pd.DataFrame(columns=FRONTIER_COLS)
            frontier = frontier[FRONTIER_COLS]
            clock += cfg.wave_ms
            wave += 1

        order = pd.DataFrame(order_rows, columns=[
            "wave", "seq_in_wave", "url", "host", "priority", "outcome", "attempt"])
        seen_df = pd.DataFrame(
            {"url": list(seen), "first_wave": list(seen.values())})
        seen_df["etag"] = seen_df["url"].map(seen_etag)
        links = pd.concat(link_frames, ignore_index=True) if link_frames else \
            pd.DataFrame(columns=["wave", "src_url", "dst_url", "link_index"])
        return {
            "order": order,
            "seen": seen_df.sort_values("url").reset_index(drop=True),
            "deadletter": pd.DataFrame(dead_rows, columns=["url", "reason", "attempt", "wave"]),
            "links": links,
            "pages_out": pd.DataFrame(page_rows, columns=["url", "text", "lang", "etag", "wave"]),
            "metrics": pd.DataFrame(metric_rows, columns=["wave", "outcome", "n"]),
        }
