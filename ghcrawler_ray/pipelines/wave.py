"""The wave-loop crawl engine — Ray-Data-native frontier scheduler.

Target shape (SURVEY.md §7.0): the reference's infinite promise-loop
(`lib/crawler.js:39-107` processOne: pop → filter → fetch → convert →
process → store → complete) re-expressed as a driver loop over *waves*.
Each wave is ONE chained Ray Data execution over slim frontier rows
(html never enters any shuffle):

    frontier_k .map_batches(PrepareBatch)              normalize/scope/robots
               .groupby('bucket').map_groups(...)      dedup + claim + probe
               .groupby('polite_key').map_groups(...)  politeness budgets
               .groupby('etag_key').map_groups(...)    content-dedup winner
               .map_batches(ClaimEtags)                cross-wave etag claim
               → resolved (materialized once)

then, driven by the wave's slim order-log frame:
    resolved[fetched] .groupby('bucket').map_groups(extract)  → pages + links
    links .map_batches(links_to_frontier)  ∪ carry ∪ deferred ∪ retries
          → frontier_{k+1} (partitioned Parquet checkpoint)

Checkpoint per wave (SURVEY.md §4.1): next frontier Parquet, seen-set
shard snapshots, hot-host set and clock in a manifest written last;
``run(resume=True)`` restarts from the latest complete wave with
identical results. Per-wave outputs: pages (`pages/wave=k/bucket=b`),
links, crawl-order log, deadletters (`lib/crawler.js:523-557`),
per-outcome and per-bucket metrics (`lib/crawlerFactory.js:277-290`
counters analogue).

Scale notes: the per-wave order-log pull (`to_pandas`) is metadata-only
(no html) and exists for the golden-order artifact + driver routing; at
10^10-URL scale set ``emit_order_log=False`` *(future round: aggregate
path)* and the sidecars stay distributed. All shuffles are keyed by
url-hash bucket, (host, salt), or content hash — never by raw payload.
"""

from __future__ import annotations

import json
import pickle
import shutil
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import CrawlConfig
from ..frontier import links_to_frontier, seeds_to_frontier
from ..stages.engine_stages import (FRONTIER_COLS, ORDER_META, PrepareBatch,
                                    ResolveEtags, frontier_table,
                                    make_bucket_stage, make_extract_stage,
                                    make_polite_stage)
from ..state.seen import SeenSetPool


def _keep(outcome: str):
    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["outcome"], outcome))
    keep.__name__ = f"keep_{outcome or 'empty'}"
    return keep


class CrawlEngine:
    def __init__(self, web_root: str | Path, out_dir: str | Path,
                 cfg: CrawlConfig | None = None):
        self.web_root = str(web_root)
        self.out = Path(out_dir)
        self.cfg = cfg or CrawlConfig()
        self._ns = uuid.uuid4().hex[:8]
        self.pool: SeenSetPool | None = None

    # ---------- small helpers ----------

    def _robots_dict(self) -> dict:
        robots = pq.read_table(Path(self.web_root) / "robots.parquet").to_pandas()
        return {r.host: (int(r.crawl_delay_ms), int(r.max_per_window),
                         tuple(r.disallow_prefixes))
                for r in robots.itertuples()}

    def _write_frontier_df(self, df: pd.DataFrame, wave: int) -> None:
        d = self.out / "frontier" / f"wave={wave}"
        if d.exists():
            shutil.rmtree(d)
        d.mkdir(parents=True)
        pq.write_table(frontier_table(df), d / "part-0.parquet")

    def _frontier_files(self, wave: int) -> tuple[list[str], int]:
        """Parquet files of wave k's frontier + total rows (metadata only)."""
        d = self.out / "frontier" / f"wave={wave}"
        files = sorted(str(p) for p in d.glob("*.parquet")) if d.exists() else []
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        return files, n

    def _manifest_path(self, wave: int) -> Path:
        return self.out / "manifests" / f"wave={wave}.json"

    def _write_manifest(self, wave: int, payload: dict) -> None:
        p = self._manifest_path(wave)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload))
        tmp.rename(p)

    def _snapshot_seen(self, wave: int) -> None:
        d = self.out / "seen_snapshots"
        d.mkdir(parents=True, exist_ok=True)
        with open(d / f"wave={wave}.pkl", "wb") as f:
            pickle.dump(self.pool.snapshot_all(), f)

    # ---------- lifecycle ----------

    def _fresh_start(self) -> tuple[int, int, set]:
        if self.out.exists():
            shutil.rmtree(self.out)
        self.out.mkdir(parents=True)
        seeds = pq.read_table(Path(self.web_root) / "seeds.parquet").to_pandas()
        self._write_frontier_df(seeds_to_frontier(seeds), 0)
        return 0, 0, set()

    def _resume_point(self) -> tuple[int, int, set]:
        """Latest complete wave k → resume at k+1 from its manifest."""
        waves = sorted(int(p.stem.split("=")[1])
                       for p in (self.out / "manifests").glob("wave=*.json"))
        if not waves:
            return 0, 0, set()
        k = waves[-1]
        m = json.loads(self._manifest_path(k).read_text())
        snap = self.out / "seen_snapshots" / f"wave={k + 1}.pkl"
        if snap.exists():
            with open(snap, "rb") as f:
                self.pool.restore_all(pickle.load(f))
        return k + 1, int(m["next_clock"]), set(m.get("hot_hosts", []))

    def run(self, resume: bool = False) -> dict:
        cfg = self.cfg
        self.pool = SeenSetPool(cfg.n_shards, cfg.seen_mode,
                                namespace=f"seen-{self._ns}")
        robots_ref = ray.put(self._robots_dict())
        if resume and (self.out / "manifests").exists():
            k, clock, hot = self._resume_point()
        else:
            k, clock, hot = self._fresh_start()

        while k < cfg.max_waves:
            files, n_rows = self._frontier_files(k)
            if not files:
                break
            if n_rows <= cfg.local_wave_threshold:
                n_next, clock, hot = self._run_wave_local(
                    k, clock, files, robots_ref, hot)
            else:
                frontier = ray.data.read_parquet(files)
                n_next, clock, hot = self._run_wave(k, clock, frontier,
                                                    robots_ref, hot)
            self._write_manifest(k, {"wave": k, "next_clock": clock,
                                     "next_frontier_rows": n_next,
                                     "hot_hosts": sorted(hot)})
            k += 1
            if n_next == 0:
                break
        return self._finalize(k)

    # ---------- one wave ----------

    def _run_wave(self, k: int, clock: int, frontier, robots_ref,
                  hot: set[str]) -> tuple[int, int, set]:
        cfg = self.cfg
        mn = frontier.min("not_before")
        if mn is not None and int(mn) > clock:
            clock = int(mn)  # fast-forward (polling-delay analogue)

        tagged = frontier.map_batches(
            PrepareBatch(cfg, robots_ref, clock, cfg.n_buckets),
            batch_format="pandas", batch_size=16384)
        base = (
            tagged
            .groupby("bucket").map_groups(
                make_bucket_stage(self.pool, self.web_root, hot, cfg.salt_factor),
                batch_format="pandas")
            .groupby("polite_key").map_groups(
                make_polite_stage(cfg, robots_ref, hot), batch_format="pandas")
            .materialize()
        )
        # etag/304 resolution, vectorized: ONE slim hash-aggregate finds the
        # competing etags (>1 candidate this wave — rare: duplicate-content
        # aliases); their winners resolve on the driver from a tiny pull;
        # everything else is winner-by-construction inside ResolveEtags.
        from ray.data.aggregate import Count

        def _cand_etags(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["outcome"], "")).select(["etag"])

        comp_rows = (base.map_batches(_cand_etags, batch_format="pyarrow")
                     .groupby("etag").aggregate(Count(alias_name="n_cand"))
                     .filter(expr="n_cand > 1").take_all())
        competing = {r["etag"] for r in comp_rows}
        winners: dict = {}
        if competing:
            comp_local = competing  # closure-captured (small set)

            def _pull(t: pa.Table) -> pa.Table:
                t = t.filter(pc.equal(t["outcome"], ""))
                mask = pc.is_in(t["etag"], value_set=pa.array(sorted(comp_local)))
                return t.filter(mask).select(
                    ["url", "etag", "rank", "seq", "depth", "discovered_from"])

            pull = base.map_batches(_pull, batch_format="pyarrow").to_pandas()
            w = pull.sort_values(["rank", "seq", "depth", "discovered_from"],
                                 kind="stable").drop_duplicates("etag")
            winners = dict(zip(w["etag"], w["url"]))
        resolved = base.map_batches(
            ResolveEtags(self.pool, ray.put(competing), ray.put(winners)),
            batch_format="pandas", batch_size=16384).materialize()

        # slim per-row wave record → order log, metrics, deadletters, routing
        pdf = resolved.select_columns(ORDER_META).to_pandas()
        self._log_wave(k, pdf)
        counts = pdf["outcome"].value_counts()

        next_hot = set()
        cand = pdf[pdf["outcome"].isin(["deferred", "fetch_error", "fetched",
                                        "not_modified"])]
        if len(cand):
            by_host = cand.groupby("host").size()
            next_hot = set(by_host.index[by_host > cfg.salt_threshold])

        next_parts = []
        if counts.get("carry", 0):
            next_parts.append(resolved.map_batches(_keep("carry"), batch_format="pyarrow")
                              .map_batches(frontier_table, batch_format="pandas"))
        if counts.get("deferred", 0):
            nb = clock + cfg.wave_ms
            next_parts.append(
                resolved.map_batches(_keep("deferred"), batch_format="pyarrow")
                .map_batches(lambda df: frontier_table(df.assign(not_before=nb)),
                             batch_format="pandas"))
        if counts.get("fetch_error", 0):
            def bump_retry(df: pd.DataFrame) -> pa.Table:
                df = df.assign(attempt=(df["attempt"] + 1).astype(np.int32))
                df = df[df["attempt"] <= cfg.attempt_cap]
                df = df.assign(
                    not_before=clock + cfg.requeue_delay_ms * df["attempt"])
                return frontier_table(df)
            next_parts.append(
                resolved.map_batches(_keep("fetch_error"), batch_format="pyarrow")
                .map_batches(bump_retry, batch_format="pandas"))

        if counts.get("fetched", 0):
            links = (resolved.map_batches(_keep("fetched"), batch_format="pyarrow")
                     .groupby("bucket").map_groups(
                         make_extract_stage(self.web_root, str(self.out), k),
                         batch_format="pandas")
                     .materialize())
            if links.count() > 0:
                links.write_parquet(str(self.out / "links" / f"wave={k}"))
                next_parts.append(links.map_batches(
                    lambda df: frontier_table(
                        links_to_frontier(df, df["depth"], clock, cfg)),
                    batch_format="pandas"))

        n_next = 0
        if next_parts:
            nxt = next_parts[0]
            for p in next_parts[1:]:
                nxt = nxt.union(p)
            nxt = nxt.materialize()
            n_next = nxt.count()
            if n_next:
                d = self.out / "frontier" / f"wave={k + 1}"
                if d.exists():
                    shutil.rmtree(d)
                nxt.write_parquet(str(d))
        self._snapshot_seen(k + 1)
        return n_next, clock + cfg.wave_ms, next_hot

    # ---------- one wave, small-frontier fast path ----------

    def _run_wave_local(self, k: int, clock: int, files: list[str], robots_ref,
                        hot: set[str]) -> tuple[int, int, set]:
        """Driver-side execution of one wave through the IDENTICAL stage
        callables (PrepareBatch → bucket → polite → etag → ClaimEtags →
        extract). Seen-set shard actors are still the authority, so local
        and distributed waves interleave with identical results; Ray Data's
        fixed per-execution overhead is skipped for trickle waves. Parity
        for both modes is pinned by tests/test_parity.py."""
        cfg = self.cfg
        df = pq.read_table(files).to_pandas()
        mn = int(df["not_before"].min())
        if mn > clock:
            clock = mn

        cur = PrepareBatch(cfg, robots_ref, clock, cfg.n_buckets)(df)
        bucket_fn = make_bucket_stage(self.pool, self.web_root, hot,
                                      cfg.salt_factor)
        cur = pd.concat([bucket_fn(g) for _, g in cur.groupby("bucket", sort=True)],
                        ignore_index=True)
        polite_fn = make_polite_stage(cfg, robots_ref, hot)
        cur = pd.concat([polite_fn(g) for _, g in cur.groupby("polite_key", sort=True)],
                        ignore_index=True)
        competing, winners = ResolveEtags.competing_and_winners(cur)
        cur = ResolveEtags(self.pool, competing, winners)(cur)

        pdf = cur[ORDER_META]
        self._log_wave(k, pdf)
        counts = pdf["outcome"].value_counts()

        next_hot = set()
        cand = pdf[pdf["outcome"].isin(["deferred", "fetch_error", "fetched",
                                        "not_modified"])]
        if len(cand):
            by_host = cand.groupby("host").size()
            next_hot = set(by_host.index[by_host > cfg.salt_threshold])

        next_parts: list[pd.DataFrame] = []
        if counts.get("carry", 0):
            next_parts.append(cur[cur["outcome"] == "carry"][FRONTIER_COLS])
        if counts.get("deferred", 0):
            dfr = cur[cur["outcome"] == "deferred"].copy()
            dfr["not_before"] = clock + cfg.wave_ms
            next_parts.append(dfr[FRONTIER_COLS])
        if counts.get("fetch_error", 0):
            err = cur[cur["outcome"] == "fetch_error"].copy()
            err["attempt"] = (err["attempt"] + 1).astype(np.int32)
            err = err[err["attempt"] <= cfg.attempt_cap]
            err["not_before"] = clock + cfg.requeue_delay_ms * err["attempt"]
            if len(err):
                next_parts.append(err[FRONTIER_COLS])

        if counts.get("fetched", 0):
            extract_fn = make_extract_stage(self.web_root, str(self.out), k)
            fetched = cur[cur["outcome"] == "fetched"]
            links = pd.concat(
                [extract_fn(g) for _, g in fetched.groupby("bucket", sort=True)],
                ignore_index=True)
            if len(links):
                d = self.out / "links" / f"wave={k}"
                d.mkdir(parents=True, exist_ok=True)
                pq.write_table(pa.Table.from_pandas(links, preserve_index=False),
                               d / "part-0.parquet")
                next_parts.append(
                    links_to_frontier(links, links["depth"], clock, cfg))

        n_next = 0
        if next_parts:
            nxt = pd.concat(
                [frontier_table(p).to_pandas() for p in next_parts],
                ignore_index=True)
            n_next = len(nxt)
            if n_next:
                self._write_frontier_df(nxt, k + 1)
        self._snapshot_seen(k + 1)
        return n_next, clock + cfg.wave_ms, next_hot

    # ---------- per-wave artifacts (driver-side, slim metadata) ----------

    def _log_wave(self, k: int, pdf: pd.DataFrame) -> None:
        # carried rows are not processed this wave → not part of the wave's
        # order log (the oracle's `cur` likewise excludes them)
        pdf = pdf[pdf["outcome"] != "carry"]
        pdf = pdf.sort_values(["rank", "seq", "depth", "discovered_from"],
                              kind="stable").reset_index(drop=True)
        pdf["seq_in_wave"] = np.arange(len(pdf), dtype=np.int64)
        pdf["wave"] = np.int32(k)
        if self.cfg.emit_order_log:
            d = self.out / "order"
            d.mkdir(parents=True, exist_ok=True)
            cols = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
                    "attempt", "newly_claimed", "etag", "found"]
            pq.write_table(pa.Table.from_pandas(pdf[cols], preserve_index=False),
                           d / f"wave={k}.parquet")
        # deadletters (malformed now; attempt-cap uses the bumped attempt)
        dead = []
        mal = pdf[pdf["outcome"] == "malformed"]
        if len(mal):
            dead.append(pd.DataFrame({"url": mal["url"], "reason": "malformed",
                                      "attempt": mal["attempt"].astype(np.int32),
                                      "wave": np.int32(k)}))
        err = pdf[pdf["outcome"] == "fetch_error"]
        if len(err):
            bumped = err["attempt"].astype(np.int32) + 1
            over = bumped > self.cfg.attempt_cap
            if over.any():
                dead.append(pd.DataFrame({"url": err.loc[over, "url"],
                                          "reason": "attempt_cap",
                                          "attempt": bumped[over],
                                          "wave": np.int32(k)}))
        if dead:
            d = self.out / "deadletter"
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(pd.concat(dead, ignore_index=True),
                                                preserve_index=False),
                           d / f"wave={k}.parquet")
        # metrics: per outcome and per (bucket, outcome) — the reference's
        # per-queue/per-op counters (`lib/crawlerFactory.js:277-290`)
        m = (pdf.groupby("outcome").size().rename("n").reset_index()
             .assign(wave=np.int32(k)))
        mb = (pdf.groupby(["bucket", "outcome"]).size().rename("n").reset_index()
              .assign(wave=np.int32(k)))
        d = self.out / "metrics"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(m[["wave", "outcome", "n"]],
                                            preserve_index=False),
                       d / f"wave={k}.parquet")
        dp = self.out / "metrics_partition"
        dp.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(mb[["wave", "bucket", "outcome", "n"]],
                                            preserve_index=False),
                       dp / f"wave={k}.parquet")

    # ---------- final assembly ----------

    def _finalize(self, n_waves: int) -> dict:
        out = {"n_waves": n_waves, "out_dir": str(self.out)}
        order_files = sorted((self.out / "order").glob("wave=*.parquet"),
                             key=lambda p: int(p.stem.split("=")[1])) \
            if (self.out / "order").exists() else []
        if order_files:
            log = pq.read_table(order_files).to_pandas()
            claimed = log[log["newly_claimed"]][["url", "wave"]] \
                .rename(columns={"wave": "first_wave"})
            etags = (log[log["found"] & (log["etag"] != "")]
                     [["url", "etag"]].drop_duplicates("url"))
            seen = claimed.merge(etags, on="url", how="left") \
                .sort_values("url").reset_index(drop=True)
            seen["first_wave"] = seen["first_wave"].astype(np.int32)
            pq.write_table(pa.Table.from_pandas(seen, preserve_index=False),
                           self.out / "seen.parquet")
            out["n_seen"] = len(seen)
        out["shard_stats"] = self.pool.stats() if self.pool else []
        (self.out / "SUMMARY.json").write_text(json.dumps(out, default=str))
        return out
