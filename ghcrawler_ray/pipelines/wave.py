"""The wave-loop crawl engine — Ray-Data-native frontier scheduler.

Target shape (SURVEY.md §7.0): the reference's infinite promise-loop
(`lib/crawler.js:39-107` processOne: pop → filter → fetch → convert →
process → store → complete) re-expressed as a driver loop over *waves*.
Each wave is ONE streaming Ray Data execution — a linear chain of
shuffles over progressively slimmer rows (html never enters any
shuffle), with every per-wave artifact side-written idempotently from
inside the owning stage (see stages/engine_stages.py module docstring):

    frontier_k → PrepareBatch → groupby(polite_part) → partition_stage
               → groupby(etag_part) → resolve_stage
               → groupby(bucket)    → extract_stage
               → links_to_frontier  → groupby(lpart) → dedup
               → write_parquet(frontier_{k+1})

``polite_part = (hash(host)+salt) % n_polite_parts`` co-locates complete
(host, salt) politeness groups AND all duplicates of any url (same url ⇒
same host), so in-wave dedup, the sharded seen-set claim, the fetch
probe and the per-host budget all resolve inside that one exchange.
``etag_part = hash(etag) % n_polite_parts`` then co-locates every
candidate of one etag for the in-wave 304 winner rule — replacing the
round-1 two-phase slim-pull/broadcast barrier, which cost an extra Ray
execution per wave.

Two bookkeeping modes:
- golden (``emit_order_log=True``, correctness scale): the stages also
  side-write slim per-row order records; the driver merges + sorts them
  into the crawl-order artifact (O(rows) driver work, paid only when the
  artifact is wanted);
- scale (``emit_order_log=False``, bench / 10^10 design point): ALL
  driver inputs are sidecar aggregates — O(#hosts/#buckets×#outcomes)
  rows to the driver, never O(#rows). tests pin both modes' outputs.

Checkpoint per wave (SURVEY.md §4.1): next frontier Parquet, seen-set
shard snapshots (written SHARD-SIDE — snapshot bytes never transit the
driver), hot-host set and clock in a manifest written last;
``run(resume=True)`` restarts from the latest complete wave with
identical results. Per-wave outputs: pages (`pages/wave=k/`), links,
crawl-order log (golden mode), deadletters (`lib/crawler.js:523-557`),
per-outcome and per-partition metrics (`lib/crawlerFactory.js:277-290`
counters analogue).
"""

from __future__ import annotations

import dataclasses
import json
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
from ..frontier import (dedup_discovered, links_to_frontier,
                        seeds_to_frontier)
from ..stages.engine_stages import (FRONTIER_COLS, ORDER_META, PrepareBatch,
                                    WaveSide, frontier_table,
                                    make_extract_stage, make_partition_stage,
                                    make_resolve_stage, resolve_etag_frame,
                                    route_next_frontier)
from ..state.politeness import ORDER_COLS, salt_map
from ..state.seen import SeenSetPool


def _is_actor_death(e: BaseException) -> bool:
    """True iff the exception chain bottoms out in an actor-death error
    (a killed/crashed seen-shard) rather than a deterministic user-code
    failure. Walks ``cause`` (RayTaskError's wrapped remote exception)
    plus the standard ``__cause__``/``__context__`` links."""
    death = tuple(t for t in (
        getattr(ray.exceptions, "RayActorError", None),
        getattr(ray.exceptions, "ActorDiedError", None),
        getattr(ray.exceptions, "ActorUnavailableError", None)) if t)
    seen: set[int] = set()
    stack: list[BaseException | None] = [e]
    while stack:
        x = stack.pop()
        if x is None or id(x) in seen:
            continue
        seen.add(id(x))
        if isinstance(x, death):
            return True
        stack.extend((getattr(x, "cause", None), x.__cause__,
                      x.__context__))
    return False


def _discovery_filter(df: pd.DataFrame, pool, blooms,
                      n_shards: int) -> pd.DataFrame:
    """Drop discovered links whose target was claimed BEFORE this wave:
    bloom pre-check against the wave-start broadcast (no RPC for
    definitely-new urls — the overwhelming majority on a frontier
    expansion), then ONE batched exact confirm per touched shard against
    the frozen wave-start view (``contains_before_wave``). Exactness
    comes from the confirm; the bloom only prunes RPC volume (a url seen
    before the wave is guaranteed bloom-positive — no false negatives),
    so a retried sink task re-decides identically."""
    h = df["seq"].to_numpy(dtype=np.int64)   # seq = hash64(url) = claim key
    maybe = np.zeros(len(h), dtype=bool)
    shard_of = h % n_shards
    for s, bl in enumerate(blooms):
        m = shard_of == s
        if m.any():
            maybe[m] = bl.contains_many(h[m].astype(np.uint64))
    drop = np.zeros(len(h), dtype=bool)
    if maybe.any():
        drop[maybe] = pool.contains_before_wave(h[maybe])
    if drop.any():
        df = df[~drop].reset_index(drop=True)
    return df


def _make_link_sink(nf_dir: str, cfg: CrawlConfig, pool=None,
                    bloom_refs=None):
    """Terminal stage of the wave chain: global per-url dedup of one lpart
    group of discovered links (+ the discovery-time seen filter),
    side-written as that group's next-frontier partition (deterministic
    name → task-retry idempotent)."""
    holder: dict = {}

    def link_sink(g: pd.DataFrame) -> pd.DataFrame:
        d0 = dedup_discovered(g)
        if pool is not None and cfg.discovery_seen_filter and len(d0):
            if "blooms" not in holder:
                from ..state.bloom import BloomFilter
                holder["blooms"] = [BloomFilter.from_state(st)
                                    for st in ray.get(list(bloom_refs))]
            d0 = _discovery_filter(d0, pool, holder["blooms"], cfg.n_shards)
        t = frontier_table(d0)
        part = int(g["lpart"].iloc[0]) if len(g) else 0
        if t.num_rows:
            d = Path(nf_dir)
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(t, d / f"lp{part}.parquet")
        return pd.DataFrame({"lpart": np.array([part], dtype=np.int32),
                             "n": np.array([t.num_rows], dtype=np.int64)})

    link_sink.__name__ = "link_sink"
    return link_sink


#: Config fields the hot-config channel may patch between waves — the
#: live-tunable subset (`lib/crawlerFactory.js:194-251` patches queue
#: weights / loop counts / delays over redis pub-sub without restart).
#: Structural fields (shard/bucket/partition counts, seen_mode) are
#: deliberately NOT patchable: they shape on-disk layout and actor
#: state, which a running crawl cannot re-key.
PATCHABLE_FIELDS = frozenset({
    "wave_ms", "requeue_delay_ms", "attempt_cap",
    "default_crawl_delay_ms", "default_max_per_window",
    "salt_threshold", "salt_factor", "salt_cap",
    "local_wave_threshold", "max_waves", "emit_order_log",
    "deny_url_regex", "allowed_host_suffixes",
    "paginated_priority", "default_link_priority",
    "discovery_seen_filter", "wave_max_attempts",
    "protected_url_regex", "elevated_retry", "elevated_max_per_window",
    "cred_rules", "cred_windows",
})

#: tuple-typed CrawlConfig fields (JSON patches arrive as lists) →
#: element validator: (inner shape, scalar types per slot)
_TUPLE_FIELDS = {
    "allowed_host_suffixes": (str,),
    "cred_rules": ((str, str),),
    "cred_windows": ((str, int),),
}

#: regex-valued fields: compiled at patch time so a malformed pattern
#: fails the patch, not the next wave
_REGEX_FIELDS = frozenset({"deny_url_regex", "protected_url_regex"})

_CFG_DEFAULTS = CrawlConfig()


def _coerce_patch_value(k: str, v):
    """Validate one hot-config patch value against the CrawlConfig field
    type; JSON lists become tuples. Raises ValueError on mismatch so a
    mistyped patch (e.g. {"wave_ms": "5000"}) is rejected AT PATCH TIME
    instead of being persisted and crash-looping the engine on resume."""
    import re as _re

    def _chk(val, want, where):
        if want is bool:
            ok = isinstance(val, bool)
        elif want is int:
            ok = isinstance(val, int) and not isinstance(val, bool)
        else:
            ok = isinstance(val, want)
        if not ok:
            raise ValueError(
                f"config patch {where}: expected {want.__name__}, "
                f"got {type(val).__name__} ({val!r})")
        return val

    spec = _TUPLE_FIELDS.get(k)
    if spec is not None:
        if not isinstance(v, (list, tuple)):
            raise ValueError(f"config patch {k!r}: expected a list, "
                             f"got {type(v).__name__}")
        inner = spec[0]
        out = []
        for i, el in enumerate(v):
            if isinstance(inner, tuple):   # pair-shaped elements
                if not isinstance(el, (list, tuple)) or len(el) != len(inner):
                    raise ValueError(
                        f"config patch {k}[{i}]: expected a "
                        f"{len(inner)}-element pair, got {el!r}")
                el = tuple(_chk(x, t, f"{k}[{i}][{j}]")
                           for j, (x, t) in enumerate(zip(el, inner)))
                if k == "cred_rules":
                    _re.compile(el[0])     # malformed regex → fail now
            else:
                _chk(el, inner, f"{k}[{i}]")
            out.append(el)
        return tuple(out)
    want = type(getattr(_CFG_DEFAULTS, k))
    _chk(v, want, k)
    if k in _REGEX_FIELDS and v:
        _re.compile(v)
    return v


def coerce_patch(patch: dict) -> dict:
    """Field-name + value-type validation for a hot-config patch (shared
    by the engine channel and the ``patch-config`` CLI)."""
    bad = set(patch) - PATCHABLE_FIELDS
    if bad:
        raise ValueError(f"non-patchable config fields: {sorted(bad)}")
    return {k: _coerce_patch_value(k, v) for k, v in patch.items()}


class CrawlEngine:
    def __init__(self, web_root: str | Path, out_dir: str | Path,
                 cfg: CrawlConfig | None = None,
                 inject: dict[int, pd.DataFrame] | None = None,
                 patches: dict[int, dict] | None = None):
        """``inject`` maps wave number → seed DataFrame (url, priority,
        seq[, policy]) unioned into that wave's frontier before it runs —
        the webhook event-source analogue (`routes/webhook.js:14-60`).
        The sequential oracle takes the identical hook.

        ``patches`` maps wave number → {field: value} applied to the
        config BEFORE that wave runs — the hot/live-config analogue
        (`lib/crawlerFactory.js:194-251` redis-pubsub patching of
        weights/delays/loop counts mid-run). Only ``PATCHABLE_FIELDS``
        may appear. The same channel exists file-based for running /
        checkpointed crawls: ``{out}/config_patches/wave=K.json`` is
        read before wave K (CLI ``patch-config`` writes it — the
        pub-sub analogue an operator uses from outside the process);
        applied patches are persisted there too, so ``resume`` replays
        them deterministically. The sequential oracle takes the
        identical ``patches`` hook."""
        self.web_root = str(web_root)
        self.out = Path(out_dir)
        self.cfg = cfg or CrawlConfig()
        self.inject = inject or {}
        self.patches = {int(k): dict(v) for k, v in (patches or {}).items()}
        self._ns = uuid.uuid4().hex[:8]
        self.pool: SeenSetPool | None = None
        self._fail_fired = False

    # ---------- hot config (live patch channel) ----------

    def _apply_patch_dict(self, patch: dict) -> None:
        self.cfg = dataclasses.replace(self.cfg, **coerce_patch(patch))

    def _apply_patches(self, k: int) -> None:
        """Merge the in-process patch for wave k with the file channel
        (file wins — it is the operator's out-of-band override), apply,
        and persist the merged patch for deterministic resume."""
        patch = dict(self.patches.get(k, {}))
        f = self.out / "config_patches" / f"wave={k}.json"
        if f.exists():
            patch.update(json.loads(f.read_text()))
        if not patch:
            return
        self._apply_patch_dict(patch)
        f.parent.mkdir(parents=True, exist_ok=True)
        f.write_text(json.dumps(patch))

    def _replay_patches_below(self, k: int) -> None:
        """Resume path: re-apply every persisted patch for waves < k in
        wave order, so the resumed config equals the mid-run config."""
        d = self.out / "config_patches"
        if not d.exists():
            return
        for j in sorted(int(p.stem.split("=")[1])
                        for p in d.glob("wave=*.json")):
            if j < k:
                self._apply_patch_dict(
                    json.loads((d / f"wave={j}.json").read_text()))

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

    def _frontier_files(self, wave: int) -> tuple[list[str], int, int | None]:
        """Parquet files of wave k's frontier + total rows + min(not_before)
        — all from file metadata (footer column statistics), no Ray
        execution. The min drives the polling-delay fast-forward
        (`lib/crawler.js:142-147` analogue)."""
        d = self.out / "frontier" / f"wave={wave}"
        files = sorted(str(p) for p in d.glob("*.parquet")) if d.exists() else []
        n, mn = 0, None
        missing_stats = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            n += md.num_rows
            try:
                idx = md.schema.to_arrow_schema().get_field_index("not_before")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError("no stats")
                    mn = int(st.min) if mn is None else min(mn, int(st.min))
            except Exception:
                missing_stats.append(f)
        if missing_stats:
            col = pq.read_table(missing_stats, columns=["not_before"])
            if col.num_rows:
                m2 = int(pc.min(col["not_before"]).as_py())
                mn = m2 if mn is None else min(mn, m2)
        return files, n, mn

    def _manifest_path(self, wave: int) -> Path:
        return self.out / "manifests" / f"wave={wave}.json"

    def _write_manifest(self, wave: int, payload: dict) -> None:
        p = self._manifest_path(wave)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload))
        tmp.rename(p)

    def _snapshot_seen(self, wave: int) -> None:
        """Shard-side snapshots: each shard actor writes its own file; the
        driver only waits on the (tiny) path list."""
        d = self.out / "seen_snapshots" / f"wave={wave}"
        if d.exists():
            shutil.rmtree(d)
        self.pool.save_snapshots(str(d))

    # ---------- lifecycle ----------

    def _fresh_start(self) -> tuple[int, int, dict]:
        if self.out.exists():
            shutil.rmtree(self.out)
        self.out.mkdir(parents=True)
        seeds = pq.read_table(Path(self.web_root) / "seeds.parquet").to_pandas()
        self._write_frontier_df(seeds_to_frontier(seeds), 0)
        return 0, 0, {}

    def _resume_point(self) -> tuple[int, int, dict]:
        """Latest complete wave k → resume at k+1 from its manifest."""
        waves = sorted(int(p.stem.split("=")[1])
                       for p in (self.out / "manifests").glob("wave=*.json"))
        if not waves:
            return 0, 0, {}
        k = waves[-1]
        m = json.loads(self._manifest_path(k).read_text())
        snap = self.out / "seen_snapshots" / f"wave={k + 1}"
        if snap.exists():
            self.pool.load_snapshots(str(snap))
        hot = m.get("hot_hosts", {})
        if isinstance(hot, list):      # legacy manifest: fixed salt factor
            hot = {h: self.cfg.salt_factor for h in hot}
        return k + 1, int(m["next_clock"]), {h: int(n) for h, n in hot.items()}

    def run(self, resume: bool = False) -> dict:
        cfg = self.cfg
        # leave 2 cores of headroom for the driver, seen-set shard actors
        # and object-store workers: full CPU subscription measurably
        # INVERTS scaling (32 tasks on 32 cores ran slower than 24)
        total_cpu = int(ray.cluster_resources().get("CPU", 0))
        ctx = ray.data.DataContext.get_current()
        if total_cpu >= 8:
            from ray.data._internal.execution.interfaces.execution_options import \
                ExecutionResources
            ctx.execution_options.resource_limits = \
                ExecutionResources.for_limits(cpu=total_cpu - 2)
        # shuffle partition count: a FIXED job parameter (cfg.n_polite_parts),
        # deliberately independent of cluster size — the north-rule scaling
        # criterion runs the SAME job at N and 4N nodes, and per-barrier
        # fixed cost is ~13 ms × partitions (measured: 4 chained groupbys on
        # 105k rows = 3.3 s at 64 partitions, 0.95 s at 16), so tying the
        # partition count to the cluster size makes the bigger cluster pay
        # a bigger serial floor. (Ray's default min_parallelism=200 sprayed
        # 200 reduce partitions per all-to-all — 15-22 s per 700k-row
        # groupby.)
        ctx.min_parallelism = self.cfg.n_polite_parts
        self.pool = SeenSetPool(cfg.n_shards, cfg.seen_mode,
                                namespace=f"seen-{self._ns}")
        self._robots = self._robots_dict()
        robots_ref = ray.put(self._robots)
        if resume and (self.out / "manifests").exists():
            k, clock, hot = self._resume_point()
            self._replay_patches_below(k)
        else:
            k, clock, hot = self._fresh_start()

        while k < self.cfg.max_waves:
            # hot-config channel: apply this wave's patch (in-process
            # and/or file-based) before anything else reads cfg
            self._apply_patches(k)
            cfg = self.cfg
            if k in self.inject:
                d = self.out / "frontier" / f"wave={k}"
                d.mkdir(parents=True, exist_ok=True)
                pq.write_table(frontier_table(seeds_to_frontier(self.inject[k])),
                               d / "injected-engine.parquet")
            files, n_rows, min_nb = self._frontier_files(k)
            if not files:
                break
            if cfg.fail_inject == f"wave={k}" and not self._fail_fired:
                # chaos failpoint (tests): one shard dies mid-crawl
                self._fail_fired = True
                ray.kill(self.pool.shards[0], no_restart=True)
            n_next, clock, hot = self._attempt_wave(
                k, clock, files, robots_ref, hot, n_rows, min_nb, ctx)
            self._write_manifest(k, {"wave": k, "next_clock": clock,
                                     "next_frontier_rows": n_next,
                                     "hot_hosts": dict(sorted(hot.items()))})
            k += 1
            if n_next == 0:
                break
        return self._finalize(k)

    def _attempt_wave(self, k: int, clock: int, files, robots_ref,
                      hot: dict, n_rows: int, min_nb, ctx):
        """Run wave k with mid-wave fault recovery: a dead seen-shard
        actor (RayError from any claim/bloom/snapshot RPC or from a Ray
        Data task probing one) rebuilds the pool from the wave-START
        snapshot and re-runs the wave. Side outputs are cleaned and
        re-written idempotently by ``_wave_side``; claims replay
        identically from the restored state (wave-idempotent claim sets
        reset by ``begin_wave``)."""
        cfg = self.cfg
        for attempt in range(cfg.wave_max_attempts):
            try:
                return self._dispatch_wave(k, clock, files, robots_ref,
                                           dict(hot), n_rows, min_nb, ctx)
            except ray.exceptions.RayError as e:
                # Recover ONLY for actor-death root causes; a
                # deterministic user-code bug (RayTaskError wrapping a
                # plain exception) must surface immediately instead of
                # burning wave_max_attempts pool rebuilds.
                if not _is_actor_death(e):
                    raise
                if attempt + 1 >= cfg.wave_max_attempts:
                    raise
                self._recover_pool(k)
        raise AssertionError("unreachable")  # pragma: no cover

    def _dispatch_wave(self, k: int, clock: int, files, robots_ref,
                       hot: dict, n_rows: int, min_nb, ctx):
        cfg = self.cfg
        if n_rows <= cfg.local_wave_threshold:
            return self._run_wave_local(k, clock, files, robots_ref, hot)
        # PHYSICAL partition count for this wave's shuffles. The
        # part COLUMN values (polite_part/etag_part/bucket/lpart,
        # all % cfg.n_polite_parts — the job parameter) are what
        # semantics key on; the reduce-partition count below only
        # sets task counts, so it can adapt to the wave size
        # without touching results (groupby groups by VALUE, and
        # map_groups splits per value inside a reduce partition).
        # Profiling (GHCRAWLER_WAVE_TIMING=stats): a sub-100k-row
        # wave's wall is ~90% scheduling latency of the 4 chained
        # shuffles' ~512 tasks while all map compute totals
        # ~0.6 s — halving the task count halves the wave floor.
        # The n_rows/256k term keeps one slim block ~50 MB.
        wave_parts = int(min(self.cfg.n_polite_parts,
                             max(16, n_rows // 4096)))
        n_blocks = int(max(wave_parts, -(-n_rows // 262144)))
        ctx.min_parallelism = wave_parts
        try:
            frontier = ray.data.read_parquet(
                files, override_num_blocks=n_blocks)
            return self._run_wave(k, clock, frontier, robots_ref,
                                  hot, min_nb)
        finally:
            ctx.min_parallelism = self.cfg.n_polite_parts

    def _recover_pool(self, k: int) -> None:
        """Rebuild every seen-shard actor and restore the wave-``k``
        START state (``seen_snapshots/wave=k``; wave 0 starts empty).
        A fresh actor namespace guarantees ``get_if_exists`` cannot
        hand back handles to the dead generation."""
        for s in self.pool.shards:
            try:
                ray.kill(s, no_restart=True)
            except Exception:
                pass
        self._ns = uuid.uuid4().hex[:8]
        self.pool = SeenSetPool(self.cfg.n_shards, self.cfg.seen_mode,
                                namespace=f"seen-{self._ns}")
        snap = self.out / "seen_snapshots" / f"wave={k}"
        if snap.exists():
            self.pool.load_snapshots(str(snap))

    # ---------- one wave: a single streaming execution ----------

    def _wave_side(self, k: int, clock: int) -> WaveSide:
        """Per-wave side-output dirs, cleaned for idempotent re-runs."""
        nf_dir = self.out / "frontier" / f"wave={k + 1}"
        hot_dir = self.out / "hot" / f"wave={k}"
        stats_dir = self.out / "side_stats" / f"wave={k}"
        dead_dir = self.out / "deadletter" / f"wave={k}"
        links_dir = self.out / "links" / f"wave={k}"
        order_dir = (self.out / "side_order" / f"wave={k}"
                     if self.cfg.emit_order_log else None)
        for d in (nf_dir, hot_dir, stats_dir, dead_dir, links_dir, order_dir):
            if d is not None and d.exists():
                shutil.rmtree(d)
        return WaveSide(wave=k, clock=clock, nf_dir=str(nf_dir),
                        dead_dir=str(dead_dir), stats_dir=str(stats_dir),
                        hot_dir=str(hot_dir),
                        order_dir=str(order_dir) if order_dir else None)

    def _run_wave(self, k: int, clock: int, frontier, robots_ref,
                  hot: dict, min_nb: int | None) -> tuple[int, int, dict]:
        cfg = self.cfg
        if min_nb is not None and min_nb > clock:
            clock = min_nb  # fast-forward (polling-delay analogue)
        side = self._wave_side(k, clock)
        self.pool.begin_wave(k)
        bloom_refs = None
        if cfg.discovery_seen_filter:
            # freeze the wave-START bloom state in the object store before
            # any of this wave's claims can run (wait for execution, don't
            # pull the bytes — they broadcast worker-to-worker)
            bloom_refs = self.pool.bloom_refs()
            ray.wait(bloom_refs, num_returns=len(bloom_refs),
                     fetch_local=False)

        # the whole wave as ONE lazy chain; write_parquet is the terminal
        # that drives it. Routing/deadletter/stats/order/pages/links are
        # side-written inside the stages (idempotent per-group filenames).
        pipe = (
            frontier
            # per-BLOCK mapping (no batch_size): an explicit batch_size
            # coalesces blocks, and the downstream sort-shuffles inherit
            # that collapsed block count as their partition count
            # (measured: batch_size=16384 capped a 32-CPU wave at 7 tasks
            # in EVERY stage)
            .map_batches(PrepareBatch(cfg, robots_ref, clock, cfg.n_buckets, hot),
                         batch_format="pandas")
            .groupby("polite_part").map_groups(
                make_partition_stage(self.pool, self.web_root, cfg,
                                     robots_ref, hot, side),
                batch_format="pandas")
            .groupby("etag_part").map_groups(
                make_resolve_stage(self.pool, cfg, side),
                batch_format="pandas")
            .groupby("bucket").map_groups(
                make_extract_stage(self.web_root, str(self.out), k),
                batch_format="pandas")
            .map_batches(lambda df: links_to_frontier(df, df["depth"], clock, cfg),
                         batch_format="pandas")
            # global url-dedup of discovered links (one slim url-keyed
            # shuffle; without it every duplicate discovery rides to the
            # next wave's claim stage — measured 4× wave volume). The
            # dedup group side-writes its frontier partition itself
            # (idempotent lp{part} name): Ray's parquet datasink deletes a
            # directory it created when the write is empty, which would
            # take the routing side-files with it.
            .groupby("lpart").map_groups(
                _make_link_sink(side.nf_dir, cfg, self.pool, bloom_refs),
                batch_format="pandas")
        )
        import os
        import time as _time
        _timing = bool(os.environ.get("GHCRAWLER_WAVE_TIMING"))
        _t = _time.time()
        if _timing and os.environ.get("GHCRAWLER_WAVE_TIMING") == "stats":
            mat = pipe.materialize()   # profiling mode: keep stats
            print(f"[wave {k}] pipe: {_time.time() - _t:.2f}s", flush=True)
            print(mat.stats(), flush=True)
            _t = _time.time()
        else:
            pipe.count()   # the terminal that drives the whole wave
            if _timing:
                print(f"[wave {k}] pipe: {_time.time() - _t:.2f}s",
                      flush=True)
                _t = _time.time()

        # ---- driver-side sidecar merges (tiny) ----
        next_hot = self._hot_from_sidecars(Path(side.hot_dir))
        self._stats_from_sidecars(Path(side.stats_dir), k)
        if side.order_dir is not None:
            self._order_from_sidecars(Path(side.order_dir), k)
        if _timing:
            print(f"[wave {k}] sidecars: {_time.time() - _t:.2f}s", flush=True)
            _t = _time.time()

        nf_dir = Path(side.nf_dir)
        n_next = sum(pq.ParquetFile(str(f)).metadata.num_rows
                     for f in nf_dir.glob("*.parquet")) if nf_dir.exists() else 0
        if n_next == 0 and nf_dir.exists():
            shutil.rmtree(nf_dir)
        if _timing:
            print(f"[wave {k}] footers: {_time.time() - _t:.2f}s", flush=True)
            _t = _time.time()
        self._snapshot_seen(k + 1)
        if _timing:
            print(f"[wave {k}] snapshot: {_time.time() - _t:.2f}s",
                  flush=True)
        return n_next, clock + cfg.wave_ms, next_hot

    # ---------- sidecar merges (driver work O(#hosts / #buckets×#outcomes)) ----------

    def _hot_from_sidecars(self, hot_dir: Path) -> dict:
        host_counts: dict = {}
        for f in sorted(hot_dir.glob("*.parquet")) if hot_dir.exists() else []:
            t = pq.read_table(str(f))
            for h, n in zip(t["host"].to_pylist(), t["n"].to_pylist()):
                host_counts[h] = host_counts.get(h, 0) + int(n)
        return salt_map(host_counts, self.cfg)

    def _stats_from_sidecars(self, stats_dir: Path, k: int) -> pd.Series:
        """Merge the stages' per-group (bucket, outcome) count side-outputs
        → wave metrics + per-partition metrics Parquet."""
        files = sorted(stats_dir.glob("*.parquet")) if stats_dir.exists() else []
        if not files:
            return pd.Series(dtype=np.int64)
        df = pq.read_table([str(f) for f in files]).to_pandas()
        mb = df.groupby(["bucket", "outcome"], as_index=False)["n"].sum()
        mb["wave"] = np.int32(k)
        m = mb.groupby("outcome", as_index=False)["n"].sum() \
            .assign(wave=np.int32(k))
        if len(m):
            d = self.out / "metrics"
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(
                m[["wave", "outcome", "n"]], preserve_index=False),
                d / f"wave={k}.parquet")
            dp = self.out / "metrics_partition"
            dp.mkdir(parents=True, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(
                mb[["wave", "bucket", "outcome", "n"]], preserve_index=False),
                dp / f"wave={k}.parquet")
        return m.set_index("outcome")["n"]

    def _order_from_sidecars(self, order_dir: Path, k: int) -> None:
        files = sorted(order_dir.glob("*.parquet")) if order_dir.exists() else []
        if not files:
            return
        pdf = pq.read_table([str(f) for f in files]).to_pandas()
        self._write_order(k, pdf)

    def _write_order(self, k: int, pdf: pd.DataFrame) -> None:
        """Golden crawl-order artifact: global in-wave sort by ORDER_COLS
        (the oracle's exact rule) + dense seq_in_wave."""
        pdf = pdf.copy()
        pdf["wave"] = np.int32(k)
        pdf = pdf.sort_values(ORDER_COLS, kind="stable").reset_index(drop=True)
        pdf["seq_in_wave"] = np.arange(len(pdf), dtype=np.int64)
        d = self.out / "order"
        d.mkdir(parents=True, exist_ok=True)
        cols = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
                "attempt", "newly_claimed", "etag", "found"]
        pq.write_table(pa.Table.from_pandas(pdf[cols], preserve_index=False),
                       d / f"wave={k}.parquet")

    # ---------- one wave, small-frontier fast path ----------

    def _run_wave_local(self, k: int, clock: int, files: list[str], robots_ref,
                        hot: dict) -> tuple[int, int, dict]:
        """Driver-side execution of one wave through the IDENTICAL stage
        callables (PrepareBatch → partition → etag resolve → extract).
        Seen-set shard actors are still the authority, so local and
        distributed waves interleave with identical results; Ray Data's
        fixed per-execution overhead is skipped for trickle waves. Parity
        for both modes is pinned by tests/test_parity.py."""
        cfg = self.cfg
        df = pq.read_table(files).to_pandas()
        mn = int(df["not_before"].min())
        if mn > clock:
            clock = mn
        self.pool.begin_wave(k)

        cur = PrepareBatch(cfg, robots_ref, clock, cfg.n_buckets, hot)(df)
        part_fn = make_partition_stage(self.pool, self.web_root, cfg,
                                       robots_ref, hot)
        cur = pd.concat([part_fn(g) for _, g in cur.groupby("polite_part", sort=True)],
                        ignore_index=True)
        cur = resolve_etag_frame(cur, self.pool)

        pdf = cur[ORDER_META]
        self._log_wave(k, pdf)
        counts = pdf["outcome"].value_counts()

        next_hot: dict = {}
        cand = pdf[pdf["outcome"].isin(["deferred", "fetch_error", "fetched",
                                        "not_modified"])]
        if len(cand):
            next_hot = salt_map(cand.groupby("host").size(), cfg)

        next_parts: list[pd.DataFrame] = [
            route_next_frontier(cur, cfg, clock).to_pandas()]

        if counts.get("fetched", 0):
            extract_fn = make_extract_stage(self.web_root, str(self.out), k)
            fetched = cur[cur["outcome"] == "fetched"]
            links = pd.concat(
                [extract_fn(g) for _, g in fetched.groupby("bucket", sort=True)],
                ignore_index=True)
            if len(links):
                lf = dedup_discovered(
                    links_to_frontier(links, links["depth"], clock, cfg))
                if cfg.discovery_seen_filter and len(lf):
                    # trickle waves: exact frozen-view confirm directly
                    # (no bloom broadcast needed at driver scale)
                    drop = self.pool.contains_before_wave(
                        lf["seq"].to_numpy(dtype=np.int64))
                    lf = lf[~drop].reset_index(drop=True)
                next_parts.append(lf)

        nxt = pd.concat(
            [frontier_table(p).to_pandas() for p in next_parts if len(p)],
            ignore_index=True) if any(len(p) for p in next_parts) else \
            pd.DataFrame(columns=FRONTIER_COLS)
        n_next = len(nxt)
        if n_next:
            self._write_frontier_df(nxt, k + 1)
        self._snapshot_seen(k + 1)
        return n_next, clock + cfg.wave_ms, next_hot

    # ---------- per-wave artifacts (local path, driver-side) ----------

    def _log_wave(self, k: int, pdf: pd.DataFrame) -> None:
        # carried rows are not processed this wave → not part of the wave's
        # order log (the oracle's `cur` likewise excludes them)
        pdf = pdf[pdf["outcome"] != "carry"].copy()
        if self.cfg.emit_order_log:
            self._write_order(k, pdf)
        pdf["wave"] = np.int32(k)
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
        if not self.cfg.elevated_retry:
            ad = pdf[pdf["outcome"] == "auth_denied"]
            if len(ad):
                dead.append(pd.DataFrame({"url": ad["url"],
                                          "reason": "auth_denied",
                                          "attempt": ad["attempt"]
                                          .astype(np.int32),
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
            # keep="first": a url claimed, deadlettered, admin-requeued
            # (untracked) and re-claimed appears twice; first_wave is the
            # original claim
            claimed = log[log["newly_claimed"]][["url", "wave"]] \
                .rename(columns={"wave": "first_wave"}) \
                .drop_duplicates("url", keep="first")
            # etag only for rows actually PROCESSED (fetched / 304-
            # validated) — the partition stage probes etags before the
            # politeness admission, so deferred rows carry a probe etag
            # in the golden log; a claim still pending when max_waves
            # truncates must have NO etag in the seen artifact (the
            # reference's etag index records fetch-time state,
            # `providers/storage/storageDocStore.js:81-93`; the oracle's
            # seen_etag is only set on the admitted-and-found branch)
            proc = log["outcome"].isin(("fetched", "not_modified"))
            etags = (log[proc & (log["etag"] != "")]
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
