"""Crawl configuration — the determinized analogue of the reference's knobs.

Reference mapping (file:line into /root/reference):
- priorities + weights: 5 named queues ``events immediate soon normal later``
  with weighted random pop (`lib/crawlerFactory.js:86`, weights
  {events:10, immediate:3, soon:2, normal:3, later:2};
  `providers/queuing/queueSet.js:46-65`). We determinize to a strict
  priority *rank* (lower = popped first) with FIFO `seq` tie-break — the
  ordering a single-loop reference run with a seeded RNG degenerates to
  (SURVEY.md §7.4 "ordering parity").
- requeue delay 5000 ms × attempt: `lib/crawler.js:152-154`.
- attempt cap 5 → deadletter: `lib/crawler.js:304-319`.
- politeness window: per-token 30 calls/s (`lib/crawlerFactory.js:74-76`)
  → per-host `max_per_window` + `crawl_delay_ms` (robots table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Strict priority ranks (determinized weighted pop; see module docstring).
PRIORITY_RANK: dict[str, int] = {
    "events": 0,
    "immediate": 1,
    "soon": 2,
    "normal": 3,
    "later": 4,
}

#: The reference's queue weights, kept for documentation / weighted replay.
REFERENCE_WEIGHTS: dict[str, int] = {
    "events": 10,
    "immediate": 3,
    "soon": 2,
    "normal": 3,
    "later": 2,
}

PRIORITIES: tuple[str, ...] = tuple(PRIORITY_RANK)

#: Repo-wide coarse co-partition width: every hash co-partition
#: (``hash64(key) % N``) and every pinned shuffle in ops/ uses this many
#: partitions — a JOB parameter independent of cluster size (2-4x a
#: 32-core node; scale it with the cluster at the design point).
N_COARSE_PARTS = 64


def tune_data_context() -> None:
    """Pin Ray Data's all-to-all partition count to the repo's coarse
    co-partition width. The default ``min_parallelism=200`` sprays 200
    reduce partitions per shuffle regardless of data size, which at ops
    scale is pure fixed cost (measured: a 40k-row ``groupby`` barrier
    4.6 s at 200 vs 2.6 s at 64 partitions, sf0.1/32 cpus). The wave
    engine pins its own (``pipelines/wave.py``); this covers the ops/
    pipelines when invoked via ``__ray_entry__``/bench/CLI."""
    import ray.data
    ray.data.DataContext.get_current().min_parallelism = N_COARSE_PARTS


@dataclass(frozen=True)
class CrawlConfig:
    """All knobs of one crawl run. Frozen so a config can be broadcast."""

    # --- wave clock (virtual time, ms) ---
    wave_ms: int = 10_000          # one wave advances the clock by this much
    requeue_delay_ms: int = 5_000  # retry delay = requeue_delay_ms * attempt
    attempt_cap: int = 5           # attempt > cap → deadletter

    # --- scope filters (reference: org allow-list lib/crawler.js:578-592,
    #     deny regex lib/crawler.js:594-599) ---
    allowed_host_suffixes: tuple[str, ...] = (".example",)
    deny_url_regex: str = r"/(?:handoff|handback)/"

    # --- politeness defaults when a host has no robots row ---
    default_crawl_delay_ms: int = 100
    default_max_per_window: int = 1_000

    # --- skew handling: a host with more than salt_threshold admitted rows
    #     in one wave is split into salt_factor deterministic sub-groups whose
    #     budgets sum to the host budget (SURVEY.md §7.4) ---
    salt_threshold: int = 2_000
    salt_factor: int = 4    # floor of the adaptive split (politeness.n_salts_for)
    # adaptive ceiling: the zipf-head host splits into up to this many
    # groups (≈ count/salt_threshold), bounded by n_polite_parts/2 so one
    # host never monopolizes the partition space
    salt_cap: int = 32

    # --- partitioning ---
    n_shards: int = 8    # seen-set actor shards (hash(url) % n_shards)
    n_buckets: int = 64  # pages-store / fetch-join buckets (hash(url) % n_buckets)
    # 64 buckets: extract parallelism is bucket-bound — 16 capped a 32-CPU
    # cluster at half idle during the heaviest (html-reading) phase
    # coarse politeness co-group partitions — the wave's single shuffle key
    # (hash(host)+salt) % n_polite_parts; size ≈ 2-4 × total cluster cores
    n_polite_parts: int = 64

    # --- seen-set structure: 'exact64' (64-bit hash set; exact at any test
    #     scale) or 'cuckoo' (compact, supports delete; ~1e-4 fp) ---
    seen_mode: str = "exact64"

    # --- discovery-time seen filter: drop a discovered out-link whose
    #     target was already claimed BEFORE the current wave began, at the
    #     link sink — bloom pre-check (per-wave frozen broadcast, no RPC
    #     for definitely-new urls) + exact contains confirm against the
    #     shard's frozen wave-start view. At the 10^10 design point most
    #     discovered links point at already-crawled pages; without this
    #     they ride the frontier shuffle to next wave's claim stage just
    #     to bounce (the reference dedups at enqueue the same way:
    #     attenuatedQueue + tracker, `providers/queuing/attenuatedQueue.
    #     js:24-52`). The sequential oracle mirrors the rule exactly. ---
    discovery_seen_filter: bool = True

    # --- loop bounds / outputs ---
    max_waves: int = 10_000
    emit_order_log: bool = True   # write the golden crawl-order artifact

    # --- small-wave fast path: a wave whose frontier has at most this many
    #     rows executes driver-side through the IDENTICAL stage callables
    #     (Ray Data's fixed per-execution cost otherwise dominates trickle
    #     waves — late retry-only waves, crawl tails). 0 = always distribute.
    #     Cross-wave state (seen-set shards) is shared either way, so modes
    #     can alternate wave-by-wave with identical results (test_parity
    #     runs both modes against the oracle).
    #     Do NOT raise this as a small-box micro-optimization: a local
    #     wave is a SERIAL driver stall, so every row processed locally
    #     is removed from the parallelizable fraction. Measured at
    #     sf1.0: threshold 32k made the 8-CPU run 44% faster (its
    #     4-barrier fixed cost is ~4x higher) while slightly hurting
    #     32 CPUs — scaling efficiency fell 0.82 -> 0.54. At the
    #     10^10-URL design point the same setting would stall a
    #     256-node cluster once per trickle wave. 4096 rows is the
    #     break-even where local vectorized pandas beats the
    #     distributed path at EVERY cluster size we measure. ---
    local_wave_threshold: int = 4_096

    # --- link→priority rule (reference: paginated pages go to 'soon',
    #     providers/fetcher/githubProcessor.js:58-79) ---
    paginated_priority: str = "soon"
    default_link_priority: str = "normal"

    # --- credential classes (token trait-set analogue): the reference's
    #     token factory matches tokens to requests by trait set
    #     (`providers/fetcher/tokenFactory.js:41-70` _traitsMatch) and on
    #     401/403 retries the fetch once under an elevated/admin token
    #     (`providers/fetcher/githubFetcher.js:67-72`). Analogue: every
    #     frontier row carries a ``cred`` class ('public' default); urls
    #     matching ``protected_url_regex`` are only fetchable by the
    #     'elevated' class — a public probe gets outcome 'auth_denied'
    #     and (when ``elevated_retry``) requeues ONCE with
    #     cred='elevated' at the normal requeue delay, keeping its
    #     attempt count (the immediate-admin-retry, wave-quantized).
    #     The elevated class has its own, scarcer per-host budget
    #     window (``elevated_max_per_window`` — admin tokens are rarer
    #     than public ones), enforced per (host, salt, cred) group in
    #     the politeness ledger. Empty regex = feature off (identical
    #     behavior to pre-credential engines). ---
    protected_url_regex: str = ""
    elevated_retry: bool = True
    elevated_max_per_window: int = 10

    # --- generalized trait-set credentials: the reference matches tokens
    #     to requests by ARBITRARY trait arrays (`providers/fetcher/
    #     tokenFactory.js:41-70` _traitsMatch — e.g. ['admin','push']),
    #     not a fixed public/elevated pair. Analogue: ``cred`` is an OPEN
    #     string class.
    #     * ``cred_rules``: ((url_regex, required_cred), ...) — a url
    #       matching a rule is fetchable only by that class; any other
    #       class gets 'auth_denied' and (when ``elevated_retry``) ONE
    #       requeue carrying the rule's required class. First matching
    #       rule wins. ``protected_url_regex`` is sugar for a leading
    #       ``(protected_url_regex, "elevated")`` rule.
    #     * ``cred_windows``: ((cred, max_per_window), ...) per-class
    #       politeness windows (class-specific token scarcity,
    #       `tokenFactory.js:81-93` benching per token). 'elevated'
    #       defaults to ``elevated_max_per_window``; a class with no
    #       entry (incl. 'public') uses the host's robots window. ---
    cred_rules: tuple[tuple[str, str], ...] = ()
    cred_windows: tuple[tuple[str, int], ...] = ()

    # --- mid-wave fault tolerance: a seen-shard actor dying during a
    #     wave (node loss on a real cluster) aborts that wave's
    #     execution; the engine rebuilds the shard pool from the
    #     wave-START snapshot and re-runs the wave — side outputs are
    #     idempotent per-group files and claims replay identically from
    #     the restored state, so a recovered wave is byte-identical
    #     (the 10^10-scale analogue of the reference's Redis-persisted
    #     tracker surviving a crawler VM loss). ---
    wave_max_attempts: int = 3
    #: test failpoint: "wave=K" kills shard 0 once before wave K runs
    fail_inject: str = ""

    extra: dict = field(default_factory=dict, compare=False)

    # --- credential-class helpers (shared by engine + oracle so the two
    #     sides cannot drift) ---

    def effective_cred_rules(self) -> tuple[tuple[str, str], ...]:
        """Auth rules in match order: the ``protected_url_regex`` sugar
        (→ 'elevated') first, then ``cred_rules``. Empty = feature off."""
        rules = tuple((str(rx), str(c)) for rx, c in self.cred_rules)
        if self.protected_url_regex:
            rules = ((self.protected_url_regex, "elevated"),) + rules
        return rules

    def cred_window(self, cred: str) -> int | None:
        """Per-class max_per_window override, or None = use the host's
        robots window (the 'public' default)."""
        for c, w in self.cred_windows:
            if str(c) == cred:
                return int(w)
        if cred == "elevated":
            return self.elevated_max_per_window
        return None
