"""Shared frontier-row construction rules (used by BOTH the Ray engine and
the sequential oracle, so seed/link admission semantics cannot diverge).

- ``seeds_to_frontier``: seed specs → wave-0 rows (request rationalizer
  analogue, `routes/requests.js:55-80`).
- ``links_to_frontier``: discovered links → frontier rows with the
  priority rule (?page= → 'soon', pagination analogue of
  `providers/fetcher/githubProcessor.js:58-79`), ``seq = hash64(url)`` as
  the deterministic FIFO tie-break, and per-PAGE pre-dedup (attenuation
  analogue, `providers/queuing/attenuatedQueue.js:24-52`): a page linking
  the same url twice emits one row. Cross-page duplicates are kept on
  purpose — batch-scoped dedup would depend on physical batch packing
  (nondeterministic across executions); the next wave's in-wave dedup
  resolves them globally by ORDER_COLS, identically in engine and oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import PRIORITY_RANK, CrawlConfig

from .urls import hash64_array, normalize_series

FRONTIER_COLS = ["url", "priority", "rank", "seq", "attempt", "not_before",
                 "depth", "claimed", "discovered_from", "policy", "cred"]


def seeds_to_frontier(seeds: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "url": seeds["url"].astype(str),
        "priority": seeds["priority"].astype(str),
        "rank": seeds["priority"].map(PRIORITY_RANK).astype(np.int8),
        "seq": seeds["seq"].astype(np.int64),
        "attempt": np.zeros(len(seeds), dtype=np.int32),
        "not_before": np.zeros(len(seeds), dtype=np.int64),
        "depth": np.zeros(len(seeds), dtype=np.int32),
        "claimed": np.zeros(len(seeds), dtype=bool),
        "discovered_from": "",
        "policy": seeds.get("policy", pd.Series(["default"] * len(seeds))).astype(str),
        # credential class (token trait-set analogue): seeds may pin an
        # elevated class; everything else starts public
        "cred": seeds.get("cred", pd.Series(["public"] * len(seeds))).astype(str),
    })[FRONTIER_COLS]


def links_to_frontier(links: pd.DataFrame, parent_depth: pd.Series,
                      clock: int, cfg: CrawlConfig) -> pd.DataFrame:
    from .visitor_map import classify_rels, gate_links
    url = normalize_series(links["dst_url"])
    # children inherit the parent's traversal policy (`lib/request.js:
    # 146-165` getNextPolicy: same fetch/freshness down the subgraph),
    # ADVANCED through the policy's visitor map; edges the map's current
    # step does not name are not traversed (`lib/visitorMap.js:47-117`
    # hasNextStep). Specs without a map admit everything unchanged.
    policy = pd.Series(links["policy"].astype(str).to_numpy()
                       if "policy" in links
                       else np.full(len(links), "default", dtype=object))
    rel = classify_rels(links["src_url"].reset_index(drop=True),
                        url.reset_index(drop=True))
    admit, child_policy = gate_links(policy, rel)
    if not admit.all():
        links = links[admit].reset_index(drop=True)
        url = url[admit].reset_index(drop=True)
        parent_depth = np.asarray(parent_depth)[admit]
        child_policy = child_policy[admit]
    paginated = url.str.contains(r"\?page=", regex=True)
    priority = np.where(paginated, cfg.paginated_priority, cfg.default_link_priority)
    f = pd.DataFrame({
        "url": url.astype(str).to_numpy(),
        "priority": priority,
        "rank": pd.Series(priority).map(PRIORITY_RANK).astype(np.int8).to_numpy(),
        "seq": hash64_array(url),
        "attempt": np.zeros(len(links), dtype=np.int32),
        "not_before": np.full(len(links), clock + cfg.wave_ms, dtype=np.int64),
        "depth": (np.asarray(parent_depth) + 1).astype(np.int32),
        "claimed": np.zeros(len(links), dtype=bool),
        "discovered_from": links["src_url"].astype(str).to_numpy(),
        "policy": child_policy,
        # privilege does NOT inherit: the reference's admin retry covers
        # one request (`githubFetcher.js:67-72`), not the subgraph
        "cred": "public",
    })
    # per-page dedup only here (deterministic: one page's links always
    # share a batch). Cross-page dedup is GLOBAL and happens in
    # ``dedup_discovered`` over url-keyed groups — batch-scoped url dedup
    # would depend on physical batch packing (nondeterministic).
    f = f.drop_duplicates(["url", "discovered_from"], keep="first")
    f["lpart"] = (f["seq"].to_numpy() % N_LINK_PARTS).astype(np.int32)
    return f.reset_index(drop=True)


#: coarse url-keyed partitions for the global discovered-link dedup
N_LINK_PARTS = 64


def dedup_discovered(df: pd.DataFrame) -> pd.DataFrame:
    """Global per-wave dedup of discovered links: first row per url by
    ORDER_COLS (the attenuation/tracker enqueue-dedup analogue,
    `providers/queuing/attenuatedQueue.js:24-52` — without it the frontier
    carries every duplicate discovery to the claim stage, measured 4×
    wave volume). Callers partition by ``lpart`` (seq % N_LINK_PARTS; seq
    is hash64(url), so one url = one group) and apply per group — the
    result equals a global dedup."""
    from .state.politeness import ORDER_COLS
    return df.sort_values(ORDER_COLS, kind="stable") \
        .drop_duplicates("url", keep="first").reset_index(drop=True)
