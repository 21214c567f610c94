"""Traversal policy: fetch authority × freshness — the reference's central
control surface, as pure vectorizable decision functions.

Reference parity (file:line into /root/reference/lib/traversalPolicy.js):
- canonical policies (:106-142): default/event/refresh = (mutables, match),
  reload = (originStorage, match), reprocess = (storageOnly, version),
  reprocessAndDiscover = (storageOriginIfMissing, version),
  reprocessAndUpdate = (mutables, matchOrVersion),
  always = (originOnly, always), reprocessAlways = (storageOnly, always).
- initialFetch (:203-210): where the first fetch goes — storage / etag
  (= conditional origin fetch) / origin; 'mutables' resolves per-resource
  immutability (:198-200).
- shouldFetchMissing (:215-221): fallback source when the initial fetch
  finds nothing.
- shouldProcess (:170-189): always | match (content came from origin) |
  version (stored processing version behind) | matchOrVersion | N days.
- getShortForm (:226-236).

The engine consults this through the frontier's ``policy`` column:
freshness 'always' rows bypass the etag/304 content-dedup short-circuit
(see stages/engine_stages.resolve_etag_frame and the oracle), and the
storage-authority scenarios run as the batch reprocess pipeline
(pipelines/reprocess.py) over the doc store, which is what the
reference's reprocess scenarios operate on too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: policy name → (fetch authority, freshness)
CANONICAL: dict[str, tuple[str, str]] = {
    "default": ("mutables", "match"),
    "event": ("mutables", "match"),
    "refresh": ("mutables", "match"),
    "reload": ("originStorage", "match"),
    "reprocess": ("storageOnly", "version"),
    "reprocessAndDiscover": ("storageOriginIfMissing", "version"),
    "reprocessAndUpdate": ("mutables", "matchOrVersion"),
    "always": ("originOnly", "always"),
    "reprocessAlways": ("storageOnly", "always"),
}

#: fetch authority → initial fetch source (traversalPolicy.js:203-210);
#: 'mutables' maps to 'storage' for immutable resources, 'etag' otherwise
INITIAL_FETCH = {"storageOnly": "storage", "originStorage": "etag",
                 "storageOriginIfMissing": "storage", "originOnly": "origin"}

#: fetch authority → source when the initial fetch found nothing (:215-221)
FETCH_MISSING = {"storageOnly": "", "originStorage": "origin",
                 "storageOriginIfMissing": "origin", "mutables": "origin",
                 "originOnly": ""}

FETCH_SHORT = {"storageOnly": "S", "storageOriginIfMissing": "s",
               "originOnly": "O", "originStorage": "o", "mutables": "m"}
FRESH_SHORT = {"always": "A", "match": "M", "version": "V",
               "matchOrVersion": "m"}


def parse_policy(spec: str) -> tuple[str, str]:
    """'<policyName>[:mapSpec]' → (fetch, freshness); the optional mapSpec
    names the visitor map (see visitor_map.py)."""
    name = spec.split(":")[0] if spec else "default"
    if name not in CANONICAL:
        raise ValueError(f"unknown policy {name!r}")
    return CANONICAL[name]


def freshness_of(spec: str) -> str:
    return parse_policy(spec)[1]


def is_always(spec) -> bool:
    try:
        return freshness_of(str(spec)) == "always"
    except ValueError:
        return False


def decide_frame(df: pd.DataFrame, current_version: int = 1,
                 n_days: int = 7) -> pd.DataFrame:
    """Vectorized decision table over rows with columns
    (policy, immutable:bool, in_storage:bool, etag_match:bool,
    stored_version:int64[-1 = never processed], age_days:int64).

    Returns per row: fetch, freshness, initial_fetch, refetch_missing,
    content_origin, should_process, short_form — each rule mirrored 1:1
    by the DuckDB CASE chain in __ray_entry__ (crawl_policy query)."""
    pol = df["policy"].astype(str)
    fetch = pol.map(lambda p: parse_policy(p)[0])
    fresh = pol.map(lambda p: parse_policy(p)[1])
    immutable = df["immutable"].to_numpy(dtype=bool)
    in_storage = df["in_storage"].to_numpy(dtype=bool)
    etag_match = df["etag_match"].to_numpy(dtype=bool)
    stored_v = df["stored_version"].to_numpy(dtype=np.int64)
    age = df["age_days"].to_numpy(dtype=np.int64)

    # initialFetch: mutables → storage (immutable) else etag
    initial = np.where(fetch.to_numpy() == "mutables",
                       np.where(immutable, "storage", "etag"),
                       fetch.map(INITIAL_FETCH).fillna("").to_numpy())
    refetch = fetch.map(FETCH_MISSING).fillna("").to_numpy()

    # where the content actually came from, given the probe outcomes:
    # origin fetch → origin; etag fetch → cache hit iff stored copy
    # matches origin; storage fetch → storage if present, else the
    # missing-fallback source (or none)
    content = np.where(
        initial == "origin", "origin",
        np.where(initial == "etag",
                 np.where(in_storage & etag_match, "cacheOfOrigin", "origin"),
                 np.where(in_storage, "storage",
                          np.where(refetch == "origin", "origin", "none"))))

    fr = fresh.to_numpy()
    version_behind = (stored_v < 0) | (stored_v < current_version)
    should = np.select(
        [fr == "always",
         fr == "match",
         fr == "version",
         fr == "matchOrVersion"],
        [np.ones(len(df), dtype=bool),
         content == "origin",
         version_behind,
         (content == "origin") | version_behind],
        default=age > n_days)
    # a row whose content could not be sourced at all is never processed
    should = should & (content != "none")

    short = fetch.map(FETCH_SHORT).fillna("?") + fresh.map(FRESH_SHORT).fillna("N")
    return pd.DataFrame({
        "policy": pol.to_numpy(),
        "immutable": immutable, "in_storage": in_storage,
        "etag_match": etag_match,
        "stored_version": stored_v, "age_days": age,
        "fetch": fetch.to_numpy(), "freshness": fresh.to_numpy(),
        "initial_fetch": initial, "refetch_missing": refetch,
        "content_origin": content,
        "should_process": should,
        "short_form": short.to_numpy(),
    })


def decision_table_inputs() -> pd.DataFrame:
    """The deterministic conformance corpus: full cross-product of the
    canonical policies × probe outcomes (the gitHubProcessorTests.js:11-47
    version-gating matrix generalized)."""
    rows = []
    for policy in sorted(CANONICAL):
        for immutable in (False, True):
            for in_storage in (False, True):
                for etag_match in (False, True):
                    for stored_v in (-1, 0, 1):
                        for age in (0, 30):
                            rows.append((policy, immutable, in_storage,
                                         etag_match and in_storage,
                                         stored_v if in_storage else -1, age))
    df = pd.DataFrame(rows, columns=["policy", "immutable", "in_storage",
                                     "etag_match", "stored_version",
                                     "age_days"])
    df = df.drop_duplicates().reset_index(drop=True)
    df.insert(0, "case_id", np.arange(len(df), dtype=np.int64))
    return df
