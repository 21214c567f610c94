"""Per-host politeness budgets + deterministic hot-host salting.

Reference parity: the token bench / call-cap machinery
(`providers/fetcher/tokenFactory.js:81-93` bench-until timestamps;
`providers/fetcher/limitedTokenFactory.js:19-42` 30-calls/1s sliding window;
`providers/limiting/computeLimiter.js:27-77` compute budget) — re-expressed
as a *per-wave, per-host fetch budget*: within one wave (a ``wave_ms``
window of virtual time) host h may fetch at most

    budget(h) = max(1, min(max_per_window, wave_ms // crawl_delay_ms))

rows; excess rows are deferred to the next wave with
``not_before = clock + wave_ms`` (the bench/requeue analogue,
`lib/crawler.js:152-154`).

Skew (SURVEY.md §7.4): a host with more than ``salt_threshold`` candidate
rows in a wave is split into ``salt_factor`` sub-groups by
``url_hash % salt_factor`` whose budgets sum to budget(h) — per-subgroup
FIFO order is preserved, total host rate is preserved, and the rule is a
pure function of the wave's rows, so the sequential oracle replays it
exactly. These functions are THE shared definition used by both the Ray
engine and the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: deterministic tie-break for every "first by priority" decision in the
#: engine: priority rank, then FIFO seq, then lineage columns.
ORDER_COLS = ["rank", "seq", "depth", "discovered_from"]


def host_budget(crawl_delay_ms: int, max_per_window: int, wave_ms: int) -> int:
    if crawl_delay_ms <= 0:
        per_delay = max_per_window
    else:
        per_delay = wave_ms // crawl_delay_ms
    return int(max(1, min(max_per_window, per_delay)))


def salted_budgets(budget: int, salt_factor: int) -> list[int]:
    """Split a host budget into salt_factor parts summing to budget."""
    base, rem = divmod(budget, salt_factor)
    return [base + (1 if g < rem else 0) for g in range(salt_factor)]


def n_salts_for(n_prev: int, threshold: int, base: int, cap: int) -> int:
    """ADAPTIVE salt-group count for a host whose previous-wave politeness
    candidate count was ``n_prev``: cold hosts (≤ threshold) stay unsalted;
    hot hosts split into enough groups that each holds ≈ ``threshold``
    rows — never fewer than ``base`` (cfg.salt_factor, the floor) nor more
    than ``cap`` (cfg.salt_cap, bounded by the partition width). A fixed
    factor under-splits zipf-head hosts: at sf1.0 the hottest host holds
    ~1/3 of the wave, and with factor 4 its groups ran 6-7× the mean
    partition (a 1.5 s straggler in a 2.2 s stage wall, measured 32-cpu).
    Pure function of (count, cfg) so engine and sequential oracle derive
    identical salting — the shared-contract requirement above."""
    if n_prev <= threshold:
        return 1
    return int(min(cap, max(base, n_prev // threshold)))


def salt_counts(host_counts, threshold: int, base: int, cap: int) -> dict:
    """host → n_salts map for the NEXT wave from this wave's per-host
    candidate counts (any mapping/Series); hosts that stay unsalted are
    omitted so the map is O(#hot hosts)."""
    out = {}
    for h, n in (host_counts.items() if hasattr(host_counts, "items")
                 else host_counts):
        ns = n_salts_for(int(n), threshold, base, cap)
        if ns > 1:
            out[str(h)] = ns
    return out


def salt_map(host_counts, cfg) -> dict:
    """host → n_salts for the NEXT wave from this wave's per-host
    politeness-candidate counts, under ``cfg``'s threshold / floor / cap.
    The cap is additionally bounded to half the politeness partition
    width so one zipf-head host can never monopolize the polite_part
    space. THE shared hotness rule: engine sidecar merge, local fast
    path and sequential oracle all call this with identical counts."""
    cap = min(int(cfg.salt_cap), max(2, int(cfg.n_polite_parts) // 2))
    return salt_counts(host_counts, cfg.salt_threshold, cfg.salt_factor, cap)


def polite_salt(url_hash: np.ndarray, hot: bool, salt_factor: int) -> np.ndarray:
    """Salt-group index per row: 0 for cold hosts, hash-split for hot ones.

    Hotness for wave k is decided by wave k-1's candidate counts (driver /
    oracle both track it), so the salt can be part of the shuffle key and a
    hot host's rows genuinely spread over ``salt_factor`` tasks."""
    uh = np.asarray(url_hash, dtype=np.int64)
    if not hot or salt_factor <= 1:
        return np.zeros(len(uh), dtype=np.int16)
    return (uh % salt_factor).astype(np.int16)


def group_budget(budget: int, hot: bool, salt_factor: int, salt_g: int) -> int:
    """Budget of one (host, salt) politeness group; salted budgets sum to
    the host budget, preserving the host's total rate."""
    if not hot or salt_factor <= 1:
        return budget
    return salted_budgets(budget, salt_factor)[int(salt_g)]


def admit_first_n(group: pd.DataFrame, budget: int) -> np.ndarray:
    """Admit the first ``budget`` rows by ORDER_COLS (positional mask)."""
    order = group.reset_index(drop=True).sort_values(
        ORDER_COLS, kind="stable").index.to_numpy()
    mask = np.zeros(len(group), dtype=bool)
    mask[order[:budget]] = True
    return mask


def admit_mask(group: pd.DataFrame, budget: int, hot: bool, salt_factor: int) -> np.ndarray:
    """Boolean admit mask (aligned to group's positional order) for one
    host's candidate rows in one wave. Deterministic: admission is 'first
    ``budget`` rows by ORDER_COLS', per salt-subgroup when hot."""
    order = group.reset_index(drop=True).sort_values(ORDER_COLS, kind="stable").index.to_numpy()
    n = len(group)
    mask = np.zeros(n, dtype=bool)
    if not hot or salt_factor <= 1:
        mask[order[:budget]] = True
        return mask
    salt = (group["url_hash"].to_numpy() % salt_factor).astype(np.int64)
    budgets = salted_budgets(budget, salt_factor)
    taken = [0] * salt_factor
    for pos in order:
        g = int(salt[pos])
        if taken[g] < budgets[g]:
            mask[pos] = True
            taken[g] += 1
    return mask
