"""Politeness budget / salting units (reference: token bench
`providers/fetcher/tokenFactory.js:81-93`, call caps
`lib/crawlerFactory.js:74-76`; skew salting SURVEY.md §7.4)."""

import numpy as np
import pandas as pd

from ghcrawler_ray.state.politeness import (ORDER_COLS, admit_first_n,
                                            admit_mask, group_budget,
                                            host_budget, polite_salt,
                                            salted_budgets)


def _grp(n, seed=0):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "rank": rng.randint(0, 5, n).astype(np.int8),
        "seq": rng.permutation(n).astype(np.int64),
        "depth": np.zeros(n, dtype=np.int32),
        "discovered_from": [""] * n,
        "url_hash": rng.randint(0, 1 << 62, n).astype(np.int64),
    })


def test_host_budget():
    assert host_budget(0, 1000, 10_000) == 1000      # no delay → window cap
    assert host_budget(100, 1000, 10_000) == 100     # delay-bound
    assert host_budget(500, 50, 10_000) == 20        # min(cap, wave/delay)
    assert host_budget(20_000, 50, 10_000) == 1      # at least one per wave


def test_salted_budgets_sum_and_spread():
    assert salted_budgets(10, 4) == [3, 3, 2, 2]
    assert sum(salted_budgets(7, 3)) == 7
    assert salted_budgets(2, 4) == [1, 1, 0, 0]


def test_polite_salt_cold_vs_hot():
    uh = np.arange(100, dtype=np.int64)
    assert (polite_salt(uh, hot=False, salt_factor=4) == 0).all()
    s = polite_salt(uh, hot=True, salt_factor=4)
    assert set(s.tolist()) == {0, 1, 2, 3}
    assert (s == uh % 4).all()


def test_admit_first_n_is_order_cols_prefix():
    g = _grp(20)
    mask = admit_first_n(g, 5)
    assert mask.sum() == 5
    ordered = g.reset_index(drop=True).sort_values(ORDER_COLS, kind="stable")
    admitted_pos = set(np.flatnonzero(mask).tolist())
    assert set(ordered.index[:5].tolist()) == admitted_pos


def test_admit_mask_hot_equals_per_salt_group_admission():
    g = _grp(40, seed=3)
    budget, sf = 10, 4
    mask = admit_mask(g, budget, hot=True, salt_factor=sf)
    assert mask.sum() == min(budget, len(g))
    # equivalent to admitting salted_budgets per subgroup independently
    salts = (g["url_hash"].to_numpy() % sf).astype(int)
    budgets = salted_budgets(budget, sf)
    for grp in range(sf):
        sub = g[salts == grp]
        sub_mask = admit_first_n(sub, budgets[grp])
        assert (mask[salts == grp] == sub_mask).all()


def test_group_budget_consistency():
    assert group_budget(10, False, 4, 0) == 10
    assert [group_budget(10, True, 4, s) for s in range(4)] == salted_budgets(10, 4)


def test_n_salts_adaptive():
    from ghcrawler_ray.config import CrawlConfig
    from ghcrawler_ray.state.politeness import n_salts_for, salt_map

    # cold host (<= threshold) stays unsalted; just-hot gets the floor;
    # zipf-head splits proportionally; cap bounds the split
    assert n_salts_for(2000, 2000, 4, 32) == 1
    assert n_salts_for(2001, 2000, 4, 32) == 4
    assert n_salts_for(20_000, 2000, 4, 32) == 10
    assert n_salts_for(1_000_000, 2000, 4, 32) == 32

    cfg = CrawlConfig()          # threshold 2000, floor 4, cap 32, parts 64
    m = salt_map({"a": 10, "b": 2001, "c": 30_000}, cfg)
    assert m == {"b": 4, "c": 15}
    # cap is additionally bounded by half the partition width
    cfg2 = CrawlConfig(n_polite_parts=16)
    assert salt_map({"c": 1_000_000}, cfg2) == {"c": 8}
    # unsalted hosts are omitted (map stays O(#hot hosts))
    assert salt_map(pd.Series({"a": 1}), cfg) == {}
