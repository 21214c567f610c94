"""Property-based tests (hypothesis) for the pure shared kernels the
engine AND oracle both import — invariants example-based tests can't
sweep: URL-normalizer idempotence, hash stability/pandas-vs-list
agreement, politeness budget conservation under salting, cuckoo filter
no-false-negatives with deletes, and rolling-hash windowing bounds.
(The reference has no property tests — SURVEY.md §5 — this is the
rebuild going beyond its test strategy.)
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ghcrawler_ray.ops.text import _rolling_hashes
from ghcrawler_ray.state.cuckoo import CuckooFilter
from ghcrawler_ray.state.politeness import (admit_mask, host_budget,
                                            salted_budgets)
from ghcrawler_ray.urls import hash64_array, is_malformed_series, \
    normalize_series

url_text = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=60)
urls = st.one_of(
    url_text,
    st.builds(lambda h, p: f"http://{h}/{p}", url_text, url_text),
    st.builds(lambda h, p, f: f"HTTPS://{h}:443/{p}#{f}",
              url_text, url_text, url_text))


@settings(max_examples=200, deadline=None)
@given(st.lists(urls, min_size=1, max_size=20))
def test_normalize_idempotent(us):
    s = pd.Series(us)
    once = normalize_series(s)
    twice = normalize_series(once)
    assert (once == twice).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(urls, min_size=1, max_size=20))
def test_normalized_valid_urls_keep_scheme_and_host(us):
    s = normalize_series(pd.Series(us))
    ok = ~is_malformed_series(s)
    import re
    for u in s[ok]:
        assert u.startswith(("http://", "https://"))
        host = re.match(r"^https?://([^/?#]*)", u).group(1)
        assert host == host.lower()
        assert "#" not in u


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=30))
def test_hash64_stable_and_input_form_independent(vals):
    s = pd.Series(vals, dtype=str)
    a = hash64_array(s)
    b = hash64_array(list(s))
    assert (a == b).all()
    assert (a >= 0).all()          # 63-bit: shard/bucket modulo stays exact
    # equal strings hash equal, per-call deterministic
    assert (hash64_array(s) == a).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 10_000), st.integers(1, 64))
def test_salted_budgets_conserve_total(budget, factor):
    parts = salted_budgets(budget, factor)
    assert sum(parts) == budget
    assert max(parts) - min(parts) <= 1     # fair split


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 5_000), st.integers(1, 200), st.integers(100, 60_000))
def test_host_budget_bounds(delay, cap, wave_ms):
    b = host_budget(delay, cap, wave_ms)
    assert 1 <= b <= cap


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_admit_mask_counts(data):
    n = data.draw(st.integers(1, 60))
    budget = data.draw(st.integers(1, 80))
    factor = data.draw(st.integers(2, 8))
    hot = data.draw(st.booleans())
    g = pd.DataFrame({
        "rank": data.draw(st.lists(st.integers(0, 4), min_size=n, max_size=n)),
        "seq": np.arange(n, dtype=np.int64),
        "depth": np.zeros(n, dtype=np.int64),
        "discovered_from": [""] * n,
        "url_hash": data.draw(st.lists(st.integers(0, 2**62), min_size=n,
                                       max_size=n)),
    })
    mask = admit_mask(g, budget, hot, factor)
    if not hot:
        assert mask.sum() == min(budget, n)
    else:
        # per-subgroup budgets: admitted = Σ min(sub_budget, sub_size)
        salt = (g["url_hash"].to_numpy() % factor).astype(int)
        budgets = salted_budgets(budget, factor)
        want = sum(min(budgets[s], int((salt == s).sum()))
                   for s in range(factor))
        assert mask.sum() == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=300, unique=True),
       st.data())
def test_cuckoo_no_false_negatives_with_deletes(keys, data):
    cf = CuckooFilter(capacity=4096)
    h = np.array(keys, dtype=np.int64)
    cf.add_many(h)
    assert cf.contains_many(h).all()                 # no false negatives
    k = data.draw(st.integers(0, len(keys)))
    dels = h[:k]
    cf.delete_many(dels)
    assert cf.contains_many(h[k:]).all()             # survivors still present


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.integers(2, 12))
def test_rolling_hashes_window_count(s, k):
    h = _rolling_hashes(s, k)
    n = len(s.encode("utf-8"))
    assert len(h) == max(n - k + 1, 0)
    # determinism + suffix consistency: gram i of s equals gram 0 of s[i:]
    if len(h) > 1:
        tail_units = s.encode("utf-8")[1:].decode("utf-8", errors="ignore")
        if len(tail_units.encode("utf-8")) == n - 1:   # clean byte slice
            h2 = _rolling_hashes(tail_units, k)
            if len(h2):
                assert h[1] == h2[0]


# ---- readability kernel (ops/text.readability_batch) ----

doc_text = st.text(alphabet=st.characters(min_codepoint=32,
                                          max_codepoint=126), max_size=200)


@settings(max_examples=150, deadline=None)
@given(st.lists(doc_text, min_size=1, max_size=12))
def test_readability_counts_and_clamps(texts):
    from ghcrawler_ray.ops.text import readability_batch
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = readability_batch(df)
    # counts are non-negative and syllable runs never exceed word chars
    assert (out["n_words"] >= 0).all()
    assert (out["n_sentences"] >= 0).all()
    # every [a-z]+ word contains >= 0 vowel runs; vowel runs can't
    # outnumber total letter runs * max run splits — weak but real:
    # syllables == 0 whenever words == 0 and text has no bare vowels
    noletters = out["n_words"] == 0
    assert (out.loc[noletters, "n_syllables"] == 0).all()
    # flesch is finite for every row (clamped denominators)
    assert np.isfinite(out["flesch"].to_numpy(np.float64)).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=30),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=4))
def test_member_mask_matches_python_membership(keys, num, den):
    from ghcrawler_ray.ops.relational import _member_mask
    table = np.sort(np.unique(np.array(keys[: len(keys) // 2] or [0],
                                       dtype=np.int64)))
    probe = np.array(keys, dtype=np.int64)
    got = _member_mask(table, probe)
    want = np.isin(probe, table)
    assert (got == want).all()
    empty = _member_mask(np.empty(0, dtype=np.int64), probe)
    assert empty.dtype == bool and not empty.any()
