"""Bloom / cuckoo filter properties (reference semantics: tracker tag set
with untrack, `providers/queuing/redisRequestTracker.js:17-53`)."""

import numpy as np

from ghcrawler_ray.state.bloom import BloomFilter
from ghcrawler_ray.state.cuckoo import CuckooFilter


def _hashes(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << 62, n).astype(np.int64)


def test_bloom_no_false_negatives_and_fp_bound():
    bf = BloomFilter(capacity=10_000)
    added = _hashes(10_000, 1)
    bf.add_many(added.astype(np.uint64))
    assert bf.contains_many(added.astype(np.uint64)).all()
    other = _hashes(10_000, 2)
    fresh = np.setdiff1d(other, added)
    fp = bf.contains_many(fresh.astype(np.uint64)).mean()
    assert fp < 0.01  # 12 bits/item, 6 hashes → ~5e-4 expected


def test_bloom_snapshot_and_merge():
    a, b = BloomFilter(1000), BloomFilter(1000)
    ha, hb = _hashes(500, 3).astype(np.uint64), _hashes(500, 4).astype(np.uint64)
    a.add_many(ha)
    b.add_many(hb)
    a2 = BloomFilter.from_state(a.to_state())
    a2.merge(b)
    assert a2.contains_many(ha).all() and a2.contains_many(hb).all()


def test_cuckoo_membership_and_delete():
    cf = CuckooFilter(capacity=10_000)
    added = _hashes(8_000, 5)
    assert cf.add_many(added).all()
    assert cf.contains_many(added).all()          # no false negatives
    # untrack semantics (redisRequestTracker.js:43-53): delete then re-add
    victims = added[:100]
    assert cf.delete_many(victims).all()
    assert cf.add_many(victims).all()
    assert cf.contains_many(victims).all()


def test_cuckoo_fp_rate_small():
    cf = CuckooFilter(capacity=20_000)
    added = _hashes(15_000, 6)
    cf.add_many(added)
    fresh = np.setdiff1d(_hashes(20_000, 7), added)
    fp = cf.contains_many(fresh).mean()
    assert fp < 5e-3  # 16-bit fp, 4-slot buckets → ~1.2e-4 expected


def test_cuckoo_snapshot_roundtrip():
    cf = CuckooFilter(capacity=1_000)
    h = _hashes(800, 8)
    cf.add_many(h)
    cf2 = CuckooFilter.from_state(cf.to_state())
    assert cf2.n_items == cf.n_items
    assert cf2.contains_many(h).all()


def test_discovery_seen_filter_oracle_invariants():
    """The discovery-time seen filter must shrink processed volume
    (dropped links never ride to a bounce) while leaving the final
    crawl — the seen set — EXACTLY unchanged."""
    from ghcrawler_ray.config import CrawlConfig
    from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
    from ghcrawler_ray.testgen import ensure_testdata

    web = load_web(ensure_testdata(0.0001))
    on = SequentialOracle(web, CrawlConfig(max_waves=30)).run()
    off = SequentialOracle(web, CrawlConfig(
        max_waves=30, discovery_seen_filter=False)).run()
    assert set(on["seen"]["url"]) == set(off["seen"]["url"])
    b_on = (on["order"]["outcome"] == "bounced").sum()
    b_off = (off["order"]["outcome"] == "bounced").sum()
    assert b_on < b_off          # filter engaged: most bounces pre-dropped
    assert len(on["order"]) < len(off["order"])
    # remaining bounces = targets claimed DURING the discovery wave
    # (the frozen wave-start view keeps them by design)
    assert b_on > 0
