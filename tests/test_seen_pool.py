"""Sharded seen-set actor pool (reference: global enqueue dedup
`providers/queuing/redisRequestTracker.js:95-138` + etag index
`providers/storage/storageDocStore.js:81-93`)."""

import numpy as np
import pytest

from ghcrawler_ray.state.seen import SeenSetPool
from ghcrawler_ray.urls import hash64_array


@pytest.fixture(scope="module")
def pool(ray_session):
    return SeenSetPool(n_shards=4, namespace="test-seen")


def _h(urls):
    return hash64_array(np.array(urls, dtype=object))


def test_claim_bounce_untrack(pool):
    urls = [f"http://h{i % 7}.example/p/{i}" for i in range(200)]
    first = pool.claim(_h(urls))
    assert first.all()                      # all new → claimed
    again = pool.claim(_h(urls))
    assert not again.any()                  # all bounce
    # untrack (redisRequestTracker.js:43-53) frees the key for re-claim
    assert pool.untrack(_h(urls[:10])).all()
    re = pool.claim(_h(urls)).tolist()
    assert re[:10] == [True] * 10 and not any(re[10:])


def test_mixed_batch_claim(pool):
    old = [f"http://h{i % 7}.example/p/{i}" for i in range(0, 50)]
    new = [f"http://new{i}.example/x/{i}" for i in range(50)]
    res = pool.claim(_h(old + new))
    assert not res[:50].any() and res[50:].all()


def test_etag_namespace_independent(pool):
    etags = [f"etag-{i}" for i in range(30)]
    assert pool.claim_etags(_h(etags)).all()
    assert not pool.claim_etags(_h(etags)).any()
    # url namespace unaffected by etag claims
    assert pool.claim(_h(["http://etag-crossover.example/"])).all()


def test_snapshot_restore_exact(pool):
    snap = pool.snapshot_all()
    marker = ["http://snapshot-marker.example/"]
    assert pool.claim(_h(marker)).all()
    pool.restore_all(snap)                  # roll back
    assert pool.claim(_h(marker)).all()     # marker forgotten again
    stats = pool.stats()
    assert len(stats) == 4
    assert sum(s["n_urls"] for s in stats) > 0


def test_wave_idempotent_claims(ray_session):
    """A Ray task retried after its claim RPC already succeeded must be
    able to re-claim the same hashes within the wave (and still bounce on
    hashes claimed in EARLIER waves)."""
    p = SeenSetPool(n_shards=2, namespace="test-seen-wave")
    p.begin_wave(0)
    a = [f"http://w0-{i}.example/" for i in range(40)]
    assert p.claim(_h(a)).all()
    assert p.claim(_h(a)).all()          # retry within wave 0 → still True
    assert p.claim_etags(_h(a)).all()
    assert p.claim_etags(_h(a)).all()    # etag namespace: same idempotency
    p.begin_wave(1)
    assert not p.claim(_h(a)).any()      # next wave → strict bounce again
    assert not p.claim_etags(_h(a)).any()
    b = [f"http://w1-{i}.example/" for i in range(10)]
    assert p.claim(_h(b)).all()
    assert p.claim(_h(b)).all()          # retry in wave 1 → True


def test_cuckoo_mode_pool(ray_session):
    p = SeenSetPool(n_shards=2, mode="cuckoo", capacity_per_shard=10_000,
                    namespace="test-seen-ck")
    urls = [f"http://ck{i}.example/{i}" for i in range(500)]
    assert p.claim(_h(urls)).all()
    assert not p.claim(_h(urls)).any()
    snaps = p.snapshot_all()
    # compact: ~2.25 B/slot at this capacity, snapshot ≪ 64 KiB per shard
    assert all(s["urls"]["table"].nbytes <= 1 << 16 for s in snaps)
