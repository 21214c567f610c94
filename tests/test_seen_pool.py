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


# ---- plugin registry (ghcrawler_ray/plugins.py, SURVEY §2.9) ----

def test_custom_seen_filter_plugin():
    """A third-party seen-set backend registered by name works through
    the whole shard surface (claim / snapshot / restore) — the
    reference's dynamic provider loading analogue. Local shard: the
    registry lives in this process."""
    import numpy as np

    from ghcrawler_ray import plugins
    from ghcrawler_ray.state.seen import SeenShard, _Exact64

    class TaggedExact(_Exact64):
        def to_state(self):
            st = super().to_state()
            st["kind"] = "tagged-exact"
            return st

        @classmethod
        def from_state(cls, st):
            obj = cls(0)
            obj._base = np.unique(np.asarray(st["hashes"],
                                             dtype=np.int64))
            return obj

    plugins.register_seen_filter("tagged-exact", TaggedExact)
    assert "tagged-exact" in plugins.seen_filter_names()

    shard = SeenShard(0, mode="tagged-exact", capacity=1 << 10)
    shard.begin_wave(0)
    h = np.array([11, 22, 33], dtype=np.int64)
    assert shard.claim(h).all()
    snap = shard.snapshot()
    assert snap["urls"]["kind"] == "tagged-exact"
    shard.restore(snap)
    shard.begin_wave(1)                  # new wave: no retry amnesty
    assert not shard.claim(h).any()      # still seen after restore
    assert shard.contains(h).all()


def test_dotted_path_seen_filter_in_actor(ray_session):
    """"module:Class" seen_mode resolves inside the ACTOR process — no
    registry state ships; each worker imports the backend itself (the
    require('ghcrawler-'+name) semantics)."""
    import numpy as np
    import ray as _ray

    from ghcrawler_ray.state.seen import SeenShard

    shard = _ray.remote(SeenShard).options(num_cpus=0).remote(
        0, mode="ghcrawler_ray.state.cuckoo:CuckooFilter",
        capacity=1 << 10)
    _ray.get(shard.begin_wave.remote(0))
    h = np.array([7, 8], dtype=np.int64)
    assert _ray.get(shard.claim.remote(h)).all()
    assert _ray.get(shard.contains.remote(h)).all()
    snap = _ray.get(shard.snapshot.remote())
    _ray.get(shard.restore.remote(snap))   # cuckoo kind restores
    _ray.get(shard.begin_wave.remote(1))   # new wave: no retry amnesty
    assert not _ray.get(shard.claim.remote(h)).any()
