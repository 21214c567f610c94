"""Unit tests for the corpus-curation ops (ghcrawler_ray/ops/corpus.py)
and near-dup clustering (ops/dedup.py): behaviors the synthetic sf
documents can't exercise — real PII hits, multi-round label propagation
on path graphs — plus determinism of the sampling hash. The full
value-vs-DuckDB-oracle gate for these ops lives in test_ops_oracle.py.
"""

import numpy as np
import pandas as pd
import ray.data

from ghcrawler_ray.ops.corpus import (SAMPLE_PCT, pii_scrub_batch,
                                      repetition_batch, sample_bucket,
                                      stratified_sample_batch)
from ghcrawler_ray.ops.dedup import _cc_labels, dup_clusters


def test_pii_scrub_redacts_and_counts():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail a@b.co or c.d+x@e-f.org now",
            "host 10.0.0.1 and 192.168.255.254 call +4915123456789",
            "clean text, no pii at all",
        ],
    })
    out = pii_scrub_batch(df)
    assert out["n_emails"].tolist() == [2, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0]
    assert out["n_phones"].tolist() == [0, 1, 0]
    # doc 3 untouched → md5 equals md5 of the original text
    import hashlib
    assert out["clean_md5"].iloc[2] == hashlib.md5(
        df["text"].iloc[2].encode()).hexdigest()
    assert out["clean_md5"].iloc[0] != hashlib.md5(
        df["text"].iloc[0].encode()).hexdigest()


def test_pii_redaction_order_email_before_ip():
    # an ip inside an email address is consumed by the (earlier) email
    # redaction and must not be double-counted as an ipv4 hit
    df = pd.DataFrame({"doc_id": [1], "text": ["x@10.0.0.1.ab rest 1.2.3.4"]})
    out = pii_scrub_batch(df)
    assert out["n_emails"].iloc[0] == 1
    assert out["n_ipv4"].iloc[0] == 1            # only the bare 1.2.3.4


def test_sample_bucket_deterministic_and_stratified():
    ids = np.arange(1000)
    b1, b2 = sample_bucket(ids), sample_bucket(ids)
    assert (b1 == b2).all()
    assert 0 <= b1.min() and b1.max() < 100
    df = pd.DataFrame({"doc_id": ids, "lang": ["en"] * 500 + ["de"] * 500})
    out = stratified_sample_batch(df)
    en = out[out["lang"] == "en"]
    de = out[out["lang"] == "de"]
    assert len(de) == 500                         # unlisted-rate langs keep all
    assert abs(len(en) - 5 * SAMPLE_PCT["en"]) < 100   # ≈ pct% of 500
    assert (en["sample_bucket"] < SAMPLE_PCT["en"]).all()


def test_repetition_metrics_extremes():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spam spam spam spam spam", "all words fully distinct here", ""],
    })
    out = repetition_batch(df)
    r = out.set_index("doc_id")
    assert r.loc[1, "dup_token_frac"] == 0.8       # 5 tokens, 1 distinct
    assert r.loc[1, "dup_2gram_frac"] == 0.75      # 4 grams, 1 distinct
    assert r.loc[1, "is_repetitive"] == 1
    assert r.loc[2, "dup_token_frac"] == 0.0
    assert r.loc[2, "is_repetitive"] == 0
    assert r.loc[3, "n_tokens"] == 0 and r.loc[3, "is_repetitive"] == 0


def test_cc_labels_path_graph_needs_multiple_rounds(ray_session):
    """A 6-node path 10-11-...-15 has diameter 5: min-label propagation
    must iterate past round one to converge; plus a separate clique and
    make sure the two components don't merge."""
    edges = pd.DataFrame({
        "doc_a": [10, 11, 12, 13, 14, 100, 100, 101],
        "doc_b": [11, 12, 13, 14, 15, 101, 102, 102],
    })
    labels = _cc_labels(ray.data.from_pandas(edges)).to_pandas()
    lab = labels.set_index("node")["label"].to_dict()
    assert all(lab[n] == 10 for n in range(10, 16))
    assert all(lab[n] == 100 for n in (100, 101, 102))


def test_dup_clusters_on_planted_dups(ray_session):
    """Three near-identical docs (shared shingles ≫ threshold) → one
    cluster keyed by the min doc_id with keep=1 only there; unrelated
    docs are singletons."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 7, 9],
        "text": [base + "one", base + "two", base + "three",
                 "totally different words entirely unrelated content here",
                 "yet another completely separate document body text"],
        "lang": ["en"] * 5,
    })
    out = dup_clusters(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["cluster_id"].tolist() == [1, 1, 1, 7, 9]
    assert out["cluster_size"].tolist() == [3, 3, 3, 1, 1]
    assert out["keep"].tolist() == [1, 0, 0, 1, 1]


def test_asof_join_tiebreak_and_missing(ray_session):
    """Equal-ts purchases resolve to the larger event_id; clicks with no
    prior purchase get (-1, 0.0); exact-ts matches are included."""
    from ghcrawler_ray.ops.events import asof_join_events
    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:00",   # two purchases, same ts
        "2024-01-01 10:30",                        # click after both
        "2024-01-01 09:00",                        # click before any
        "2024-01-01 10:00",                        # click AT purchase ts
    ])
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "ts": ts.astype("datetime64[us]"),
        "user_id": [7, 7, 7, 7, 7],
        "event_type": ["purchase", "purchase", "click", "click", "click"],
        "value": [10.0, 20.0, 0.0, 0.0, 0.0],
        "props": [""] * 5,
    })
    out = asof_join_events(ray.data.from_pandas(ev)).to_pandas() \
        .set_index("event_id")
    assert out.loc[3, "asof_event_id"] == 2          # larger id wins the tie
    assert out.loc[3, "asof_value"] == 20.0
    assert out.loc[4, "asof_event_id"] == -1
    assert out.loc[4, "asof_value"] == 0.0
    assert out.loc[5, "asof_event_id"] == 2          # ts <= click ts counts


def test_hll_estimate_within_tolerance(ray_session):
    """HLL (m=4096, σ≈1.6%) must land within 5% of the true distinct
    count on a synthetic vocabulary large enough to exercise many
    registers."""
    from ghcrawler_ray.ops.sketch import hll_distinct_tokens
    rows = []
    for lang, n in (("en", 3000), ("de", 800)):
        words = [f"{lang}w{i}" for i in range(n)]
        # spread vocabulary over docs, with repeats
        for d in range(60):
            rows.append({"lang": lang,
                         "text": " ".join(words[d::60] + words[:10])})
    ds = ray.data.from_pandas(pd.DataFrame(rows).assign(
        doc_id=np.arange(len(rows), dtype=np.int64)))
    out = hll_distinct_tokens(ds).to_pandas().set_index("lang")
    for lang, n in (("en", 3000), ("de", 800)):
        est = int(out.loc[lang, "est_distinct"])
        assert abs(est - n) / n < 0.05, (lang, est, n)


def test_kmv_estimate_within_tolerance(ray_session):
    """KMV (k=256, σ≈6%) must land within 15% of the true distinct
    count above k, and be EXACT below k (linear regime), independent of
    partitioning."""
    from ghcrawler_ray.ops.sketch import kmv_distinct_tokens
    rows = []
    for lang, n in (("en", 3000), ("de", 40)):
        words = [f"{lang}w{i}" for i in range(n)]
        for d in range(20):
            rows.append({"lang": lang,
                         "text": " ".join(words[d::20] + words[:5])})
    ds = ray.data.from_pandas(pd.DataFrame(rows).assign(
        doc_id=np.arange(len(rows), dtype=np.int64))).repartition(7)
    out = kmv_distinct_tokens(ds).set_index("lang")
    est = int(out.loc["en", "est_distinct"])
    assert abs(est - 3000) / 3000 < 0.15, est
    assert int(out.loc["de", "est_distinct"]) == 40    # exact below k
    assert int(out.loc["de", "n_kept"]) == 40


def test_pack_sequences_invariants(ray_session):
    """Packing offsets are a per-lang exact prefix sum in doc_id order:
    contiguous, gap-free, independent of input partitioning."""
    from ghcrawler_ray.ops.packing import pack_sequences
    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.where(rng.rand(n) < 0.5, "en", "de"),
        "text": [" ".join(["tok"] * int(k)) for k in rng.randint(0, 90, n)],
    })
    for blocks in (1, 7):
        out = pack_sequences(ray.data.from_pandas(df).repartition(blocks),
                             seq_len=64).to_pandas()
        out = out.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        for lang, g in out.groupby("lang"):
            starts = g["start_off"].to_numpy()
            lens = g["n_tokens"].to_numpy()
            assert starts[0] == 0
            assert (starts[1:] == (starts + lens)[:-1]).all()
            assert (g["start_seq"] == g["start_off"] // 64).all()
            assert (g["offset_in_seq"] == g["start_off"] % 64).all()


def test_corpus_shard_sink_resumable(ray_session, tmp_path):
    """Sharded sink: deterministic shard files, atomic, and a resume
    rewrites ONLY missing shards (finished shards' rows are pruned at
    the scan, their files untouched)."""
    from ghcrawler_ray.ops.sink import (read_corpus_shards, shard_of,
                                        write_corpus_shards)
    n = 400
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": [f"doc {i}" for i in range(n)]})
    out = str(tmp_path / "corpus")
    man = write_corpus_shards(ray.data.from_pandas(df), out, n_shards=8)
    assert (~man["skipped"]).all() and man["shard"].nunique() == 8
    assert int(man["n_rows"].sum()) == n

    # read-back round trip
    back = read_corpus_shards(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    # delete two shards, resume: only those rewritten
    import os
    kept = {p: os.stat(p).st_mtime_ns for p in man["path"]}
    victims = man["path"].iloc[[2, 5]].tolist()
    for v in victims:
        os.unlink(v)
    man2 = write_corpus_shards(ray.data.from_pandas(df), out, n_shards=8)
    redone = man2[~man2["skipped"]]
    assert sorted(redone["path"]) == sorted(victims)
    for p, mt in kept.items():
        if p not in victims:
            assert os.stat(p).st_mtime_ns == mt, f"{p} was rewritten"
    back2 = read_corpus_shards(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df)

    # shard assignment is a pure function of doc_id
    s1 = shard_of(df["doc_id"], 8)
    s2 = shard_of(df["doc_id"].sample(frac=1, random_state=3).sort_values(), 8)
    assert (s1 == s2).all()


def test_cms_overestimates_and_bounds(ray_session):
    """CMS point queries must dominate true counts (overestimate-only)
    and match them exactly when no same-row collision occurs — on a tiny
    corpus with W >> vocab, all estimates are exact."""
    from ghcrawler_ray.ops.sketch import cms_token_counts
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat and the hat", "a cat in the hat", "of the cat"],
    }))
    out = cms_token_counts(docs).set_index("token")["est_n"]
    true = {"the": 4, "a": 1, "and": 1, "of": 1, "in": 1,
            "is": 0, "on": 0, "for": 0, "to": 0, "with": 0}
    for tok, n in true.items():
        assert out[tok] >= n
    # vocab (7 distinct tokens) << W=2048: collisions in ALL 4 rows are
    # effectively impossible, so the min-over-rows is exact here
    assert out["the"] == 4 and out["a"] == 1 and out["is"] == 0


def test_kmeans_fixed_point_determinism(ray_session):
    """Same input split across different block layouts → bit-identical
    centroids (the fixed-point design guarantee), and every vector mass
    is conserved across clusters."""
    from ghcrawler_ray.ops.ann import kmeans_fit
    rng = np.random.RandomState(7)
    n, dim = 120, 8
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.randn(dim).astype(np.float32) * 0.3
                      for _ in range(n)],
    })
    a = kmeans_fit(ray.data.from_pandas(df), k=4, iters=2)
    b = kmeans_fit(ray.data.from_pandas(df).repartition(7), k=4, iters=2)
    pd.testing.assert_frame_equal(a, b)
    assert a[a["dim"] == 0]["n_vecs"].sum() == n


def test_hist_quantiles_within_bin_of_exact(ray_session):
    """The mergeable histogram sketch must land within one bin width
    BELOW the exact nearest-rank quantile (estimate = lower bin edge),
    independent of input partitioning."""
    from ghcrawler_ray.ops.corpus import doc_length_stats
    from ghcrawler_ray.ops.sketch import HIST_BIN_W, hist_length_quantiles
    rng = np.random.RandomState(11)
    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.where(rng.rand(n) < 0.6, "en", "de"),
        "n_chars": rng.randint(1, 5000, n).astype(np.int64),
    })
    exact = None
    for blocks in (1, 9):
        ds = ray.data.from_pandas(df).repartition(blocks)
        est = hist_length_quantiles(ds).to_pandas() \
            .sort_values("lang").reset_index(drop=True)
        if exact is None:
            exact = doc_length_stats(ds).to_pandas() \
                .sort_values("lang").reset_index(drop=True)
            first = est
        else:                       # partition-invariant
            assert est.equals(first)
        for q in ("p50", "p90", "p99"):
            d = exact[f"{q}_chars"].to_numpy() - est[f"est_{q}_chars"].to_numpy()
            assert ((d >= 0) & (d < HIST_BIN_W)).all(), (q, d)


def test_quality_gate_drops_bottom_decile(ray_session):
    """Per-lang drop fraction is ~q (never more than q plus the mass of
    one score bin), thresholds are data-dependent per lang, and the
    result is partition-invariant."""
    from ghcrawler_ray.ops.curate import quality_percentile_gate
    rng = np.random.RandomState(3)
    rows = []
    for i in range(400):
        lang = "en" if i % 2 else "de"
        n_words = int(rng.randint(2, 80))
        words = ["the" if rng.rand() < 0.3 else f"w{rng.randint(50)}"
                 for _ in range(n_words)]
        rows.append({"doc_id": i, "lang": lang, "text": " ".join(words)})
    df = pd.DataFrame(rows)
    first = None
    for blocks in (1, 7):
        out = quality_percentile_gate(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        if first is None:
            first = out
        else:
            assert out.equals(first)
    for lang, g in first.groupby("lang"):
        dropped = 1.0 - g["keep"].mean()
        assert 0.0 < dropped <= 0.1 + 0.05, (lang, dropped)
        # every dropped doc scores strictly below every kept doc's bin
        assert g.loc[~g["keep"], "score_bin"].max() \
            < g.loc[g["keep"], "score_bin"].min() + 1


def test_jl_projection_preserves_similarity(ray_session):
    """The ±1 JL sketch must keep projected cosine close to original
    cosine (the property an ANN prefilter relies on) and be
    partition-invariant / deterministic."""
    from ghcrawler_ray.ops.ann import project_embeddings
    rng = np.random.RandomState(5)
    base = rng.randn(40, 64)
    # make planted near-dup pairs (i, i+20)
    base[20:] = base[:20] + 0.1 * rng.randn(20, 64)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": list(base),
                       "label": np.zeros(40, dtype=np.int64)})
    first = None
    for blocks in (1, 5):
        out = project_embeddings(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas() \
            .sort_values(["vec_id", "out_dim"]).reset_index(drop=True)
        if first is None:
            first = out
        else:
            assert out.equals(first)
    p = first["proj"].to_numpy(dtype=np.float64).reshape(40, 16)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    sims = pn @ pn.T
    planted = np.array([sims[i, i + 20] for i in range(20)])
    off = sims[np.triu_indices(20, k=1)]      # unrelated pairs
    # quantization shifts vectors into the positive orthant, so the
    # unrelated-pair baseline sits high (~0.75); planted dups must still
    # separate clearly above it
    assert planted.mean() > off.mean() + 0.2
    assert planted.min() > off.mean()


def test_vocab_encode_ids_and_oov(ray_session):
    """token_id = frequency rank (count desc, token asc), OOV = 0,
    positions capped at max_pos; partition-invariant."""
    from ghcrawler_ray.ops.text import vocab_encode
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a a a b b c rare1",
                 "b a c c rare2 " + " ".join(f"x{i}" for i in range(80)),
                 "c a b", ""],
    })
    first = None
    for blocks in (1, 3):
        out = vocab_encode(ray.data.from_pandas(df).repartition(blocks),
                           v=3, max_pos=8).to_pandas() \
            .sort_values(["doc_id", "pos"]).reset_index(drop=True)
        if first is None:
            first = out
        else:
            assert out.equals(first)
    # counts: a=6, b=5, c=5 -> ranks a=1, b=2, c=3 (ties by token asc)
    d0 = first[first["doc_id"] == 0]["token_id"].tolist()
    assert d0 == [1, 1, 1, 2, 2, 3, 0]          # rare1 -> OOV 0
    d1 = first[first["doc_id"] == 1]
    assert len(d1) == 8                          # max_pos cap
    assert d1["token_id"].tolist() == [2, 1, 3, 3, 0, 0, 0, 0]
    assert len(first[first["doc_id"] == 3]) == 0  # empty doc -> no rows


def test_mixture_resample_uniformizes_sources(ray_session):
    """A source holding ~3/4 of corpus tokens is down-sampled toward the
    uniform 1/2 share; the small source keeps everything. Deterministic
    and partition-invariant."""
    from ghcrawler_ray.ops.corpus import MIX_PPM, mixture_resample
    df = pd.DataFrame({
        "doc_id": np.arange(600, dtype=np.int64),
        "source": ["big"] * 450 + ["small"] * 150,
        "text": ["tok " * 20] * 600,      # equal per-doc tokens
    })
    first = None
    for blocks in (1, 6):
        out = mixture_resample(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        if first is None:
            first = out
        else:
            assert out.equals(first)
    r = first.groupby("source")["rate_ppm"].first()
    # big: total*PPM // (2 * big_tokens) = 600 // (2*450) of PPM
    assert r["big"] == 600 * MIX_PPM // (2 * 450)
    assert r["small"] == MIX_PPM                  # capped: keep all
    kept = first[first["keep"]].groupby("source").size()
    assert kept["small"] == 150
    # ~2/3 of big kept (hash buckets approximately uniform)
    assert abs(kept["big"] - 300) < 60


def test_host_components_multi_cluster(ray_session):
    """Two disjoint host clusters + one isolated self-linking host:
    components must not merge; labels = min md5-derived node id;
    sizes correct."""
    from ghcrawler_ray.ops.graph import _host_ids, host_components
    links = pd.DataFrame({
        "src_url": ["http://a1.x/p", "http://a2.x/q", "http://b1.y/r",
                    "http://solo.z/s", "http://A1.x/up"],
        "dst_url": ["http://a2.x/1", "http://a3.x/2", "http://b2.y/3",
                    "http://solo.z/other",          # self edge only
                    "http://a3.x/case"],            # case-insensitive host
    })
    out = host_components(ray.data.from_pandas(links)).to_pandas() \
        .set_index("host")
    assert len(out) == 6                     # a1 a2 a3 b1 b2 solo
    ca = {out.loc[h, "component_id"] for h in ("a1.x", "a2.x", "a3.x")}
    cb = {out.loc[h, "component_id"] for h in ("b1.y", "b2.y")}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    assert out.loc["solo.z", "component_size"] == 1
    assert out.loc["solo.z", "component_id"] == \
        out.loc["solo.z", "node_id"]
    assert (out.loc[["a1.x", "a2.x", "a3.x"], "component_size"] == 3).all()
    assert ca.pop() == min(_host_ids(["a1.x", "a2.x", "a3.x"]))


def test_fixed_n_sample_exact_count_and_stability(ray_session):
    """Exactly min(n, stratum size) rows per lang; the selected SET is
    invariant under partitioning AND under appending new docs with
    larger keys than the current cut (stability the rate-based sampler
    also has, but with an exact count)."""
    from ghcrawler_ray.ops.corpus import fixed_n_sample
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "lang": ["en"] * 280 + ["de"] * 20,
    })
    first = None
    for blocks in (1, 8):
        out = fixed_n_sample(ray.data.from_pandas(df).repartition(blocks),
                             n=50).to_pandas() \
            .sort_values(["lang", "rank_in_lang"]).reset_index(drop=True)
        if first is None:
            first = out
        else:
            assert out.equals(first)
    counts = first.groupby("lang").size()
    assert counts["en"] == 50 and counts["de"] == 20   # min(n, size)
    en = first[first["lang"] == "en"]
    assert (en["rank_in_lang"].to_numpy() == np.arange(50)).all()
    assert en["sample_key"].is_monotonic_increasing


def test_knn_graph_planted_neighbors(ray_session):
    """Planted near-identical vector pairs must be each other's rank-1
    neighbor; every vector gets ≤ k edges; partition-invariant."""
    from ghcrawler_ray.ops.ann import knn_graph
    rng = np.random.RandomState(9)
    base = rng.randn(30, 64)
    base[15:] = base[:15] + 0.01 * rng.randn(15, 64)   # pairs (i, i+15)
    df = pd.DataFrame({"vec_id": np.arange(30, dtype=np.int64),
                       "embedding": list(base),
                       "label": np.zeros(30, dtype=np.int64)})
    first = None
    for blocks in (1, 4):
        out = knn_graph(ray.data.from_pandas(df).repartition(blocks),
                        k=3).to_pandas() \
            .sort_values(["vec_id", "rank"]).reset_index(drop=True)
        if first is None:
            first = out
        else:
            assert out.equals(first)
    r1 = first[first["rank"] == 1].set_index("vec_id")["neighbor_id"]
    hits = sum(1 for i in range(15)
               if i in r1.index and i + 15 in r1.index
               and r1[i] == i + 15 and r1[i + 15] == i)
    # kmeans cells may split a few pairs (the documented IVF recall
    # trade-off); the overwhelming majority must be mutual rank-1
    assert hits >= 12, hits
    assert first.groupby("vec_id").size().max() <= 3


def test_hll_users_estimate_within_tolerance(ray_session):
    """Per-window distinct-user HLL lands within 5% of truth on windows
    with thousands of users (and is exact-ish via linear counting)."""
    from ghcrawler_ray.ops.sketch import hll_distinct_users
    rng = np.random.RandomState(13)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    hour = np.timedelta64(3600, "s")
    frames = []
    for w, n_users in ((0, 3000), (1, 700)):
        uids = np.arange(n_users, dtype=np.int64) + w * 10_000_000
        uids = np.concatenate([uids, uids[: n_users // 2]])  # repeats
        frames.append(pd.DataFrame({
            "ts": np.full(len(uids), base + w * hour),
            "user_id": uids,
            "event_id": np.arange(len(uids), dtype=np.int64),
            "event_type": ["click"] * len(uids),
            "value": np.zeros(len(uids)),
            "props": [""] * len(uids)}))
    ev = pd.concat(frames, ignore_index=True).sample(
        frac=1.0, random_state=rng).reset_index(drop=True)
    out = hll_distinct_users(ray.data.from_pandas(ev).repartition(6)) \
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    assert len(out) == 2
    for i, n in ((0, 3000), (1, 700)):
        est = float(out.loc[i, "est_distinct"])
        assert abs(est - n) / n < 0.05, (i, est, n)


# ---- bpe_train building blocks (ops/bpe.py) ----

def test_bpe_delim_replace_is_greedy_bpe():
    """The double-delimiter encoding makes plain str.replace reproduce
    BPE's greedy left-to-right one-pass merge (boundary guards survive
    each replacement) — the property the DuckDB mirror relies on."""
    from ghcrawler_ray.ops.bpe import _delim
    assert _delim("aaaa").replace("|a||a|", "|aa|") == "||aa||aa||"
    assert _delim("aaa").replace("|a||a|", "|aa|") == "||aa||a||"
    # no cross-token false match: 'ax y' must not match pair (x, y)
    assert _delim("axy").replace("|x||y|", "|xy|") == "||a||x||y||".replace(
        "|x||y|", "|xy|")  # merges only at a real (x, y) boundary
    assert _delim("axy").replace("|ax||y|", "|axy|") == _delim("axy")


def test_bpe_pair_counts_overlapping_weighted():
    import numpy as np
    from ghcrawler_ray.ops.bpe import _delim, _pair_counts
    pc = _pair_counts([_delim("aaa"), _delim("ab")],
                      np.array([2, 3], dtype=np.int64))
    got = {(r.lhs, r.rhs): int(r.n) for r in pc.itertuples()}
    # positions-based (overlapping) counts, weighted by word frequency
    assert got == {("a", "a"): 4, ("a", "b"): 3}


def test_bigram_lm_scores_surprisal(ray_session):
    """Text made of the corpus's dominant bigrams must score a LOWER
    mean surprisal than out-of-vocabulary gibberish; docs with < 2
    tokens score 0 by definition."""
    from ghcrawler_ray.ops.text import bigram_lm_scores
    common = "the cat sat on the mat"
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [common + " " + common, common,
                 "zq xv qj zx wq vk jq",      # OOV gibberish
                 "one"],                       # single token
    }))
    out = bigram_lm_scores(docs).to_pandas().set_index("doc_id")
    assert out.loc[4, "n_bigrams"] == 0
    assert out.loc[4, "mean_nll_fp"] == 0
    assert out.loc[1, "mean_nll_fp"] < out.loc[3, "mean_nll_fp"]
    assert out.loc[2, "mean_nll_fp"] < out.loc[3, "mean_nll_fp"]
    # nll_sum is additive over bigrams: all costs positive
    assert (out.loc[[1, 2, 3], "nll_sum"] > 0).all()


def test_incremental_dedup_against_existing(ray_session):
    """Incoming docs (id % 5 == 0) are flagged iff an EXISTING doc has
    identical text; duplicates only within the increment stay keep=1."""
    from ghcrawler_ray.ops.dedup import incremental_dedup
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 5, 10, 15, 20],
        "text": ["alpha beta", "gamma",       # existing (1, 2)
                 "alpha beta",                # new, dup of existing 1
                 "delta unique",              # new, no copy anywhere
                 "echo twin", "echo twin"],   # new pair: dup only intra-increment
    }))
    out = incremental_dedup(docs).to_pandas() \
        .sort_values("doc_id").set_index("doc_id")
    assert list(out.index) == [5, 10, 15, 20]
    assert out.loc[5, "dup_of"] == 1 and out.loc[5, "keep"] == 0
    assert out.loc[10, "dup_of"] == -1 and out.loc[10, "keep"] == 1
    # intra-increment twins: existing side has no copy, both kept
    assert out.loc[15, "keep"] == 1 and out.loc[20, "keep"] == 1


def test_cdx_index_surt_and_order(ray_session):
    """SURT keys reverse host labels; the index comes back globally
    sorted by (surt_key, ts_ms) with per-capture md5 digests."""
    import hashlib
    from ghcrawler_ray.ops.cdx import cdx_index
    pages = pd.DataFrame({
        "url": ["http://news.a.example/x?q=1", "http://a.example/",
                "http://b.example/p", "http://news.a.example/x?q=1"],
        "warc_ts": pd.to_datetime([2_000_000, 1_000_000, 1_500_000,
                                   1_000_000], unit="ms"),
        "html": [b"<p>one</p>", b"<p>two</p>", b"<p>three</p>",
                 b"<p>one-v2</p>"],
    })
    out = cdx_index(ray.data.from_pandas(pages)).to_pandas()
    assert out["surt_key"].tolist() == sorted(out["surt_key"].tolist())
    # same url's two captures adjacent and time-ordered
    both = out[out["url"] == "http://news.a.example/x?q=1"]
    assert both["surt_key"].iloc[0] == "example,a,news)/x?q=1"
    assert both["ts_ms"].tolist() == [1_000_000, 2_000_000]
    row = out[out["url"] == "http://a.example/"].iloc[0]
    assert row["surt_key"] == "example,a)/"
    assert row["digest"] == hashlib.md5(b"<p>two</p>").hexdigest()
    assert row["n_bytes"] == len(b"<p>two</p>")


def test_revisit_schedule_change_rate(ray_session):
    """A frequently-changing entity gets a SHORTER revisit interval than
    a static one over the same span; single-observation entities get
    interval 0 (revisit immediately)."""
    from ghcrawler_ray.ops.events import revisit_schedule
    ms = 1000  # µs per ms
    ev = pd.DataFrame({
        "event_id": range(9),
        "user_id": [1, 1, 1, 1,   2, 2, 2, 2,   3],
        "ts": pd.to_datetime([0, 10, 20, 30,  0, 10, 20, 30,  5],
                             unit="ms"),
        "event_type": ["view"] * 9,
        "value": [1.0, 2.0, 3.0, 4.0,   7.0, 7.0, 7.0, 7.0,   1.0],
    })
    out = revisit_schedule(ray.data.from_pandas(ev)).to_pandas() \
        .set_index("user_id")
    # user 1: 3 changes over 30ms span → interval 30//4 = 7.5ms floor
    assert out.loc[1, "n_changes"] == 3
    assert out.loc[1, "interval_us"] == 30 * ms // 4
    # user 2: never changes → interval = full span
    assert out.loc[2, "n_changes"] == 0
    assert out.loc[2, "interval_us"] == 30 * ms
    assert out.loc[1, "interval_us"] < out.loc[2, "interval_us"]
    # user 3: one observation → interval 0, next = last obs
    assert out.loc[3, "interval_us"] == 0
    assert out.loc[3, "next_ts_us"] == 5 * ms
    # schedule is anchored at the last observation
    assert out.loc[1, "next_ts_us"] == 30 * ms + 30 * ms // 4


def test_host_hits_hub_vs_authority(ray_session):
    """A directory host linking everyone must dominate the hub score;
    the host everyone links must dominate authority; scores are
    L1-normalized fixed-point (sum ≈ HITS_FP up to floor loss)."""
    from ghcrawler_ray.ops.graph import HITS_FP, host_hits
    links = pd.DataFrame({
        "src_url": ["http://dir.x/", "http://dir.x/", "http://dir.x/",
                    "http://u1.x/", "http://u2.x/"],
        "dst_url": ["http://star.x/a", "http://u1.x/b", "http://u2.x/c",
                    "http://star.x/d", "http://star.x/e"],
    })
    out = host_hits(ray.data.from_pandas(links)).set_index("host")
    assert out["hub_fp"].idxmax() == "dir.x"
    assert out["auth_fp"].idxmax() == "star.x"
    # star never links out → zero hub; dir is never linked → zero auth
    assert out.loc["star.x", "hub_fp"] == 0
    assert out.loc["dir.x", "auth_fp"] == 0
    for col in ("hub_fp", "auth_fp"):
        assert 0 < out[col].sum() <= HITS_FP


def test_dedup_lines_removes_boilerplate(ray_session):
    from ghcrawler_ray.ops.contamination import dedup_lines, duplicate_lines
    nav = "Home | About | Contact"
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            f"{nav}\nunique body one\n\n  {nav}  ",   # nav twice (strip-eq)
            f"{nav}\nunique body two",
            "all original\ncontent here",
            "",                                        # empty doc
        ],
    })
    ds = ray.data.from_pandas(docs)
    # nav occurs 3x corpus-wide (strip-equal) -> removed at min_count=3
    out = dedup_lines(ds, min_count=3).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "clean_text"] == "unique body one\n"   # blank kept
    assert int(out.loc[0, "n_removed"]) == 2
    assert int(out.loc[0, "n_lines"]) == 3
    assert out.loc[1, "clean_text"] == "unique body two"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[2, "clean_text"] == "all original\ncontent here"
    assert out.loc[3, "clean_text"] == "" and int(out.loc[3, "n_lines"]) == 0
    # stats op agrees: exactly one duplicated line, total 3
    st = duplicate_lines(ds, min_count=3).to_pandas()
    assert len(st) == 1 and int(st["n_total"].iloc[0]) == 3


def test_dedup_keep_best_prefers_quality_over_min_id(ray_session):
    from ghcrawler_ray.ops.dedup import dedup_keep_best

    base = ("the data and for that with this from they have more "
            "will about which when make like time just know") * 3
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "lang": ["en"] * 3,
        # doc 0 = near-dup of doc 1 but punct-degraded (lower quality);
        # doc 2 is a singleton
        "text": [base + " !!! ??? %%% ### @@@ &&&", base,
                 "completely different singleton body"],
    })
    out = dedup_keep_best(ray.data.from_pandas(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert int(out.loc[0, "cluster_size"]) == 2
    assert int(out.loc[1, "cluster_size"]) == 2
    # min-doc_id resolution would keep doc 0; keep-BEST keeps doc 1
    assert int(out.loc[0, "keep"]) == 0 and int(out.loc[1, "keep"]) == 1
    assert out.loc[1, "quality_score"] > out.loc[0, "quality_score"]
    assert int(out.loc[2, "keep"]) == 1 and int(out.loc[2, "cluster_size"]) == 1


def test_holdout_split_is_group_safe():
    import ray.data
    from ghcrawler_ray.ops.corpus import holdout_split
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "source": [f"host{i % 7}" for i in range(60)]})
    out = holdout_split(ray.data.from_pandas(df)).to_pandas()
    assert set(out["fold"]) <= {"train", "val", "test"}
    # every source maps to exactly one fold (leakage-safe group split)
    assert (out.groupby("source")["fold"].nunique() == 1).all()
    # deterministic: same input -> same assignment
    again = holdout_split(ray.data.from_pandas(df)).to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True))


def test_snapshot_diff_statuses():
    import ray.data
    from ghcrawler_ray.ops.corpus import snapshot_diff
    old = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1, 2, 3], dtype=np.int64),
         "text": ["alpha", "beta", "gamma"]}))
    new = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1, 3, 4], dtype=np.int64),
         "text": ["alpha", "gamma EDITED", "delta"]}))
    out = snapshot_diff(old, new).to_pandas()
    status = dict(zip(out.doc_id, out.status))
    assert status == {1: "unchanged", 2: "removed",
                      3: "changed", 4: "added"}


def test_dsir_weights_prefer_target_distribution():
    import ray.data
    from ghcrawler_ray.ops.curate import DSIR_FP, dsir_weights
    en = "good clean prose with helpful words and steady structure"
    fr = "texte bruite avec des mots differents et une autre forme"
    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "lang": ["en"] * 4 + ["fr"] * 4,
        "text": [en] * 4 + [fr] * 4})
    out = dsir_weights(ray.data.from_pandas(df)).to_pandas()
    s = out.set_index("doc_id")["dsir_score_fp"]
    en_mean = s[:4].mean()
    fr_mean = s[4:].mean()
    # target(en)-distribution grams carry higher importance ratios
    assert en_mean > fr_mean
    assert (out["dsir_score_fp"] <= DSIR_FP).all()  # ratio <= 1 + eps


def test_pq_codes_determinism_and_duplicate_consistency(ray_session):
    """Batch-layout independence (fixed-point guarantee) + identical
    vectors always share all m codes; codes stay within the codebook."""
    import ray.data
    from ghcrawler_ray.ops.ann import pq_codes
    rng = np.random.RandomState(11)
    n, dim, m, k = 96, 16, 4, 4
    vecs = [rng.randn(dim).astype(np.float32) * 0.4 for _ in range(n)]
    vecs[50] = vecs[20].copy()          # planted exact duplicate
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": vecs})
    a = pq_codes(ray.data.from_pandas(df), m=m, k=k).to_pandas() \
        .sort_values(["vec_id", "block"]).reset_index(drop=True)
    b = pq_codes(ray.data.from_pandas(df).repartition(7), m=m, k=k) \
        .to_pandas().sort_values(["vec_id", "block"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == n * m
    assert a["code"].between(0, k - 1).all()
    dup = a[a["vec_id"] == 50]["code"].to_numpy()
    orig = a[a["vec_id"] == 20]["code"].to_numpy()
    assert (dup == orig).all()


def test_pq_topk_recovers_exact_duplicate(ray_session):
    """ADC rank-1 for a planted exact duplicate (identical codes ->
    adc_dist 0), and distances are non-decreasing in rank."""
    import ray.data
    from ghcrawler_ray.ops.ann import pq_topk
    rng = np.random.RandomState(5)
    n, dim = 80, 64
    vecs = [rng.randn(dim).astype(np.float32) for _ in range(n)]
    vecs[40] = vecs[2].copy()           # duplicate of query 2
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": vecs})
    out = pq_topk(ray.data.from_pandas(df), topk=3, n_queries=4)
    r1 = out[(out.query_id == 2) & (out["rank"] == 1)].iloc[0]
    # ADC is asymmetric: even an exact duplicate scores the query's
    # distance to its own QUANTIZED representation (> 0), but no other
    # vector can beat it — the dup shares the query's argmin codes.
    assert r1.neighbor_id == 40
    q2 = out[out.query_id == 2].sort_values("rank")["adc_dist"].to_numpy()
    assert (q2[0] <= q2).all()
    for _, g in out.groupby("query_id"):
        d = g.sort_values("rank")["adc_dist"].to_numpy()
        assert (np.diff(d) >= 0).all()


def test_mmr_select_diversifies(ray_session):
    """Two tight clusters near the query: plain top-k would take all of
    cluster A; MMR's second pick must defect to cluster B."""
    import ray.data
    from ghcrawler_ray.ops.ann import mmr_select
    rng = np.random.RandomState(3)
    dim = 16
    q = np.zeros(dim); q[0] = 1.0
    a = np.zeros(dim); a[0], a[1] = 0.9, 0.3   # cluster A: relevant
    b = np.zeros(dim); b[0], b[1] = 0.9, -0.3  # cluster B: equally
    # relevant but dissimilar to A — plain top-k takes all of A
    vecs = [q] + [a + rng.randn(dim) * 0.002 for _ in range(5)] \
        + [b + rng.randn(dim) * 0.002 for _ in range(5)]
    df = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [v.astype(np.float32) for v in vecs]})
    out = mmr_select(ray.data.from_pandas(df), k=3, n_cand=10)
    assert list(out["rank"]) == [1, 2, 3]
    first, second = int(out.iloc[0].vec_id), int(out.iloc[1].vec_id)
    assert first in range(1, 6)          # rank 1: most relevant (A)
    assert second in range(6, 11)        # rank 2: diversity forces B
    assert out["vec_id"].is_unique


def test_ann_recall_eval_bounds(ray_session):
    """Recall@k of IVF-with-one-cell must be perfect; per-query rows
    cover every query and recall is within [0, 1]."""
    import ray.data
    from ghcrawler_ray.ops.ann import ANN_EVAL_FP, ann_recall_eval
    rng = np.random.RandomState(9)
    n, dim = 64, 64
    # a single tight blob -> kmeans collapses useful structure but the
    # brute-force and IVF searches still agree near-perfectly; bounds +
    # coverage are the stable contract
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.randn(dim).astype(np.float32) for _ in range(n)],
        "label": (np.arange(n) % 4).astype(np.int32)})
    out = ann_recall_eval(ray.data.from_pandas(df), k=3)
    assert len(out) == 8                       # one row per query
    assert out["recall_fp"].between(0, ANN_EVAL_FP).all()
    assert (out["n_hit"] <= 3).all()


def test_hard_negatives_excludes_own_class(ray_session):
    import ray.data
    from ghcrawler_ray.ops.ann import hard_negatives
    rng = np.random.RandomState(13)
    dim = 8
    base = rng.randn(dim)
    # class 0 = tight blob around base (incl. queries); class 1 = the
    # same blob slightly shifted -> nearest DIFFERENT-class neighbors
    # are the shifted twins, never the same-class near-identicals
    vecs, labels = [], []
    for i in range(10):
        vecs.append(base + rng.randn(dim) * 0.01); labels.append(0)
    for i in range(10):
        vecs.append(base + 0.05 + rng.randn(dim) * 0.01); labels.append(1)
    df = pd.DataFrame({
        "vec_id": np.arange(20, dtype=np.int64),
        "embedding": [v.astype(np.float32) for v in vecs],
        "label": np.array(labels, dtype=np.int32)})
    out = hard_negatives(ray.data.from_pandas(df), k=3, n_queries=2) \
        .to_pandas()
    lab = dict(zip(df.vec_id, df.label))
    assert len(out) == 6
    # queries 0 and 1 are class 0: every mined negative must be class 1
    assert all(lab[n] == 1 for n in out["neighbor_id"])
    assert (out.groupby("query_id")["rank"].apply(
        lambda r: sorted(r) == [1, 2, 3])).all()


def test_props_key_stats_parses_json(ray_session):
    from ghcrawler_ray.ops.events import props_key_stats
    ev = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01"] * 5).astype("datetime64[us]"),
        "user_id": np.ones(5, dtype=np.int64),
        "event_type": ["click", "click", "view", "view", "view"],
        "value": np.zeros(5),
        "props": ['{"k": 3}', '{"k": 3}', '{"k": 7}', '{"k": 1}',
                  'not json at all']})
    out = props_key_stats(ray.data.from_pandas(ev)).to_pandas() \
        .set_index("event_type")
    assert out.loc["click", "n_events"] == 2
    assert out.loc["click", "n_distinct_k"] == 1
    assert out.loc["click", "sum_k"] == 6
    assert out.loc["view", "n_distinct_k"] == 3   # 7, 1 and -1 (unparsed)
    assert out.loc["view", "sum_k"] == 7          # 7 + 1 + (-1)
    assert out.loc["view", "max_k"] == 7


def test_cdc_chunks_locality_and_stats(ray_session):
    from ghcrawler_ray.ops.cdc import cdc_dedup_stats, doc_chunks
    base = ("the quick brown fox jumps over the lazy dog and then "
            "walks along the river bank counting stones for a while " * 4)
    edited = base[:100] + "XYZ" + base[100:]   # one insertion
    cb, ce = doc_chunks(base), doc_chunks(edited)
    assert "".join(cb) == base and "".join(ce) == edited
    # insertion perturbs only local chunks: most chunks are shared
    shared = len(set(cb) & set(ce))
    assert shared >= len(set(cb)) - 2    # only the edited region differs
    # exact duplicate doc adds chunks but no distinct bytes
    ds1 = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1], "text": [base]}))
    ds2 = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": [base, base]}))
    s1 = cdc_dedup_stats(ds1).iloc[0]
    s2 = cdc_dedup_stats(ds2).iloc[0]
    assert s2.n_chunks == 2 * s1.n_chunks
    assert s2.distinct_bytes == s1.distinct_bytes
    assert s2.total_bytes == 2 * s1.total_bytes
    # the repeated base already dedups within one doc…
    assert s1.dedup_ratio_fp < 10 ** 6
    # …and the duplicate doc exactly halves the kept fraction
    assert s2.dedup_ratio_fp == \
        (s1.distinct_bytes * 10 ** 6) // (2 * s1.total_bytes)


def test_bpe_encode_roundtrip_and_oov(ray_session):
    from ghcrawler_ray.ops.bpe import bpe_encode
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["low lower lowest low low", "new newer lowest"]})
    out = bpe_encode(ray.data.from_pandas(docs), n_merges=4).to_pandas()
    # concatenating a doc's subtokens in pos order reconstructs its
    # lowercased token stream exactly (lossless segmentation)
    for did, g in out.groupby("doc_id"):
        joined = "".join(g.sort_values("pos")["bpe_token"])
        orig = "".join(docs.set_index("doc_id").loc[did, "text"]
                       .lower().split())
        assert joined == orig
    # frequent word 'low' must have merged below character granularity
    n_low_subtokens = len(out[(out.doc_id == 1)]) / 5
    assert n_low_subtokens < 3                   # chars would be 3+


def test_bpe_encode_replays_rules_for_unseen_words(ray_session):
    from ghcrawler_ray.ops.bpe import _train, bpe_encode
    train = pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "text": ["abab abab abab cd"]})
    rules, _, words, seqs = _train(ray.data.from_pandas(train), 2)
    seg = {w: s.strip("|").split("||") for w, s in zip(words, seqs)}
    assert "ababab" not in seg           # unseen at train time
    # replay the learned merges on the unseen word (the of() fallback):
    # merge1 = (a,b), merge2 = (ab,ab) -> greedy left-to-right
    s = "||" + "||".join("ababab") + "||"
    for _, lhs, rhs, _, _ in rules:
        s = s.replace(f"|{lhs}||{rhs}|", f"|{lhs}{rhs}|")
    assert s.strip("|").split("||") == ["abab", "ab"]
    got = bpe_encode(ray.data.from_pandas(train), n_merges=2).to_pandas()
    assert "".join(got[got.doc_id == 1].sort_values("pos")["bpe_token"]) \
        == "ababababababcd"


def test_proportional_sample_hamilton_exact(ray_session):
    from ghcrawler_ray.ops.corpus import proportional_sample
    # 70/20/10 split over langs a/b/c with N=10 -> quotas 7/2/1
    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "lang": ["a"] * 70 + ["b"] * 20 + ["c"] * 10})
    out = proportional_sample(ray.data.from_pandas(df), total_n=10) \
        .to_pandas()
    assert len(out) == 10                      # exact total
    q = out.groupby("lang").size().to_dict()
    assert q == {"a": 7, "b": 2, "c": 1}
    # largest-remainder case: 55/30/15 with N=7 -> 3.85/2.1/1.05 ->
    # bases 3/2/1 (sum 6), biggest remainder .85 -> a gets the extra
    df2 = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "lang": ["a"] * 55 + ["b"] * 30 + ["c"] * 15})
    out2 = proportional_sample(ray.data.from_pandas(df2), total_n=7) \
        .to_pandas()
    assert len(out2) == 7
    assert out2.groupby("lang").size().to_dict() == {"a": 4, "b": 2, "c": 1}
    # partition-stability: same picks under a different block layout
    out3 = proportional_sample(
        ray.data.from_pandas(df2).repartition(7), total_n=7).to_pandas()
    assert sorted(out3["doc_id"]) == sorted(out2["doc_id"])


def test_postings_compression_varint_exact(ray_session):
    from ghcrawler_ray.ops.search import PC_FP, postings_compression
    # token 'x' in docs 1, 2, 200 -> gaps 1, 1, 198 -> varint 1+1+2 bytes
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 200], dtype=np.int64),
        "text": ["x a", "x b", "x c"]})
    out = postings_compression(ray.data.from_pandas(df)).to_pandas() \
        .set_index("token")
    x = out.loc["x"]
    assert (x.df, x.raw_bytes, x.coded_bytes) == (3, 24, 4)
    assert x.savings_fp == (24 - 4) * PC_FP // 24
    # gap >= 128 needs the second varint byte
    df2 = pd.DataFrame({"doc_id": np.array([0, 300], dtype=np.int64),
                        "text": ["y", "y"]})
    y = postings_compression(ray.data.from_pandas(df2)).to_pandas() \
        .set_index("token").loc["y"]
    assert y.coded_bytes == 1 + 2


def test_kcore_multi_round_peel_and_core(ray_session):
    """Hand-built graph: a 4-clique (2-core) with a 3-node tail hanging
    off u3 — the tail peels inward one node per round (x3@1, x2@2,
    x1@3), the clique survives; degrees are the initial undirected
    distinct degrees."""
    from ghcrawler_ray.ops.graph import kcore
    edges = [("u0", "u1"), ("u0", "u2"), ("u0", "u3"), ("u1", "u2"),
             ("u1", "u3"), ("u2", "u3"),          # 4-clique
             ("u3", "x1"), ("x1", "x2"), ("x2", "x3")]   # tail
    df = pd.DataFrame({"src_url": [a for a, _ in edges],
                       "dst_url": [b for _, b in edges]})
    out = kcore(ray.data.from_pandas(df), k=2, max_rounds=12) \
        .to_pandas().set_index("url")
    assert out.loc["x3", "peel_round"] == 1
    assert out.loc["x2", "peel_round"] == 2
    assert out.loc["x1", "peel_round"] == 3
    for u in ("u0", "u1", "u2", "u3"):
        assert out.loc[u, "peel_round"] == -1 and out.loc[u, "in_kcore"]
    assert not out.loc["x1", "in_kcore"]
    assert out.loc["u3", "degree"] == 4
    assert out.loc["x3", "degree"] == 1


def test_host_bowtie_regions(ray_session):
    """Hand-built bow-tie: core = {c1,c2} (mutual), i1 feeds the core,
    o1 drains it, t1 hangs off i1 (weakly connected, neither IN nor
    OUT), d1→d2 is a separate weak component."""
    from ghcrawler_ray.ops.graph import host_bowtie
    def u(h, p="/x"):
        return f"http://{h}.example{p}"
    edges = [(u("c1"), u("c2")), (u("c2"), u("c1")),   # core SCC
             (u("i1"), u("c1")),                       # IN
             (u("c2"), u("o1")),                       # OUT
             (u("i1"), u("t1")),                       # TENDRIL
             (u("d1"), u("d2"))]                       # DISCONNECTED
    df = pd.DataFrame({"src_url": [a for a, _ in edges],
                       "dst_url": [b for _, b in edges]})
    out = host_bowtie(ray.data.from_pandas(df)).set_index("host")
    assert out.loc["c1.example", "region"] == "core"
    assert out.loc["c2.example", "region"] == "core"
    assert out.loc["i1.example", "region"] == "in"
    assert out.loc["o1.example", "region"] == "out"
    assert out.loc["t1.example", "region"] == "tendril"
    assert out.loc["d1.example", "region"] == "disconnected"
    assert out.loc["d2.example", "region"] == "disconnected"
    assert out.loc["c1.example", "region_size"] == 2


def test_pack_best_fit_hand_case_and_invariants(ray_session):
    """BFD on lengths [6,5,4,3,2] @ seq_len 10 → bins {6,4} and
    {5,3,2}; corpus invariants: unique docs, fills ≤ seq_len except
    single oversize truncated docs, deterministic."""
    from ghcrawler_ray.ops.packing import pack_best_fit
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en"] * 5,
        "text": ["w " * 6, "w " * 5, "w " * 4, "w " * 3, "w " * 2]})
    out = pack_best_fit(ray.data.from_pandas(df), seq_len=10) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "bin_id"] == out.loc[3, "bin_id"]      # 6+4
    assert (out.loc[2, "bin_id"] == out.loc[4, "bin_id"]
            == out.loc[5, "bin_id"])                          # 5+3+2
    assert out["bin_id"].nunique() == 2
    assert not out["truncated"].any()

    from ghcrawler_ray.testgen import ensure_testdata  # noqa: F401
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = pack_best_fit(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_best_fit(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)                                        # determinism
    assert a["doc_id"].is_unique
    fills = a[~a["truncated"]].groupby(["lang", "bin_id"])["n_tokens"].sum()
    assert (fills <= 2048).all()
    over = a[a["truncated"]]
    assert (over["n_tokens"] > 2048).all()
    per_bin = a.groupby(["lang", "bin_id"]).size()
    assert (per_bin[over.set_index(["lang", "bin_id"]).index] == 1).all()


def test_batch_tokenizer_matches_per_doc_findall():
    """tokenize_flat/_joined must reproduce the per-doc findall loop
    exactly — including the numpy pitfall where `obj_array == "\\x00"`
    (bare NUL str scalar) silently compares all-False."""
    import re

    import numpy as np

    from ghcrawler_ray.ops.text import (WS_TOKEN_RE, tokenize_flat,
                                        tokenize_joined)

    texts = ["The  quick\tbrown fox", "", "one", "a b c", "",
             "trailing space ", "  leading", "MiXeD CaSe TOKENS"]
    ws = re.compile(WS_TOKEN_RE)
    ref = [ws.findall(t.lower()) for t in texts]
    flat, lens = tokenize_flat(texts)
    assert lens.tolist() == [len(r) for r in ref]
    assert flat.tolist() == [t for r in ref for t in r]

    toks, bnd, lens2 = tokenize_joined(texts)
    assert lens2.tolist() == [len(r) for r in ref]
    # sentinel count = n_docs - 1, and stripping them recovers the flat view
    assert int(bnd.sum()) == len(texts) - 1
    assert toks[~bnd].tolist() == flat.tolist()
    # no adjacent pair crosses a document boundary once sentinels are masked
    ok = ~bnd[:-1] & ~bnd[1:]
    did = np.cumsum(bnd)[~bnd]
    pair_docs = did[np.searchsorted(np.flatnonzero(~bnd),
                                    np.flatnonzero(ok))]
    assert len(pair_docs) == sum(max(len(r) - 1, 0) for r in ref)

    # empty batch
    f0, l0 = tokenize_flat([])
    assert len(f0) == 0 and len(l0) == 0


def test_token_budget_sample_resumable_prefix(ray_session):
    """Appending new docs must not change which earlier docs are kept
    (id-ordered admission ⇒ stable prefix)."""
    import pandas as pd
    import ray

    from ghcrawler_ray.ops.corpus import token_budget_sample

    base = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "text": ["a b c", "d e", "f g h i", "j"]})
    more = pd.concat([base, pd.DataFrame({
        "doc_id": [5, 6], "lang": ["en", "en"],
        "text": ["k l m", "n"]})], ignore_index=True)
    r1 = token_budget_sample(ray.data.from_pandas(base), budget=6) \
        .to_pandas().set_index("doc_id").sort_index()
    r2 = token_budget_sample(ray.data.from_pandas(more), budget=6) \
        .to_pandas().set_index("doc_id").sort_index()
    assert r1["keep"].tolist() == r2.loc[r1.index, "keep"].tolist()
    assert r1["cum_tokens"].tolist() == r2.loc[r1.index,
                                               "cum_tokens"].tolist()
    # budget=6, cumulative over ALL docs in id order (the SQL windowed
    # cumsum does not skip rejected docs): cums are 3, 5, 9, 10 → the
    # admitted set is the strict prefix whose cum ≤ 6
    assert r1["keep"].tolist() == [1, 1, 0, 0]


def test_length_mad_outliers_degenerate_and_flags(ray_session):
    """Single distinct length → MAD 0, nothing flagged; a far outlier
    is flagged."""
    import pandas as pd
    import ray

    from ghcrawler_ray.ops.corpus import length_mad_outliers

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3], "n_chars": [10, 10, 10],
        "text": ["x"] * 3, "lang": ["en"] * 3})
    out = length_mad_outliers(ray.data.from_pandas(docs)).to_pandas()
    assert out["is_outlier"].sum() == 0

    docs2 = pd.DataFrame({
        "doc_id": list(range(9)),
        "n_chars": [100, 101, 99, 100, 102, 98, 100, 101, 10_000],
        "text": ["x"] * 9, "lang": ["en"] * 9})
    out2 = length_mad_outliers(ray.data.from_pandas(docs2)) \
        .to_pandas().set_index("doc_id")
    assert out2.loc[8, "is_outlier"] == 1
    assert out2.loc[0, "is_outlier"] == 0


def test_decayed_activity_shift_clamp(ray_session):
    """Ages ≥ 63 days contribute exactly 0 (and don't trip numpy's
    undefined ≥64-bit shift)."""
    import numpy as np
    import pandas as pd
    import ray

    from ghcrawler_ray.ops.events import (DECAY_FP_SHIFT,
                                          decayed_user_activity)

    base = pd.Timestamp("2024-06-01")
    ev = pd.DataFrame({
        "ts": [base, base - pd.Timedelta(days=1),
               base - pd.Timedelta(days=100)],
        "user_id": [1, 1, 2],
        "event_id": [1, 2, 3],
        "event_type": ["view"] * 3,
        "value": [0.0] * 3,
        "props": ["{}"] * 3})
    out = decayed_user_activity(ray.data.from_pandas(ev)) \
        .to_pandas().set_index("user_id")
    full = 1 << DECAY_FP_SHIFT
    assert out.loc[1, "score_fp"] == full + (full >> 1)
    assert out.loc[2, "score_fp"] == 0


def test_compression_ratio_separates_repetition(ray_session):
    import ray.data as rd
    from ghcrawler_ray.ops.text import (ZRATIO_FP, ZRATIO_LEVEL,
                                        compression_ratio)
    import zlib
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spam ham " * 400,                    # repetitive
                 ("the quick brown fox jumps over the lazy dog while "
                  "seven wizards briskly mixed pale quartz goblets; "
                  "every journal kept amazing chronicles of voyages "
                  "across frozen plateaus and humid deltas alike."),
                 "k9#pQ2$vX8!mZ4&wL7*jD5@tF3^yH6%rB1(nG0)sC"],
    })
    out = compression_ratio(rd.from_pandas(docs)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "verdict"] == "repetitive"
    assert out.loc[2, "verdict"] == "ok"
    # exact reproducibility of the pinned-level zlib size
    want = len(zlib.compress(docs["text"][0].encode(), ZRATIO_LEVEL))
    assert out.loc[1, "z_bytes"] == want
    assert out.loc[1, "ratio_fp"] == ZRATIO_FP * want // out.loc[1, "n_bytes"]
    assert (out["ratio_fp"] > 0).all()
