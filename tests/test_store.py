"""Doc-store admin surface (state/store.PagesDocStore) — the reference's
7-method storage-provider interface (`providers/storage/
storageDocStore.js:33-189`) over the engine's bucket-partitioned pages
parquet: get/etag point lookups (bucket-pruned), list-by-prefix, live
vs raw counts, delete-and-rewrite, and upsert-as-superseding-row with
version bump (append semantics double as the delta log,
`providers/storage/deltaStore.js:26-31`)."""

import shutil

import pandas as pd
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.state.store import PagesDocStore
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    root = ensure_testdata(SF)
    out = tmp_path_factory.mktemp("store") / "out"
    CrawlEngine(root, out, CrawlConfig(max_waves=3)).run()
    return out


@pytest.fixture(params=["parquet", "jsonl"])
def store(crawl_out, tmp_path, request):
    """The SAME suite runs over both registered backends — the
    provider-interchangeability contract (`mongodocstore.js` vs
    `storageDocStore.js` behind one interface). Resolution goes through
    the plugins registry, as a deployment's would."""
    from ghcrawler_ray.plugins import DocStoreProtocol, make_doc_store

    # copy: delete/upsert tests mutate the store
    dst = tmp_path / "out"
    shutil.copytree(crawl_out, dst)
    if request.param == "parquet":
        store = make_doc_store("parquet", dst)
    else:
        # seed the jsonl backend with the crawl's live docs through the
        # shared upsert surface
        import pyarrow.parquet as pq
        t = pq.read_table(sorted(str(p) for p in
                                 (dst / "pages").rglob("*.parquet")),
                          partitioning=None).to_pandas()
        live = t.sort_values(["url", "wave", "version"], kind="stable") \
            .drop_duplicates("url", keep="last")
        store = make_doc_store("jsonl", tmp_path / "jsonl")
        store.upsert(live[["url", "lang", "etag", "text"]])
    assert isinstance(store, DocStoreProtocol)
    return store


def test_get_and_etag_point_lookup(store):
    df = store.list(limit=5)
    assert len(df) == 5
    url = str(df["url"].iloc[0])
    doc = store.get(url)
    assert doc is not None and doc["url"] == url
    assert store.etag(url) == str(doc["etag"])
    assert doc["text"]  # envelope carries the extracted text
    assert store.get("http://nowhere.example/none") is None
    assert store.etag("http://nowhere.example/none") is None


def test_list_prefix_and_count(store):
    all_docs = store.list()
    assert len(all_docs) == store.count()
    host = str(all_docs["url"].iloc[0]).split("/p")[0]
    sub = store.list(prefix=host)
    assert 0 < len(sub) <= len(all_docs)
    assert sub["url"].str.startswith(host).all()
    # live count never exceeds raw row count
    assert store.count() <= store.count(live_only=False)


def test_delete_rewrites_only_its_bucket(store):
    url = str(store.list(limit=1)["url"].iloc[0])
    before = store.count()
    removed = store.delete(url)
    assert removed >= 1
    assert store.get(url) is None
    assert store.count() == before - 1
    assert store.delete(url) == 0  # idempotent


def test_upsert_supersedes_and_bumps_version(store):
    url = str(store.list(limit=1)["url"].iloc[0])
    old = store.get(url)
    wave = store.upsert(pd.DataFrame({
        "url": [url, "http://new.example/added"],
        "lang": ["en", "en"],
        "etag": ["sha:new", "sha:added"],
        "text": ["updated body", "brand new body"],
    }))
    assert wave > int(old["wave"])
    cur = store.get(url)
    assert cur["etag"] == "sha:new" and cur["text"] == "updated body"
    assert int(cur["version"]) == int(old["version"]) + 1
    new = store.get("http://new.example/added")
    assert new is not None and int(new["version"]) == 1
    # history preserved: raw rows grew, live count grew by exactly 1
    assert store.count(live_only=False) > store.count()


def test_dynamic_doc_store_resolution(tmp_path):
    """\"module:Class\" dynamic provider loading — the
    `require('ghcrawler-'+name)` analogue for doc stores."""
    from ghcrawler_ray.plugins import make_doc_store

    s = make_doc_store("ghcrawler_ray.state.jsonl_store:JsonlDocStore",
                       tmp_path / "dyn", n_buckets=8)
    s.upsert(pd.DataFrame({"url": ["http://a.example/1"], "lang": ["en"],
                           "etag": ["sha:1"], "text": ["body"]}))
    assert s.count() == 1
    assert s.etag("http://a.example/1") == "sha:1"
    assert s.delete("http://a.example/1") == 1
    assert s.count() == 0
