"""End-to-end quickstart: everything a user of the reference runs today,
as one Ray-Data-native script.

    python examples/quickstart.py [--sf 0.001] [--out /tmp/ghc_quickstart]

Stages (each is a library call — see COVERAGE.md for the full menu):
  1. crawl the synthesized web (frontier waves, politeness, seen-set,
     etag dedup, deadletters, checkpoint/resume),
  2. inspect the doc store (get/etag/count — storageDocStore analogue),
  3. audit the raw corpus (Deequ-style constraint checks), then curate
     it (quality gate → benchmark holdout → decontamination →
     normalized-text exact dedup),
  4. near-dup clustering (MinHash-LSH → verified pairs → connected
     components, keep one doc per cluster),
  5. label CCNet-style quality terciles, encode survivors to token ids
     against the corpus's own top-V vocabulary, and learn a small BPE
     merge table from the survivor corpus,
  6. pack the kept docs into fixed-length training sequences,
  7. write resumable md5-sharded corpus output, and export the origin
     as ISO-28500 WARC shards (the Common Crawl off-ramp).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))      # repo root, so the example runs
                                      # without an install step


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", default="/tmp/ghc_quickstart")
    ap.add_argument("--docs", default=None,
                    help="documents.parquet path (default: "
                         "/root/testdata/sf{sf}/documents.parquet)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import numpy as np
    import ray.data

    from ghcrawler_ray.config import CrawlConfig
    from ghcrawler_ray.ops.curate import corpus_curate
    from ghcrawler_ray.ops.dedup import dup_clusters
    from ghcrawler_ray.ops.packing import pack_sequences
    from ghcrawler_ray.ops.sink import write_corpus_shards
    from ghcrawler_ray.pipelines.wave import CrawlEngine
    from ghcrawler_ray.state.store import PagesDocStore
    from ghcrawler_ray.testgen import ensure_testdata

    # 1. crawl
    web_root = ensure_testdata(args.sf)
    crawl_out = f"{args.out}/crawl"
    res = CrawlEngine(web_root, crawl_out, CrawlConfig()).run()
    print(json.dumps({"crawl": {"waves": res["n_waves"],
                                "seen": res["n_seen"]}}))

    # 2. doc store point ops
    store = PagesDocStore(crawl_out)
    url = str(store.list(limit=1)["url"].iloc[0])
    print(json.dumps({"store": {"live_docs": store.count(),
                                "probe_url": url,
                                "etag": store.etag(url)}}))

    # 3..6. corpus curation on the documents table
    docs_path = args.docs or f"/root/testdata/sf{args.sf}/documents.parquet"
    if not os.path.exists(docs_path):
        raise SystemExit(f"no documents table at {docs_path}; pass --docs")
    docs = ray.data.read_parquet(docs_path)

    # 3a. audit the raw corpus before gating anything on it
    from ghcrawler_ray.ops.corpus import data_quality_audit
    audit = data_quality_audit(docs)
    print(json.dumps({"audit": dict(zip(audit["check_name"],
                                        audit["n_violations"]
                                        .astype(int)))}))

    kept = corpus_curate(docs).materialize()
    clusters = dup_clusters(docs).materialize()
    canonical = clusters.filter(expr="keep == 1")
    n_seqs = int(pack_sequences(docs).max("end_seq"))

    # survivors = curated ∩ canonical; demo-sized keep-sets, broadcast
    # once (at fleet scale: co-partition join on doc_id instead)
    kept_ids = ray.put(np.intersect1d(
        kept.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy(),
        canonical.select_columns(["doc_id"]).to_pandas()["doc_id"]
        .to_numpy()))

    def keep_rows(df, _ref=kept_ids):
        ids = ray.get(_ref)
        return df[np.isin(df["doc_id"].to_numpy(), ids)]

    survivors = docs.map_batches(keep_rows, batch_format="pandas")

    # 5. quality terciles + tokenize-to-ids over the survivor corpus
    from ghcrawler_ray.ops.curate import quality_buckets
    from ghcrawler_ray.ops.text import vocab_encode
    buckets = quality_buckets(survivors).to_pandas()
    n_ids = int(vocab_encode(survivors).count())

    # 5b. learn a small BPE merge table from the survivor corpus (the
    # tokenizer-training loop: distributed word count + bounded merges)
    from ghcrawler_ray.ops.bpe import bpe_train
    merges = bpe_train(survivors, n_merges=4)

    manifest = write_corpus_shards(survivors, f"{args.out}/shards",
                                   n_shards=8)

    # 7b. archival off-ramp: the origin pages as WARC shard files
    from ghcrawler_ray.sources import write_warc
    page_files = sorted(
        str(p) for p in (web_root / "pages").glob("bucket=*/part-0.parquet"))
    n_warc = write_warc(ray.data.read_parquet(page_files),
                        f"{args.out}/warc")
    print(json.dumps({
        "bpe_merges": merges["merged"].tolist(),
        "curate_kept": kept.count(),
        "dup_clusters": int(clusters.count()),
        "canonical_docs": int(canonical.count()),
        "bucket_counts": buckets["bucket"].value_counts().to_dict(),
        "encoded_token_ids": n_ids,
        "packed_sequences": n_seqs,
        "shards_written": int((~manifest["skipped"]).sum()),
        "warc_records": n_warc,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
