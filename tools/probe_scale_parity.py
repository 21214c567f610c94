#!/usr/bin/env python
"""Large-scale engine parity probes (beyond the pytest fixtures).

    PYTHONPATH=. python tools/probe_scale_parity.py [--sf 0.01] [--max-waves 6]

Runs, at the given scale, on the all-distributed path:
  1. engine ≡ sequential oracle (order log + seen set) in BOTH seen
     modes (exact64, cuckoo);
  2. kill-at-wave-2 → resume ≡ uninterrupted run, byte-for-byte;
  3. golden-mode ≡ scale-mode per-wave metrics.

Round 3 ran this at sf0.01 (≈34k order rows): it caught the
truncated-crawl seen-etag over-attribution the sf0.0001 fixtures
missed (fixed in pipelines/wave._finalize; pinned by
tests/test_parity.py::test_truncated_crawl_seen_etag_parity).
"""
import argparse
import dataclasses
import glob
import re
import shutil

import ray


def order_of(out):
    import pandas as pd
    import pyarrow.parquet as pq
    fs = sorted(glob.glob(f"{out}/order/wave=*.parquet"),
                key=lambda p: int(re.search(r"wave=(\d+)", p).group(1)))
    return pd.concat([pq.read_table(f).to_pandas() for f in fs],
                     ignore_index=True)


def canon(df, sort):
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].fillna("").astype(str)
    return df.sort_values(sort, kind="stable").reset_index(drop=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--max-waves", type=int, default=6)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import pandas as pd
    import pyarrow.parquet as pq

    from ghcrawler_ray.config import CrawlConfig
    from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
    from ghcrawler_ray.pipelines.wave import CrawlEngine
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(args.sf)
    base = dataclasses.replace(CrawlConfig(), local_wave_threshold=0,
                               max_waves=args.max_waves)

    for mode in ("exact64", "cuckoo"):
        cfg = dataclasses.replace(base, seen_mode=mode)
        golden = SequentialOracle(load_web(root), cfg).run()
        out = f"/tmp/probe_parity_{mode}"
        shutil.rmtree(out, ignore_errors=True)
        CrawlEngine(root, out, cfg).run()
        order, g = order_of(out), golden["order"]
        pd.testing.assert_frame_equal(
            canon(order[g.columns], list(g.columns)),
            canon(g, list(g.columns)), check_dtype=False)
        seen = pq.read_table(f"{out}/seen.parquet").to_pandas()
        gs = golden["seen"]
        pd.testing.assert_frame_equal(canon(seen[gs.columns], ["url"]),
                                      canon(gs, ["url"]),
                                      check_dtype=False)
        print(f"PROBE parity sf{args.sf} {mode}: order {len(order)} "
              f"seen {len(seen)} OK", flush=True)

    shutil.rmtree("/tmp/probe_res", ignore_errors=True)
    CrawlEngine(root, "/tmp/probe_res",
                dataclasses.replace(base, max_waves=2)).run()
    CrawlEngine(root, "/tmp/probe_res", base).run(resume=True)
    a = order_of("/tmp/probe_parity_exact64")
    b = order_of("/tmp/probe_res")
    pd.testing.assert_frame_equal(a, b)
    print(f"PROBE resume sf{args.sf}: {len(b)} rows byte-identical OK",
          flush=True)

    shutil.rmtree("/tmp/probe_scalemode", ignore_errors=True)
    CrawlEngine(root, "/tmp/probe_scalemode",
                dataclasses.replace(base, emit_order_log=False)).run()

    def metrics(out):
        fs = sorted(glob.glob(f"{out}/metrics/wave=*.parquet"))
        m = pd.concat([pq.read_table(f).to_pandas() for f in fs],
                      ignore_index=True)
        return m.groupby(["wave", "outcome"], as_index=False)["n"].sum() \
            .sort_values(["wave", "outcome"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(metrics("/tmp/probe_parity_exact64"),
                                  metrics("/tmp/probe_scalemode"))
    print(f"PROBE scale-mode metrics sf{args.sf} OK", flush=True)

    # feature probe: credential classes (round-5 OPEN trait sets — the
    # elevated sugar PLUS a third 'partner' class with its own window)
    # + hot-config patches TOGETHER on the all-distributed path —
    # auth_denied outcomes, per-class retries, per-class budgets, and a
    # mid-crawl throttle patch must reproduce the sequential oracle at
    # this scale too
    fcfg = dataclasses.replace(
        base, protected_url_regex=r"/p/(?:3|7)$", elevated_max_per_window=2,
        cred_rules=((r"/p/(?:5|9)$", "partner"),),
        cred_windows=(("partner", 1),))
    patches = {2: {"wave_ms": 5_000}}
    golden = SequentialOracle(load_web(root), fcfg, patches=patches).run()
    out = "/tmp/probe_features"
    shutil.rmtree(out, ignore_errors=True)
    CrawlEngine(root, out, fcfg, patches=patches).run()
    order, g = order_of(out), golden["order"]
    pd.testing.assert_frame_equal(
        canon(order[g.columns], list(g.columns)),
        canon(g, list(g.columns)), check_dtype=False)
    n_auth = int((order["outcome"] == "auth_denied").sum())
    assert n_auth > 0, "feature probe produced no auth_denied outcomes"
    print(f"PROBE features sf{args.sf} (cred+hot-config): order "
          f"{len(order)} auth_denied {n_auth} OK", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
