"""``python -m ghcrawler_ray`` — the ``ray job submit`` entry point.

On a real cluster::

    ray job submit --working-dir . -- \
        python -m ghcrawler_ray crawl --web-root s3://.../web --out s3://.../run1

Subcommands mirror the reference's service surface
(`lib/crawlerService.js`, `routes/deadletters.js`, `routes/webhook.js`):
``crawl`` (run / resume), ``deadletters`` (list / count / requeue),
``inject-seeds`` (between-run webhook analogue), ``store`` (doc-store
get/etag/list/delete/count, `providers/storage/storageDocStore.js`
analogue), ``status`` (manifest + metrics summary).

The module never force-reinitializes Ray: under ``ray job submit`` the
job driver connects to the running cluster; standalone it starts a local
session sized by ``--num-cpus``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _ray_init(args) -> None:
    import ray
    if ray.is_initialized():
        return
    kwargs = {"include_dashboard": False}
    if getattr(args, "num_cpus", None):
        kwargs["num_cpus"] = args.num_cpus
        kwargs["address"] = "local"
    ray.init(**kwargs)


def _cmd_crawl(args) -> int:
    _ray_init(args)
    from .config import CrawlConfig
    from .pipelines.wave import CrawlEngine
    overrides = {}
    for f in ("max_waves", "seen_mode", "n_polite_parts", "n_buckets",
              "n_shards", "local_wave_threshold"):
        v = getattr(args, f)
        if v is not None:
            overrides[f] = v
    if args.scale_mode:
        overrides["emit_order_log"] = False
    cfg = CrawlConfig(**overrides)
    res = CrawlEngine(args.web_root, args.out, cfg).run(resume=args.resume)
    print(json.dumps(res, default=str))
    return 0


def _cmd_deadletters(args) -> int:
    from . import admin
    if args.action == "count":
        print(admin.count_deadletters(args.out))
    elif args.action == "list":
        df = admin.list_deadletters(args.out, reason=args.reason)
        print(df.to_json(orient="records"))
    elif args.action == "requeue":
        _ray_init(args)
        n = admin.requeue_deadletters(args.web_root, args.out,
                                      urls=args.urls or None)
        print(json.dumps({"requeued": n}))
    elif args.action == "delete":
        n = admin.delete_deadletters(args.out, urls=args.urls or None,
                                     reason=args.reason)
        print(json.dumps({"deleted": n}))
    return 0


def _cmd_inject_seeds(args) -> int:
    import pyarrow.parquet as pq
    from . import admin
    seeds = pq.read_table(args.seeds).to_pandas()
    n = admin.inject_seeds(args.out, seeds, args.wave,
                           secret=args.secret or None,
                           signature=args.signature or None)
    # -1 = rejected signature (exit 1); 0 = validly-signed EMPTY payload
    # (a successful no-op, exit 0) — the two must not be conflated
    print(json.dumps({"injected": max(n, 0), "wave": args.wave,
                      "rejected": n < 0}))
    return 1 if n < 0 else 0


def _cmd_patch_config(args) -> int:
    """Hot-config channel (`lib/crawlerFactory.js:194-251` redis-pubsub
    analogue): write {out}/config_patches/wave=K.json; the engine reads
    it before wave K runs (live for a running crawl, replayed on
    resume). Only live-tunable fields are accepted."""
    from pathlib import Path

    from .pipelines.wave import coerce_patch
    patch = json.loads(args.patch)
    try:
        # full name + value-type validation (shared with the engine), so
        # a mistyped patch fails HERE instead of wedging the target crawl
        patch = coerce_patch(patch)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    d = Path(args.out) / "config_patches"
    d.mkdir(parents=True, exist_ok=True)
    f = d / f"wave={args.wave}.json"
    merged = json.loads(f.read_text()) if f.exists() else {}
    merged.update(patch)
    f.write_text(json.dumps(merged))
    print(json.dumps({"patched": merged, "wave": args.wave}))
    return 0


def _cmd_store(args) -> int:
    from .state.store import PagesDocStore
    store = PagesDocStore(args.out, n_buckets=args.n_buckets)
    if args.action == "get":
        doc = store.get(args.url)
        print(json.dumps(doc, default=str) if doc else "null")
    elif args.action == "etag":
        print(json.dumps({"url": args.url, "etag": store.etag(args.url)}))
    elif args.action == "count":
        print(json.dumps({"live": store.count(),
                          "rows": store.count(live_only=False)}))
    elif args.action == "list":
        df = store.list(prefix=args.prefix or "", limit=args.limit)
        print(df.to_json(orient="records"))
    elif args.action == "delete":
        print(json.dumps({"deleted": store.delete(args.url)}))
    return 0


def _cmd_ops(args) -> int:
    """Run any pipeline from the ops catalog (``__ray_entry__.queries()``
    — the repo root must be importable, which ``ray job submit
    --working-dir .`` guarantees) and sink the result as parquet.
    Dataset results stream straight to partitioned parquet; bounded
    DataFrame results write one file."""
    import importlib
    try:
        entry = importlib.import_module("__ray_entry__")
    except ModuleNotFoundError:
        print("ops requires the repo root on PYTHONPATH "
              "(ray job submit --working-dir .)", file=sys.stderr)
        return 2
    qs = entry.queries()
    if args.action == "list":
        print(json.dumps(sorted(qs)))
        return 0
    if args.name not in qs:
        print(f"unknown op {args.name!r}; see `ops list`", file=sys.stderr)
        return 2
    _ray_init(args)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    res = qs[args.name](args.sf_dir)
    out = Path(args.out)
    if isinstance(res, ray.data.Dataset):
        res.write_parquet(str(out))      # streams; never driver-collected
        n = sum(pq.read_metadata(p).num_rows
                for p in out.glob("*.parquet"))
    else:
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        out.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(out / "part-0.parquet"))
        n = len(df)
    print(json.dumps({"op": args.name, "rows": int(n), "out": str(out)}))
    return 0


def _cmd_warc(args) -> int:
    """``warc export``: stream a crawled (or synthetic) pages layout out
    as ISO-28500 shard files; ``warc ingest``: turn raw WARC shards into
    a crawlable web root (pages/pages_meta/seeds/robots) — the Common
    Crawl on-ramp/off-ramp."""
    _ray_init(args)
    import ray.data

    from .sources import warc_to_web_root, write_warc
    if args.action == "export":
        files = sorted(str(p) for p in
                       Path(args.web_root).glob("pages/bucket=*/*.parquet"))
        if not files:
            print(f"no pages buckets under {args.web_root}",
                  file=sys.stderr)
            return 2
        n = write_warc(ray.data.read_parquet(files), args.out)
        print(json.dumps({"records": n, "out": args.out}))
        return 0
    shards = sorted(str(p) for p in Path(args.warc_dir).glob("*.warc"))
    if not shards:
        print(f"no .warc shards under {args.warc_dir}", file=sys.stderr)
        return 2
    root, n = warc_to_web_root(shards, args.out,
                               n_buckets=args.n_buckets)
    print(json.dumps({"pages": n, "web_root": str(root)}))
    return 0


def _cmd_serve(args) -> int:
    """HTTP admin service over a crawl out_dir (`app.js:24-33` express
    routes analogue): GET /status, GET/DELETE /deadletters,
    POST /requests (HMAC-checked when --secret), PATCH /config."""
    from .httpadmin import make_server
    srv = make_server(args.out, host=args.host, port=args.port,
                      secret=args.secret or None)
    host, port = srv.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "out": args.out}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


def _cmd_status(args) -> int:
    out = Path(args.out)
    manifests = sorted(out.glob("manifests/wave=*.json"),
                       key=lambda p: int(p.stem.split("=")[1]))
    last = json.loads(manifests[-1].read_text()) if manifests else {}
    print(json.dumps({"waves_complete": len(manifests), "last": last}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m ghcrawler_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run (or resume) a crawl")
    c.add_argument("--web-root", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--scale-mode", action="store_true",
                   help="disable the golden order-log artifact")
    c.add_argument("--max-waves", type=int)
    c.add_argument("--seen-mode", choices=["exact64", "cuckoo"])
    c.add_argument("--n-polite-parts", type=int)
    c.add_argument("--n-buckets", type=int)
    c.add_argument("--n-shards", type=int)
    c.add_argument("--local-wave-threshold", type=int)
    c.add_argument("--num-cpus", type=int)
    c.set_defaults(fn=_cmd_crawl)

    d = sub.add_parser("deadletters", help="list/count/requeue/delete")
    d.add_argument("action", choices=["list", "count", "requeue", "delete"])
    d.add_argument("--out", required=True)
    d.add_argument("--web-root")
    d.add_argument("--reason")
    d.add_argument("--urls", nargs="*")
    d.add_argument("--num-cpus", type=int)
    d.set_defaults(fn=_cmd_deadletters)

    i = sub.add_parser("inject-seeds", help="append seeds before a wave")
    i.add_argument("--out", required=True)
    i.add_argument("--seeds", required=True, help="seed parquet path")
    i.add_argument("--wave", type=int, required=True)
    i.add_argument("--secret", default="",
                   help="HMAC shared secret (webhook-auth analogue); "
                        "requires a matching --signature")
    i.add_argument("--signature", default="",
                   help="hex HMAC-SHA1 of the seeds payload "
                        "(admin.webhook_signature)")
    i.set_defaults(fn=_cmd_inject_seeds)

    pc_ = sub.add_parser("patch-config",
                         help="hot-config: patch live-tunable fields "
                              "before a wave (pubsub analogue)")
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--wave", type=int, required=True)
    pc_.add_argument("--patch", required=True,
                     help='JSON object, e.g. \'{"wave_ms": 20000}\'')
    pc_.set_defaults(fn=_cmd_patch_config)

    sv = sub.add_parser("serve", help="HTTP admin service over a crawl "
                                      "out_dir (express-routes analogue)")
    sv.add_argument("--out", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=0)
    sv.add_argument("--secret", default="",
                    help="HMAC shared secret for POST /requests")
    sv.set_defaults(fn=_cmd_serve)

    st = sub.add_parser("store", help="doc-store get/etag/list/delete/count")
    st.add_argument("action", choices=["get", "etag", "count", "list",
                                       "delete"])
    st.add_argument("--out", required=True)
    st.add_argument("--url")
    st.add_argument("--prefix")
    st.add_argument("--limit", type=int)
    st.add_argument("--n-buckets", type=int, default=64)
    st.set_defaults(fn=_cmd_store)

    o = sub.add_parser("ops", help="run an ops-catalog pipeline → parquet")
    o.add_argument("action", choices=["list", "run"])
    o.add_argument("--name", help="ops-catalog entry (see `ops list`)")
    o.add_argument("--sf-dir", help="input table directory")
    o.add_argument("--out", help="output parquet directory")
    o.add_argument("--num-cpus", type=int)
    o.set_defaults(fn=_cmd_ops)

    w = sub.add_parser("warc", help="export pages ↔ ingest WARC shards")
    w.add_argument("action", choices=["export", "ingest"])
    w.add_argument("--web-root", help="pages layout to export from")
    w.add_argument("--warc-dir", help="shard dir to ingest from")
    w.add_argument("--out", required=True)
    w.add_argument("--n-buckets", type=int, default=64)
    w.add_argument("--num-cpus", type=int)
    w.set_defaults(fn=_cmd_warc)

    s = sub.add_parser("status", help="manifest summary")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=_cmd_status)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
