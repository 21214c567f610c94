"""ghcrawler_ray — a Ray-Data-native URL-frontier + fetch scheduler.

A from-scratch rebuild of the *capabilities* of microsoft/ghcrawler
(queue-driven fetch→normalize→process→store crawler, see SURVEY.md) as an
idiomatic Ray Data engine over Parquet tables of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``:

- the crawl frontier is a Dataset of rows, processed in *waves*
  (``pipelines/wave.py``) — the determinization of the reference's
  randomized weighted queue loop (``providers/queuing/queueSet.js:46-65``);
- the URL-seen set (reference: Redis tracker tags,
  ``providers/queuing/redisRequestTracker.js``) is a sharded actor pool with
  bloom pre-check (``state/seen.py``);
- per-host politeness (reference: token bench + call caps,
  ``providers/fetcher/tokenFactory.js:81-93``) is a groupby-host budget stage
  with deterministic salting for hot hosts (``state/politeness.py``);
- "fetch" against the crawlable web is a bucket-partitioned hash join of the
  frontier against the pages table (reference: the GitHub HTTP origin +
  doc-store, ``providers/fetcher/githubFetcher.js``);
- every per-row transform is a vectorized ``map_batches`` over Arrow/pandas
  batches; shuffles are explicit and keyed (url-hash buckets, host).

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver, tests' conftest, bench.py).
"""

__version__ = "0.1.0"
