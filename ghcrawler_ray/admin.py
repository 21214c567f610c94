"""Operational admin surface: deadletter management and mid-crawl seed
injection.

Reference parity (file:line into /root/reference):
- deadletter list/count/delete/requeue: `lib/crawlerService.js:107-134`
  (listDeadletters/getDeadletterCount/deleteDeadletter/requeueDeadletter)
  + REST routes `routes/deadletters.js`.
- requeue untracks the url so the global enqueue-dedup admits it again:
  `providers/queuing/redisRequestTracker.js:43-53` untrack semantics —
  wired here through SeenShard.untrack (the round-1 gap: untrack existed
  but no pipeline path exercised it).
- mid-crawl seed injection: the webhook event source
  (`routes/webhook.js:14-60`) — new seed rows are unioned into the
  frontier between waves; CrawlEngine(inject={wave: seeds}) and the
  sequential oracle grow the identical hook, so ordering parity is
  testable.

All functions operate on a crawl output directory (the engine's
checkpointed state), so they work between runs of different processes:
requeue restores the latest seen-set snapshot, untracks, re-snapshots,
and appends frontier rows that ``run(resume=True)`` then processes.
"""

from __future__ import annotations

import hashlib
import hmac
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .config import CrawlConfig
from .frontier import FRONTIER_COLS, seeds_to_frontier
from .stages.engine_stages import frontier_table
from .urls import hash64_array, normalize_series

DEAD_COLS = ["url", "reason", "attempt", "wave"]


def _dead_files(out_dir: str | Path) -> list[Path]:
    d = Path(out_dir) / "deadletter"
    return sorted(d.rglob("*.parquet")) if d.exists() else []


def list_deadletters(out_dir: str | Path, reason: str | None = None) -> pd.DataFrame:
    """All deadletter rows (url, reason, attempt, wave), optionally
    filtered by reason (`lib/crawlerService.js:107-110` analogue)."""
    files = _dead_files(out_dir)
    if not files:
        return pd.DataFrame({c: [] for c in DEAD_COLS})
    # partitioning=None: files live under deadletter/wave=K/ dirs and carry
    # a physical `wave` column; hive inference would add a conflicting
    # dictionary-typed partition field
    df = pq.read_table([str(f) for f in files],
                       partitioning=None).to_pandas()[DEAD_COLS]
    if reason is not None:
        df = df[df["reason"] == reason]
    return df.sort_values(["wave", "url"]).reset_index(drop=True)


def count_deadletters(out_dir: str | Path) -> int:
    """`getDeadletterCount` — footer metadata only, no row reads."""
    return sum(pq.ParquetFile(str(f)).metadata.num_rows
               for f in _dead_files(out_dir))


def _rewrite_deadletters(out_dir: str | Path, keep: pd.DataFrame) -> None:
    """Replace the deadletter store with ``keep`` (one consolidated
    archive file; idempotent)."""
    d = Path(out_dir) / "deadletter"
    for f in _dead_files(out_dir):
        f.unlink()
    for sub in sorted(d.glob("wave=*")) if d.exists() else []:
        if sub.is_dir() and not any(sub.iterdir()):
            sub.rmdir()
    if len(keep):
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(keep[DEAD_COLS].reset_index(drop=True),
                                            preserve_index=False),
                       d / "archive.parquet")


def delete_deadletters(out_dir: str | Path, urls: list[str] | None = None,
                       reason: str | None = None) -> int:
    """Delete deadletter rows by url list and/or reason
    (`deleteDeadletter` analogue). Returns the number deleted."""
    df = list_deadletters(out_dir)
    mask = pd.Series(True, index=df.index)
    if urls is not None:
        mask &= df["url"].isin(set(urls))
    if reason is not None:
        mask &= df["reason"] == reason
    n = int(mask.sum())
    if n:
        _rewrite_deadletters(out_dir, df[~mask])
    return n


def requeue_deadletters(web_root: str | Path, out_dir: str | Path,
                        cfg: CrawlConfig | None = None,
                        urls: list[str] | None = None,
                        reason: str | None = None,
                        priority: str = "normal") -> int:
    """Requeue deadletters into the next wave's frontier
    (`requeueDeadletter`, `lib/crawlerService.js:120-134`): untrack each
    url from the seen shards (tracker delete,
    `redisRequestTracker.js:43-53`) so its claim succeeds again, rewrite
    the seen snapshot, append fresh frontier rows (attempt=0) eligible at
    the checkpoint clock, and remove the rows from the deadletter store.
    ``CrawlEngine(web_root, out_dir).run(resume=True)`` then processes
    them. Returns the number requeued."""
    from .state.seen import SeenSetPool

    out = Path(out_dir)
    cfg = cfg or CrawlConfig()
    dead = list_deadletters(out)
    mask = pd.Series(True, index=dead.index)
    if urls is not None:
        mask &= dead["url"].isin(set(urls))
    if reason is not None:
        mask &= dead["reason"] == reason
    req = dead[mask].drop_duplicates("url")
    if not len(req):
        return 0

    manifests = sorted(int(p.stem.split("=")[1])
                       for p in (out / "manifests").glob("wave=*.json"))
    if not manifests:
        raise ValueError(f"{out} has no completed waves to resume from")
    k = manifests[-1]
    m = json.loads((out / "manifests" / f"wave={k}.json").read_text())
    clock = int(m["next_clock"])

    # untrack against the checkpointed seen state, shard-side
    snap_dir = out / "seen_snapshots" / f"wave={k + 1}"
    pool = SeenSetPool(cfg.n_shards, cfg.seen_mode,
                       namespace=f"requeue-{out.name}-{k}")
    if snap_dir.exists():
        pool.load_snapshots(str(snap_dir))
    norm = normalize_series(req["url"])
    pool.untrack(hash64_array(norm))
    pool.save_snapshots(str(snap_dir))

    seeds = pd.DataFrame({
        "url": req["url"].astype(str).to_numpy(),
        "priority": priority,
        "policy": "default",
        "seq": hash64_array(norm),
    })
    rows = seeds_to_frontier(seeds)
    rows["not_before"] = np.int64(clock)
    nf = out / "frontier" / f"wave={k + 1}"
    nf.mkdir(parents=True, exist_ok=True)
    pq.write_table(frontier_table(rows), nf / "requeued.parquet")

    _rewrite_deadletters(out, dead[~mask])
    return int(len(req))


def webhook_signature(seeds: pd.DataFrame, secret: str) -> str:
    """HMAC-SHA1 signature of an injected-seeds payload — the webhook
    authenticity check (`routes/webhook.js:34-38`:
    ``crypto.createHmac('sha1', secret)`` over the raw body +
    ``timingSafeEqual``). The "body" here is the canonical seed
    serialization: one JSON-encoded ``[url, priority, seq, policy]``
    line per seed, sorted, so the signature is row-order invariant
    (parquet/DataFrame round-trips don't change it) AND the
    payload → signed-body mapping is injective — a raw tab/newline
    join would let two different payloads containing those separator
    characters canonicalize identically (the reference signs the raw
    request body, `routes/webhook.js:34-38`, so it has no such
    ambiguity)."""
    pol = seeds["policy"].astype(str) if "policy" in seeds else \
        pd.Series(["default"] * len(seeds))
    lines = sorted(
        json.dumps([u, p, int(q), o], separators=(",", ":"))
        for u, p, q, o in zip(seeds["url"].astype(str),
                              seeds["priority"].astype(str),
                              seeds["seq"].astype(np.int64), pol))
    body = "\n".join(lines).encode()
    return hmac.new(secret.encode(), body, hashlib.sha1).hexdigest()


def inject_seeds(out_dir: str | Path, seeds: pd.DataFrame, wave: int,
                 secret: str | None = None,
                 signature: str | None = None) -> int:
    """Webhook-analogue seed injection into a CHECKPOINTED crawl: append
    seed rows to frontier/wave={wave} before that wave runs (between
    engine runs; for in-process injection use CrawlEngine(inject=...)).
    ``seeds`` needs columns (url, priority, seq[, policy]).

    With ``secret`` set, the payload must carry a valid
    :func:`webhook_signature` (`routes/webhook.js:22-38` analogue —
    constant-time compare); on a missing/bad signature NOTHING is
    enqueued and the rejected seeds are deadlettered with
    reason='bad_signature' (the auditable analogue of the webhook's
    400 response), returning -1. The -1 is deliberate: a VALIDLY
    signed empty payload returns 0, so callers (and the CLI exit
    code) can tell authentication failure from a signed no-op."""
    if secret:
        expected = webhook_signature(seeds, secret)
        if signature is None or not hmac.compare_digest(
                signature, expected):
            d = Path(out_dir) / "deadletter" / f"wave={wave}"
            d.mkdir(parents=True, exist_ok=True)
            n = len(list(d.glob("badsig-*.parquet")))
            dead = pd.DataFrame({
                "url": seeds["url"].astype(str).to_numpy(),
                "reason": "bad_signature",
                "attempt": np.zeros(len(seeds), dtype=np.int32),
                "wave": np.int32(wave)})
            pq.write_table(pa.Table.from_pandas(dead[DEAD_COLS],
                                                preserve_index=False),
                           d / f"badsig-{n}.parquet")
            return -1
    rows = seeds_to_frontier(seeds)
    d = Path(out_dir) / "frontier" / f"wave={wave}"
    d.mkdir(parents=True, exist_ok=True)
    n = len(list(d.glob("injected-*.parquet")))
    pq.write_table(frontier_table(rows), d / f"injected-{n}.parquet")
    return len(rows)
