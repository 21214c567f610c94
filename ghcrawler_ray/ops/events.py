"""Windowed / sessionized aggregation over the ``events`` stream table
``(event_id, ts, user_id, event_type, value, props)``.

The reference's only aggregations are operational counters
(`lib/crawlerFactory.js:277-290`, SURVEY.md §2.5); these ops add the
streaming-window semantics a web-scale event pipeline needs:

- ``windowed_agg``: tumbling wall-clock windows — partial aggregation
  happens inside Ray Data's hash-groupby combiner, so the shuffle moves
  one row per (window, type) per block, not raw events.
- ``sessionize``: gap-based sessions per user (stateful, order-dependent)
  via a COARSE user-hash partition (``user_id % N_USER_PARTS``): one
  shuffle co-locates each user's events, and within a partition the
  session assignment is vectorized across ALL its users (sort + grouped
  cumsum) — never one Python task per user (the round-1
  ``groupby(user_id).map_groups`` shape; the project's measured pitfall:
  per-group tasks at high key cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SESSION_GAP_MIN = 30
N_USER_PARTS = 64


def windowed_agg(events: ray.data.Dataset, window: str = "hour") -> ray.data.Dataset:
    """Tumbling-window aggregate: (window_start, event_type) →
    n_events, sum_value, min_value, max_value, avg_value.

    Combiner shape: each batch pre-aggregates to one partial row per
    (window, type), shuffled under a coarse INT key (never raw events
    under a (timestamp, string) sort key); the fold re-sums partials and
    derives avg = sum/n. Callers round sum/avg to 6 dp (the SQL mirror
    does the same), which absorbs the partial-sum float association."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        part = pd.DataFrame({
            "ws": df["ts"].dt.floor("h" if window == "hour" else "D")
            .to_numpy().astype("datetime64[us]").astype(np.int64),
            "event_type": df["event_type"].to_numpy(dtype=object),
            "value": df["value"].to_numpy(dtype=np.float64)})
        agg = part.groupby(["ws", "event_type"], sort=False,
                           as_index=False).agg(
            n=("value", "size"), s=("value", "sum"),
            mn=("value", "min"), mx=("value", "max"))
        agg["part"] = ((agg["ws"].to_numpy(dtype=np.int64)
                        // 3_600_000_000) % N_USER_PARTS).astype(np.int32)
        return agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["ws", "event_type"], sort=False,
                        as_index=False).agg(
            n_events=("n", "sum"), sum_value=("s", "sum"),
            min_value=("mn", "min"), max_value=("mx", "max"))
        n = out["n_events"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "window_start": out["ws"].to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
            "event_type": out["event_type"].astype(str),
            "n_events": n,
            "sum_value": out["sum_value"].to_numpy(dtype=np.float64),
            "min_value": out["min_value"].to_numpy(dtype=np.float64),
            "max_value": out["max_value"].to_numpy(dtype=np.float64),
            "avg_value": out["sum_value"].to_numpy(dtype=np.float64) / n})

    return (events.select_columns(["ts", "event_type", "value"])
            .map_batches(combine, batch_format="pandas")
            .materialize()      # split scan from all-to-all (fusion pitfall)
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


def sessionize(events: ray.data.Dataset,
               gap_minutes: int = SESSION_GAP_MIN) -> ray.data.Dataset:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_id, n_events, t_start, t_end, sum_value)."""
    gap = np.timedelta64(gap_minutes * 60_000_000, "us")

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "ts", "user_id", "value"]].copy()
        out["upart"] = (df["user_id"].to_numpy(dtype=np.int64)
                        % N_USER_PARTS).astype(np.int32)
        return out

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # one coarse partition = MANY users; vectorized across all of them
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        uid = g["user_id"].to_numpy(dtype=np.int64)
        new_user = np.zeros(len(g), dtype=bool)
        brk = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            new_user[1:] = uid[1:] != uid[:-1]
            brk[1:] = ((np.diff(ts) > gap) & ~new_user[1:]).astype(np.int64)
        # per-user session id = cumsum of breaks, rebased at user starts
        c = brk.cumsum()
        starts = np.flatnonzero(np.concatenate([[True], new_user[1:]]))
        runlen = np.diff(np.concatenate([starts, [len(g)]]))
        g["session_id"] = c - np.repeat(c[starts], runlen)
        agg = g.groupby(["user_id", "session_id"], sort=False).agg(
            n_events=("event_id", "size"),
            t_start=("ts", "min"), t_end=("ts", "max"),
            sum_value=("value", "sum")).reset_index()
        agg["sum_value"] = agg["sum_value"].round(6)
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg[["user_id", "session_id", "n_events", "t_start", "t_end",
                    "sum_value"]]

    return (events.select_columns(["event_id", "ts", "user_id", "value"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("upart").map_groups(sessions, batch_format="pandas"))


# ---- hopping (sliding) windows ----

HOP_MINUTES = 15
WINDOW_HOPS = 4          # window length = 4 hops = 1 h


def sliding_window_agg(events: ray.data.Dataset) -> ray.data.Dataset:
    """Hopping-window aggregate (1 h window, 15 min hop): every event
    lands in WINDOW_HOPS windows, exploded VECTORIZED inside the map
    task (np.repeat — 4× slim rows, html-free) and immediately combined
    per batch, so the shuffle moves one row per (window, type) per
    batch under a coarse INT key — never the 4×-exploded event rows
    under a (timestamp, string) sort key (the repo's measured
    string-shuffle pitfall). The per-partition fold re-sums the
    partials; sum_value is rounded to 6 dp (matching the SQL mirror),
    which absorbs the float partial-sum association. Output:
    (window_start, event_type, n_events, sum_value)."""
    hop = HOP_MINUTES * 60_000_000          # µs

    def explode_combine(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").to_numpy().astype(np.int64)
        base = (us // hop) * hop            # floor to hop boundary
        k = np.tile(np.arange(WINDOW_HOPS, dtype=np.int64), len(df))
        part = pd.DataFrame({
            "ws": np.repeat(base, WINDOW_HOPS) - k * hop,
            "event_type": np.repeat(df["event_type"].to_numpy(dtype=object),
                                    WINDOW_HOPS),
            "value": np.repeat(df["value"].to_numpy(dtype=np.float64),
                               WINDOW_HOPS)})
        agg = part.groupby(["ws", "event_type"], sort=False,
                           as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        agg["part"] = ((agg["ws"].to_numpy(dtype=np.int64) // hop)
                       % N_USER_PARTS).astype(np.int32)
        return agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["ws", "event_type"], sort=False,
                        as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return pd.DataFrame({
            "window_start": out["ws"].to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
            "event_type": out["event_type"].astype(str),
            "n_events": out["n_events"].to_numpy(dtype=np.int64),
            "sum_value": out["sum_value"].round(6)})

    return (events.select_columns(["ts", "event_type", "value"])
            .map_batches(explode_combine, batch_format="pandas")
            # split the scan from the all-to-all (measured fusion pitfall)
            .materialize()
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- as-of join ----

ASOF_LEFT = "click"
ASOF_RIGHT = "purchase"


def asof_join_events(events: ray.data.Dataset,
                     left_type: str = ASOF_LEFT,
                     right_type: str = ASOF_RIGHT) -> ray.data.Dataset:
    """As-of join within the event stream: for every ``left_type`` event,
    the most recent ``right_type`` event of the same user at or before
    its timestamp (ties on ts broken by larger event_id). Output:
    (event_id, user_id, ts, asof_event_id, asof_value) with -1 / 0.0
    when no prior right event exists.

    Scale shape: one coarse user-hash shuffle co-locates each user's
    events; within a partition pandas ``merge_asof`` resolves ALL its
    users in one vectorized backward-search (sorted by ts, by=user_id) —
    the standard distributed as-of pattern (co-partition on the equality
    key, ordered merge on the time key). Documented partitioning
    assumption: both sides hash-partition by user_id."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["event_type"].isin([left_type, right_type])
        out = df.loc[keep, ["event_id", "ts", "user_id", "event_type",
                            "value"]].copy()
        out["upart"] = (out["user_id"].to_numpy(dtype=np.int64)
                        % N_USER_PARTS).astype(np.int32)
        return out

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type] \
            .sort_values(["ts", "event_id"], kind="stable")
        right = g[g["event_type"] == right_type] \
            .sort_values(["ts", "event_id"], kind="stable") \
            .rename(columns={"event_id": "asof_event_id",
                             "value": "asof_value"})
        if not len(left):
            return pd.DataFrame({
                "event_id": np.empty(0, np.int64),
                "user_id": np.empty(0, np.int64),
                "ts": np.empty(0, "datetime64[us]"),
                "asof_event_id": np.empty(0, np.int64),
                "asof_value": np.empty(0, np.float64)})
        # merge_asof keeps the LAST matching right row per left row; the
        # (ts, event_id) sort makes that "latest ts, then largest id"
        m = pd.merge_asof(left, right[["ts", "user_id", "asof_event_id",
                                       "asof_value"]],
                          on="ts", by="user_id", direction="backward",
                          allow_exact_matches=True)
        return pd.DataFrame({
            "event_id": m["event_id"].astype(np.int64),
            "user_id": m["user_id"].astype(np.int64),
            "ts": m["ts"].astype("datetime64[us]"),
            "asof_event_id": m["asof_event_id"].fillna(-1).astype(np.int64),
            "asof_value": m["asof_value"].fillna(0.0).astype(np.float64)})

    return (events.select_columns(["event_id", "ts", "user_id",
                                   "event_type", "value"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("upart").map_groups(asof, batch_format="pandas"))


# ---- broadcast range join ----

#: (band_id, lo, hi) value bands — the small side of the range join;
#: half-open [lo, hi), last band unbounded
VALUE_BANDS: tuple[tuple[int, float, float], ...] = (
    (0, 0.0, 2.0), (1, 2.0, 5.0), (2, 5.0, 10.0),
    (3, 10.0, 15.0), (4, 15.0, float("inf")))


def range_join_bands(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_id, event_type, value, band_id): non-equi (range) join of
    the event stream against a small bands table — the canonical
    broadcast range join. The bands are a per-task constant (at real
    scale: `ray.put` once, read in `__init__` of an actor-pool stage —
    never re-shipped per batch); each batch resolves ALL its rows with
    one vectorized ``searchsorted`` against the band edges instead of a
    per-row scan or an all-to-all non-equi join. Events below every band
    get band_id -1."""
    edges = np.array([b[1] for b in VALUE_BANDS], dtype=np.float64)

    def join(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        band = np.searchsorted(edges, v, side="right") - 1
        return pd.DataFrame({
            "event_id": df["event_id"].astype(np.int64),
            "event_type": df["event_type"].astype(str),
            "value": v,
            "band_id": band.astype(np.int64)})

    return events.select_columns(["event_id", "event_type", "value"]) \
        .map_batches(join, batch_format="pandas")


# ---- per-window heavy hitters ----

TOPK_WINDOW_K = 5


def window_topk_users(events: ray.data.Dataset,
                      k: int = TOPK_WINDOW_K) -> ray.data.Dataset:
    """Per tumbling hour window, the top-``k`` users by event count:
    (window_start, user_id, n_events, rank 1..k), rank ordered by
    (n desc, user_id asc).

    Combiner shape: each batch collapses to one (window, user) partial
    row; ONE coarse int-keyed shuffle co-locates a window's partials;
    the fold re-sums and takes the per-window top-k vectorized across
    ALL windows of the partition (sort + grouped head, never one task
    per window). Only (int, int, int) rows ever move."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "ws": df["ts"].dt.floor("h").to_numpy()
            .astype("datetime64[us]").astype(np.int64),
            "user_id": df["user_id"].to_numpy(dtype=np.int64)}) \
            .groupby(["ws", "user_id"], sort=False, as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        g["part"] = ((g["ws"].to_numpy(dtype=np.int64) // 3_600_000_000)
                     % N_USER_PARTS).astype(np.int32)
        return g[["part", "ws", "user_id", "n"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["ws", "user_id"], sort=False, as_index=False)["n"] \
            .sum()
        out = out.sort_values(["ws", "n", "user_id"],
                              ascending=[True, False, True], kind="stable")
        top = out.groupby("ws", sort=False).head(k).copy()
        top["rank"] = (top.groupby("ws", sort=False).cumcount()
                       .to_numpy(dtype=np.int64) + 1)
        return pd.DataFrame({
            "window_start": top["ws"].to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
            "user_id": top["user_id"].to_numpy(dtype=np.int64),
            "n_events": top["n"].to_numpy(dtype=np.int64),
            "rank": top["rank"].to_numpy(dtype=np.int64)})

    return (events.select_columns(["ts", "user_id"])
            .map_batches(combine, batch_format="pandas")
            .materialize()      # split scan from all-to-all (fusion pitfall)
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- cohort retention ----

def cohort_retention(events: ray.data.Dataset) -> ray.data.Dataset:
    """Day-grain cohort retention: cohort = a user's first active day;
    output (cohort_day, day_offset, n_users) = how many of each
    cohort's users were active ``day_offset`` days after joining.

    Shape: per-batch distinct (user, day) combiner → ONE user-hash
    co-partition (a user's days all land together, so cohort = local
    min and the (cohort, offset) partial counts are exact) → the
    second groupby moves only #(cohort × offset) count rows (≤ days²,
    tiny) — the classic two-level distinct-then-count without ever
    shuffling raw events."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "day": df["ts"].dt.floor("D").to_numpy()
            .astype("datetime64[us]").astype(np.int64)}) \
            .drop_duplicates()
        g["part"] = (g["user_id"].to_numpy(dtype=np.int64)
                     % N_USER_PARTS).astype(np.int32)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id", sort=False)["day"].transform("min") \
            .to_numpy(dtype=np.int64)
        day = g["day"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({
            "cohort": cohort,
            "day_offset": (day - cohort) // 86_400_000_000}) \
            .groupby(["cohort", "day_offset"], sort=False,
                     as_index=False).size()
        out["n"] = out["size"].astype(np.int64)
        out["cpart"] = ((out["cohort"].to_numpy(dtype=np.int64)
                         // 86_400_000_000) % N_USER_PARTS).astype(np.int32)
        return out[["cpart", "cohort", "day_offset", "n"]]

    def fold2(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort", "day_offset"], sort=False,
                        as_index=False)["n"].sum()
        return pd.DataFrame({
            "cohort_day": out["cohort"].to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
            "day_offset": out["day_offset"].to_numpy(dtype=np.int64),
            "n_users": out["n"].to_numpy(dtype=np.int64)})

    return (events.select_columns(["ts", "user_id"])
            .map_batches(combine, batch_format="pandas")
            .materialize()
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("cpart").map_groups(fold2, batch_format="pandas"))


# ---- z-score anomaly detection ----

Z_THRESHOLD = 3.0


def zscore_anomalies(events: ray.data.Dataset,
                     z_thresh: float = Z_THRESHOLD) -> ray.data.Dataset:
    """Per-event-type outliers: (event_id, event_type, value, z) for
    every event whose value is ≥ ``z_thresh`` population standard
    deviations from its type's mean.

    Exactness: values are 2-dp fixed-point by construction, so the
    per-type moments (n, S=Σcents, Q=Σcents²) are exact int64 partial
    sums — order-independent — reduced by one tiny ``aggregate`` (#types
    scalar rows on the driver). The per-row z is ONE fixed IEEE
    expression over exactly-representable doubles
    (``(c·n−S) / sqrt(n·Q − S²)``, every operand < 2^53), so the DuckDB
    mirror is bit-exact with no rounding. Shape: one moments pass + one
    streaming flag pass with the ≤#types constants in the closure
    (``ray.put`` at fleet scale); zero row shuffles. At 10⁹+ rows/type
    carry Q as a hi/lo pair (int64 headroom, same note as
    ops/relational.py)."""
    from ray.data.aggregate import Count, Sum

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["value"].to_numpy(dtype=np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"]
                          .to_numpy(dtype=object),
                          "s": c, "q": c * c,
                          "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby("event_type", sort=False, as_index=False).sum()

    m = (events.select_columns(["event_type", "value"])
         .map_batches(moments, batch_format="pandas")
         .groupby("event_type")
         .aggregate(Sum("s", alias_name="s"), Sum("q", alias_name="q"),
                    Sum("n", alias_name="n"))
         .to_pandas())                     # ≤ #types rows
    stats = {r.event_type: (int(r.n), int(r.s),
                            float(r.n) * float(r.q)
                            - float(r.s) * float(r.s))
             for r in m.itertuples()}

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["value"].to_numpy(dtype=np.float64) * 100.0
                     + 0.5).astype(np.int64)
        et = df["event_type"].to_numpy(dtype=object)
        n = np.fromiter((stats[t][0] for t in et), dtype=np.int64,
                        count=len(et))
        s = np.fromiter((stats[t][1] for t in et), dtype=np.int64,
                        count=len(et))
        den = np.sqrt(np.fromiter((stats[t][2] for t in et),
                                  dtype=np.float64, count=len(et)))
        z = (c * n - s).astype(np.float64) / den
        keep = np.abs(z) >= z_thresh
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(dtype=np.int64)[keep],
            "event_type": et[keep],
            "value": df["value"].to_numpy(dtype=np.float64)[keep],
            "z": z[keep]})

    return (events.select_columns(["event_id", "event_type", "value"])
            .map_batches(flag, batch_format="pandas"))


# ---- conversion funnel ----

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(events: ray.data.Dataset) -> ray.data.Dataset:
    """Strict sequential funnel per user over ``FUNNEL_STEPS``:
    (user_id, t_view, t_click, t_purchase, depth) where t_click is the
    user's first click strictly AFTER their first view, t_purchase the
    first purchase strictly after that click; depth = steps reached
    (users with no view are absent).

    Shape: slim (user, type, ts) projection → ONE user-hash
    co-partition; within a partition every step is a vectorized
    filter + groupby-min across ALL its users (never a task per user)."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(FUNNEL_STEPS)]
        out = df[["user_id", "event_type", "ts"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["event_type"] == FUNNEL_STEPS[0]] \
            .groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "t_view"})
        c = g[g["event_type"] == FUNNEL_STEPS[1]] \
            .merge(v, on="user_id", how="inner")
        c = c[c["ts"] > c["t_view"]] \
            .groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "t_click"})
        p = g[g["event_type"] == FUNNEL_STEPS[2]] \
            .merge(c, on="user_id", how="inner")
        p = p[p["ts"] > p["t_click"]] \
            .groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "t_purchase"})
        out = v.merge(c, on="user_id", how="left") \
            .merge(p, on="user_id", how="left")
        out["depth"] = (1 + out["t_click"].notna().astype(np.int64)
                        + out["t_purchase"].notna().astype(np.int64))
        out["user_id"] = out["user_id"].astype(np.int64)
        return out[["user_id", "t_view", "t_click", "t_purchase", "depth"]]

    return (events.select_columns(["user_id", "event_type", "ts"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(funnel, batch_format="pandas"))


# ---- rolling window distinct actives ----

ROLLING_DAYS = 7


def rolling_active_users(events: ray.data.Dataset,
                         window_days: int = ROLLING_DAYS) -> ray.data.Dataset:
    """(day, n_active_users): distinct users with ≥1 event in the
    trailing ``window_days``-day window ending at each day present in
    the stream — the DAU/WAU-style rolling-distinct the HLL sketch
    (``ops.sketch.hll_distinct_users``) approximates per hour, here
    exact per day.

    Shape: distinct (user, day) combiner → ONE user-hash co-partition
    where each user's days EXPLODE into their ≤``window_days`` target
    windows and dedup locally (a user is co-located, so the distinct
    (user, window) set is exact without a second wide shuffle) → the
    final groupby moves only (day, count) partials. The present-day
    domain is a tiny sidecar aggregate broadcast into the fold."""
    day_us = 86_400_000_000

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "day": df["ts"].dt.floor("D").to_numpy()
            .astype("datetime64[us]").astype(np.int64)}) \
            .drop_duplicates()
        g["part"] = (g["user_id"].to_numpy(dtype=np.int64)
                     % N_USER_PARTS).astype(np.int32)
        return g

    ud = (events.select_columns(["ts", "user_id"])
          .map_batches(combine, batch_format="pandas")
          .materialize())
    days = np.sort(ud.groupby("day").count().to_pandas()["day"]
                   .to_numpy(dtype=np.int64))        # tiny: #days rows

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        uid = np.repeat(g["user_id"].to_numpy(dtype=np.int64), window_days)
        wday = (np.repeat(g["day"].to_numpy(dtype=np.int64), window_days)
                + np.tile(np.arange(window_days, dtype=np.int64) * day_us,
                          len(g)))
        keep = np.isin(wday, days)       # window ends must be present days
        out = pd.DataFrame({"user_id": uid[keep], "wday": wday[keep]}) \
            .drop_duplicates() \
            .groupby("wday", as_index=False).size()
        out["n"] = out["size"].astype(np.int64)
        out["dpart"] = ((out["wday"].to_numpy(dtype=np.int64) // day_us)
                        % N_USER_PARTS).astype(np.int32)
        return out[["dpart", "wday", "n"]]

    def fold2(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("wday", sort=False, as_index=False)["n"].sum()
        return pd.DataFrame({
            "day": out["wday"].to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
            "n_active_users": out["n"].to_numpy(dtype=np.int64)})

    return (ud.groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("dpart").map_groups(fold2, batch_format="pandas"))


# ---- session transition matrix ----

def event_transitions(events: ray.data.Dataset) -> ray.data.Dataset:
    """(prev_type, next_type, n): corpus-wide counts of consecutive
    event-type transitions within each user's stream (ordered by ts,
    event_id) — the Markov-chain statistic behind next-action models;
    the ``lag() OVER (PARTITION BY user ORDER BY ts)`` window at scale.

    Shape: slim (user, ts, id, type) projection → ONE user-hash
    co-partition; within a partition the lag is one vectorized shift
    across ALL users (adjacent-row compare on the sorted frame, user
    boundaries masked) → only (type, type, count) partials move to the
    final tiny groupby."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "event_type"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy(dtype=object)
        if len(g) < 2:
            return pd.DataFrame({"prev_type": np.empty(0, object),
                                 "next_type": np.empty(0, object),
                                 "n": np.empty(0, np.int64)})
        same = uid[1:] == uid[:-1]
        out = pd.DataFrame({"prev_type": et[:-1][same],
                            "next_type": et[1:][same]}) \
            .groupby(["prev_type", "next_type"], sort=False,
                     as_index=False).size()
        out["n"] = out["size"].astype(np.int64)
        return out[["prev_type", "next_type", "n"]]

    from ray.data.aggregate import Sum
    return (events.select_columns(["user_id", "ts", "event_id",
                                   "event_type"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(transitions, batch_format="pandas")
            .groupby(["prev_type", "next_type"])       # ≤ types² rows
            .aggregate(Sum("n", alias_name="n")))


def revisit_schedule(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_obs, n_changes, interval_us, next_ts_us): adaptive
    re-visit scheduling from an observation log — the Cho/Garcia-Molina
    recrawl-frequency estimator that turns the reference's static
    freshness windows (`lib/traversalPolicy.js` N-days policies) into a
    per-entity learned interval. Each entity's (here: user_id's) stream
    ordered by (ts, event_id) yields n_changes = #(value <> previous
    value); the estimated change spacing ``interval_us = span_us //
    (n_changes + 1)`` schedules ``next_ts_us = last_obs + interval``
    (entities that never change get the full span; single-observation
    entities get interval 0 = revisit immediately to learn a rate).
    All arithmetic is integer µs — bit-exact vs the SQL lag() mirror.

    Shape: slim (user, ts, id, value) projection → ONE coarse user-hash
    co-partition; within a partition the change flags are one vectorized
    adjacent-row compare across ALL users (boundaries masked) and the
    per-user reduce is a single groupby-agg — no per-user tasks."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "value"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def schedule(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        chg = np.zeros(len(g), dtype=np.int64)
        if len(g) >= 2:
            chg[1:] = ((uid[1:] == uid[:-1])
                       & (val[1:] != val[:-1])).astype(np.int64)
        agg = pd.DataFrame({"user_id": uid, "ts_us": ts, "chg": chg}) \
            .groupby("user_id", sort=False).agg(
                n_obs=("ts_us", "size"), n_changes=("chg", "sum"),
                first_us=("ts_us", "min"), last_us=("ts_us", "max")) \
            .reset_index()
        span = (agg["last_us"] - agg["first_us"]).to_numpy(dtype=np.int64)
        n_chg = agg["n_changes"].to_numpy(dtype=np.int64)
        interval = span // (n_chg + 1)
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(dtype=np.int64),
            "n_obs": agg["n_obs"].to_numpy(dtype=np.int64),
            "n_changes": n_chg,
            "interval_us": interval,
            "next_ts_us": agg["last_us"].to_numpy(dtype=np.int64)
            + interval})

    return (events.select_columns(["user_id", "ts", "event_id", "value"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(schedule, batch_format="pandas"))


# ---- semi-structured props parsing (JSON payload extraction) ----

def props_key_stats(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, n_events, n_distinct_k, sum_k, max_k): parse the
    JSON ``props`` payload ({"k": int}) and aggregate the extracted key
    per event type — the semi-structured-ingestion staple (the
    reference's queue messages and stored docs are JSON blobs whose
    fields get promoted to columns exactly like this;
    `providers/queuing/amqp10Queue.js:125-126`).

    Scale shape: extraction is a vectorized regex per batch (the JSON
    string never shuffles); each batch folds to ≤ #types partial rows
    carrying a partial distinct SET surrogate — here distinct-k is
    bounded (k < 1000 by fixture), so partials carry per-(type, k)
    counts and ONE #types·#k-bounded hash-agg finishes; sums/maxes ride
    the same rows."""
    from ray.data.aggregate import Max, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (df["props"].astype(str)
             .str.extract(r'"k":\s*(\d+)', expand=False)
             .fillna("-1").astype(np.int64))
        g = pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "k": k}).groupby(["event_type", "k"],
                                           sort=False).size()
        out = g.rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    per_k = (events.select_columns(["event_type", "props"])
             .map_batches(partial, batch_format="pandas")
             .groupby(["event_type", "k"])
             .aggregate(Sum("n", alias_name="n")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)
        out = pd.DataFrame({
            "event_type": np.asarray(list(g.groups), dtype=object),
            "n_events": g["n"].sum().to_numpy(np.int64),
            "n_distinct_k": g["k"].nunique().to_numpy(np.int64),
            "sum_k": g.apply(
                lambda s: int((s["k"] * s["n"]).sum()),
                include_groups=False).to_numpy(np.int64),
            "max_k": g["k"].max().to_numpy(np.int64)})
        return out

    # ≤ #types × #k rows remain — one tiny final fold
    return (per_k.map_batches(lambda d: d.assign(g=np.int32(0)),
                              batch_format="pandas")
            .groupby("g")
            .map_groups(lambda d: finish(d.drop(columns=["g"])),
                        batch_format="pandas"))


# ---- Markov stationary distribution over event-type transitions ----

MARKOV_ITERS = 4
MARKOV_FP = 10 ** 12


def event_stationary(events: ray.data.Dataset,
                     iters: int = MARKOV_ITERS) -> pd.DataFrame:
    """(event_type, p_fp): fixed-point stationary distribution of the
    event-type Markov chain — where user sessions SETTLE, the
    next-action-model readout on top of ``event_transitions``' counts
    (row-normalized transition matrix, ``iters`` power-iteration rounds
    from uniform). Types with no outgoing transitions leak their mass
    (documented, same convention as pagerank's dangling nodes).

    Exactness: probabilities are 1e-12 fixed-point ints; each term is
    (p·n) // rowsum in arbitrary-precision Python int (the matrix is
    ≤ #types² — a bounded driver fold), mirrored by an unrolled CTE
    chain in HUGEINT. Scale shape: all the heavy lifting is
    ``event_transitions``' ONE user-hash co-partition; this op's own
    work is O(#types²) per round."""
    tr = event_transitions(events).to_pandas()
    types = sorted(set(tr["prev_type"]) | set(tr["next_type"]))
    idx = {t: i for i, t in enumerate(types)}
    src = [idx[t] for t in tr["prev_type"]]
    dst = [idx[t] for t in tr["next_type"]]
    cnt = [int(x) for x in tr["n"]]
    rowsum = [0] * len(types)
    for s, c in zip(src, cnt):
        rowsum[s] += c
    p = [MARKOV_FP // len(types)] * len(types)
    for _ in range(iters):
        nxt = [0] * len(types)
        for s, d, c in zip(src, dst, cnt):
            nxt[d] += (p[s] * c) // rowsum[s]
        p = nxt
    return pd.DataFrame({"event_type": np.array(types, dtype=object),
                         "p_fp": np.array(p, dtype=np.int64)})


# ---- view→purchase conversion latency per user ----

def conversion_latency(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, latency_us): for every user who purchased AT OR AFTER
    their first view, the exact µs gap between first view and first
    subsequent purchase — the per-user latency table the funnel rollup
    (``funnel_conversion``) loses; feed it to the quantile ops
    (``hist_length_quantiles`` machinery) for the p50/p90
    time-to-convert readout.

    Scale shape: ONE user-hash co-partition (the funnel shape); inside
    a partition both "first view" and "first purchase ≥ view" are
    vectorized groupby-mins across ALL the partition's users. Integer
    µs timestamps — bit-exact vs the SQL mirror."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_type"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def latency(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy(dtype=object)
        v = pd.DataFrame({"u": uid[et == "view"],
                          "t": ts[et == "view"]}).groupby("u")["t"].min()
        pu = pd.DataFrame({"u": uid[et == "purchase"],
                           "t": ts[et == "purchase"]})
        pu = pu.merge(v.rename("vt"), left_on="u", right_index=True)
        pu = pu[pu["t"] >= pu["vt"]]
        if not len(pu):
            return pd.DataFrame({"user_id": np.empty(0, np.int64),
                                 "latency_us": np.empty(0, np.int64)})
        first = pu.groupby("u").agg(t=("t", "min"),
                                    vt=("vt", "first")).reset_index()
        return pd.DataFrame({
            "user_id": first["u"].to_numpy(np.int64),
            "latency_us": (first["t"] - first["vt"])
            .to_numpy(np.int64)})

    return (events.select_columns(["user_id", "ts", "event_type"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part")
            .map_groups(latency, batch_format="pandas"))


# ---- hourly seasonality profile ----

def hourly_seasonality(events: ray.data.Dataset) -> pd.DataFrame:
    """(event_type, hour_of_day, n): traffic counts by hour-of-day per
    event type — the seasonality profile capacity planning and anomaly
    baselines start from (read next to ``zscore_anomalies``: that op
    flags deviations, this one shows the curve they deviate from).

    Scale shape: per-batch (type, hour) count combiner — ≤ #types × 24
    rows per batch — folded on the driver; events never shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = pd.to_datetime(df["ts"]).dt.hour.astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"].astype(str),
                            "hour_of_day": hr})
        g = out.groupby(["event_type", "hour_of_day"], sort=False,
                        as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["event_type", "hour_of_day", "n"]]

    rows = (events.select_columns(["event_type", "ts"])
            .map_batches(partial, batch_format="pandas")
            .to_pandas())                # ≤ #types × 24 × #blocks rows
    out = rows.groupby(["event_type", "hour_of_day"], sort=True)["n"] \
        .sum().reset_index()
    out["n"] = out["n"].astype(np.int64)
    out["event_type"] = out["event_type"].astype(object)
    return out


# ---- inter-event gap histogram (log2 buckets) ----

def inter_event_gaps(events: ray.data.Dataset) -> ray.data.Dataset:
    """(gap_bucket, lo_us, hi_us, n): corpus-wide histogram of the time
    between consecutive events within each user's stream (ordered by
    ts, event_id), in power-of-two microsecond buckets — the
    inter-arrival profile that sizes session timeouts, revisit windows
    and queue-depth planning (the distributional companion to the
    reference's fixed N-day freshness windows,
    `lib/traversalPolicy.js`). Bucket b covers [2^b, 2^(b+1)) µs;
    zero-µs gaps (same-timestamp bursts) land in bucket -1 with
    lo=hi=0. Bucketing is exact integer (searchsorted over powers of
    two, no float log2), so the DuckDB mirror (binary bit-length) is
    bit-exact.

    Shape: slim (user, ts, id) projection → ONE user-hash co-partition;
    within a partition the gap is one vectorized adjacent-row diff
    across ALL users (boundaries masked) folded to ≤ 64 bucket partials
    → tiny final Sum groupby. Nothing user-sized leaves a partition."""
    _POW2 = (np.int64(1) << np.arange(63, dtype=np.int64))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        empty = pd.DataFrame({"gap_bucket": np.empty(0, np.int64),
                              "n": np.empty(0, np.int64)})
        if len(g) < 2:
            return empty
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        same = uid[1:] == uid[:-1]
        gap = (ts[1:] - ts[:-1])[same]
        if not len(gap):
            return empty
        bucket = np.searchsorted(_POW2, gap, side="right").astype(
            np.int64) - 1                      # gap==0 → -1
        b, n = np.unique(bucket, return_counts=True)
        return pd.DataFrame({"gap_bucket": b.astype(np.int64),
                             "n": n.astype(np.int64)})

    from ray.data.aggregate import Sum

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        b = df["gap_bucket"].to_numpy(np.int64)
        nz = b >= 0
        lo = np.zeros(len(b), dtype=np.int64)
        hi = np.zeros(len(b), dtype=np.int64)
        lo[nz] = np.int64(1) << b[nz]
        hi[nz] = (np.int64(1) << (b[nz] + 1)) - 1
        return pd.DataFrame({"gap_bucket": b, "lo_us": lo, "hi_us": hi,
                             "n": df["n"].astype(np.int64)})

    return (events.select_columns(["user_id", "ts", "event_id"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("gap_bucket")                   # ≤ 64 rows
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(widen, batch_format="pandas"))


# ---- burst profile / bot-rate detection ----

BURST_WINDOW_US = 60 * 1_000_000       # 60 s sliding window
BURST_BOT_MIN = 8                      # max-burst ≥ this → bot flag


def burst_profile(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_events, max_burst, is_bot): per-user peak request
    rate — the maximum number of events inside ANY 60-second sliding
    window of that user's stream — plus a bot flag when the peak
    exceeds ``BURST_BOT_MIN``. This is the crawler-trap / abusive-agent
    detector the reference rate-limits against (token caps,
    `lib/crawlerFactory.js:74-76`) expressed as an offline audit.

    Window semantics match SQL ``RANGE BETWEEN 60s PRECEDING AND
    CURRENT ROW``: for each event at time t the count is #{ts_j ∈
    [t−60s, t]} over the SAME user (tie rows all count, position-
    independent), and max_burst is the max over the user's events.

    Shape: slim (user, ts) projection → ONE user-hash co-partition.
    Within a partition the window counts for ALL users come from one
    vectorized merge-rank pass: upper(t) = #(ts ≤ t) via a tie-group
    cumulative transform, lower(t) = #(ts < t−W) by lexsorting the
    2n (uid, time, is_data) keys once and cum-summing data flags — no
    per-user loop, no per-row Python. Only (user, n, max) rows leave."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"],
                          kind="stable").reset_index(drop=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"user_id": np.empty(0, np.int64),
                                 "n_events": np.empty(0, np.int64),
                                 "max_burst": np.empty(0, np.int64)})
        # segment starts and per-(uid,ts) tie-group ranks
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), 0))
        # upper(t_i) = index-after-last-tie − seg_start  (ties all count)
        new_tie = new_seg.copy()
        new_tie[1:] |= ts[1:] != ts[:-1]
        tie_id = np.cumsum(new_tie) - 1
        # last position of each tie group, broadcast back to rows
        last_of_tie = np.zeros(tie_id[-1] + 1, dtype=np.int64)
        np.maximum.at(last_of_tie, tie_id, np.arange(n))
        upper = last_of_tie[tie_id] + 1 - seg_start
        # lower(t_i) = #(ts_j < t_i − W) in segment, via one lexsort of
        # data rows (flag 1) and query rows (flag 0, time t−W): queries
        # sort BEFORE equal-time data ⇒ strict <.
        q_time = ts - BURST_WINDOW_US
        all_uid = np.concatenate([uid, uid])
        all_time = np.concatenate([ts, q_time])
        all_flag = np.concatenate([np.ones(n, np.int8),
                                   np.zeros(n, np.int8)])
        order = np.lexsort((all_flag, all_time, all_uid))
        data_before = np.cumsum(all_flag[order]) - all_flag[order]
        pos_of_query = np.empty(2 * n, dtype=np.int64)
        pos_of_query[order] = np.arange(2 * n)
        lower = data_before[pos_of_query[n:]] - seg_start
        burst = upper - lower
        out = pd.DataFrame({"user_id": uid, "burst": burst})
        agg = out.groupby("user_id", sort=False).agg(
            n_events=("burst", "size"),
            max_burst=("burst", "max")).reset_index()
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["max_burst"] = agg["max_burst"].astype(np.int64)
        return agg

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_bot"] = (df["max_burst"] >= BURST_BOT_MIN)
        return df

    return (events.select_columns(["user_id", "ts"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(fold, batch_format="pandas")
            .map_batches(finish, batch_format="pandas"))


# ---- event-type affinity (user-overlap Jaccard) ----

AFFINITY_FP = 10 ** 6


def event_type_affinity(events: ray.data.Dataset) -> pd.DataFrame:
    """(type_a, type_b, n_a, n_b, n_both, jaccard_fp) for every pair of
    event types sharing ≥1 user: the user-set Jaccard overlap between
    behaviors — the cross-sell / funnel-adjacency readout ("viewers who
    also purchase") computed as an exact set-overlap join. Only pairs
    with n_both ≥ 1 appear (inner-join semantics, mirrored).
    jaccard_fp = FP·|A∩B| // (|A|+|B|−|A∩B|), exact integer.

    Scale shape: per-batch distinct-(user,type) combiner → ONE
    user-hash co-partition makes the partition-local dedup global; the
    partition's pair counts come from one vectorized self-merge on
    user_id (≤ types² per user) and fold to ≤ types² + types partial
    rows; a tiny Sum groupby and a ≤ types²-row driver finish."""

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "event_type"]].drop_duplicates()
        out = pd.DataFrame({
            "user_id": d["user_id"].to_numpy(np.int64),
            "event_type": d["event_type"].to_numpy(object)})
        out["part"] = (out["user_id"].to_numpy(np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        singles = d.groupby("event_type", sort=False, as_index=False) \
            .size().rename(columns={"size": "n"})
        # kind is the out-of-band row discriminator (1=single, 2=pair)
        # so an actual "" event_type can never collide with bookkeeping
        singles = pd.DataFrame({
            "kind": np.full(len(singles), 1, dtype=np.int32),
            "type_a": singles["event_type"].to_numpy(object),
            "type_b": np.full(len(singles), "", dtype=object),
            "n": singles["n"].astype(np.int64)})
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"], sort=False,
                          as_index=False).size()
        pairs = pd.DataFrame({
            "kind": np.full(len(pairs), 2, dtype=np.int32),
            "type_a": pairs["event_type_x"].to_numpy(object),
            "type_b": pairs["event_type_y"].to_numpy(object),
            "n": pairs["size"].astype(np.int64)})
        return pd.concat([singles, pairs], ignore_index=True)

    from ray.data.aggregate import Sum
    rows = (events.select_columns(["user_id", "event_type"])
            .map_batches(distinct_partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby(["kind", "type_a", "type_b"])   # ≤ types² rows
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    cnt = {t: int(n) for t, n in
           rows.loc[rows["kind"] == 1, ["type_a", "n"]].itertuples(
               index=False)}
    pr = rows[rows["kind"] == 2].reset_index(drop=True)
    n_a = pr["type_a"].map(cnt).to_numpy(np.int64)
    n_b = pr["type_b"].map(cnt).to_numpy(np.int64)
    n_both = pr["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "type_a": pr["type_a"].astype(object),
        "type_b": pr["type_b"].astype(object),
        "n_a": n_a, "n_b": n_b, "n_both": n_both,
        "jaccard_fp": (np.int64(AFFINITY_FP) * n_both
                       // (n_a + n_b - n_both))})


# ---- session profile (bounce rate / engagement rollup) ----

SESSION_FP = 10 ** 6


def session_profile(events: ray.data.Dataset) -> pd.DataFrame:
    """One-row (n_sessions, n_bounce, bounce_fp, total_events,
    mean_events_fp, total_duration_us): the corpus-wide engagement
    scorecard over gap-based sessions — bounce = single-event session
    (the classic web-analytics KPI), mean session depth in FP units,
    total dwell. Exact integers throughout (durations are µs).

    Scale shape: everything heavy happens inside ``sessionize`` (ONE
    user-hash co-partition); the rollup is a per-batch counter combiner
    over the slim session rows plus a scalar Sum."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_events"].to_numpy(np.int64)
        dur = (df["t_end"].astype("datetime64[us]").astype(np.int64)
               - df["t_start"].astype("datetime64[us]").astype(np.int64)
               ).to_numpy()
        return pd.DataFrame({
            "s": [np.int64(len(df))],
            "b": [np.int64((n == 1).sum())],
            "e": [np.int64(n.sum())],
            "d": [np.int64(dur.sum())]})

    agg = (sessionize(events)
           .map_batches(partial, batch_format="pandas",
                        batch_size=65536)
           .aggregate(Sum("s", alias_name="s"), Sum("b", alias_name="b"),
                      Sum("e", alias_name="e"), Sum("d", alias_name="d")))
    s, b, e, d = (int(agg["s"]), int(agg["b"]), int(agg["e"]),
                  int(agg["d"]))
    return pd.DataFrame({
        "n_sessions": np.array([s], dtype=np.int64),
        "n_bounce": np.array([b], dtype=np.int64),
        "bounce_fp": np.array([SESSION_FP * b // max(s, 1)],
                              dtype=np.int64),
        "total_events": np.array([e], dtype=np.int64),
        "mean_events_fp": np.array([SESSION_FP * e // max(s, 1)],
                                   dtype=np.int64),
        "total_duration_us": np.array([d], dtype=np.int64)})


# ---- CUSUM drift detection (per-user cumulative-sum control chart) ----

CUSUM_DRIFT_E6 = 60_000_000       # k: allowance/drift, 1e-6 value units
CUSUM_ALARM_E6 = 300_000_000      # H: alarm threshold, 1e-6 value units


def cusum_alarms(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_events, max_cusum_e6, alarm): one-sided CUSUM
    control chart (Page 1954) per user over the event ``value`` stream
    ordered by (ts, event_id) — C_t = max(0, C_{t−1} + x_t − k) with
    allowance k; alarm when the peak exceeds H. The sequential-drift
    detector behind abuse spikes / metric regressions that z-scores
    miss (it accumulates many small exceedances).

    Exactness: values are 2-dp by construction → x carried as exact
    int64 1e-6 units; the recurrence is computed by the prefix identity
    C_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    (x − k), so both sides evaluate pure integer window arithmetic
    (no sequential float accumulation anywhere).

    Scale shape: slim 4-column projection → ONE user-hash co-partition;
    prefix sums and running minima are grouped C-speed scans
    (pandas groupby cumsum/cummin) across ALL of a partition's users;
    only (user, n, max) rows leave."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "value"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        x = np.floor(g["value"].to_numpy(np.float64) * 1e6 + 0.5) \
            .astype(np.int64) - CUSUM_DRIFT_E6
        gb = g.assign(x=x).groupby("user_id", sort=False)
        p = gb["x"].cumsum().to_numpy(np.int64)
        runmin = g.assign(p=p).groupby("user_id", sort=False)["p"] \
            .cummin().to_numpy(np.int64)
        c = p - np.minimum(runmin, 0)
        out = g.assign(c=c).groupby("user_id", sort=False)["c"] \
            .agg(n_events="size", max_cusum_e6="max").reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["max_cusum_e6"] = out["max_cusum_e6"].astype(np.int64)
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["alarm"] = df["max_cusum_e6"] >= CUSUM_ALARM_E6
        return df

    return (events.select_columns(["user_id", "ts", "event_id", "value"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(fold, batch_format="pandas")
            .map_batches(finish, batch_format="pandas"))


# ---- stickiness (DAU / WAU ratio) ----

STICKINESS_FP = 10 ** 6


def stickiness(events: ray.data.Dataset) -> pd.DataFrame:
    """(day, dau, wau, stickiness_fp): the classic engagement ratio —
    distinct daily actives over distinct trailing-7-day actives per
    present day (stickiness_fp = FP·dau // wau, exact). A DAU/WAU near
    FP means users return every day; a sagging ratio flags churn
    before raw counts move.

    Scale shape: two ``rolling_active_users`` passes (window 1 and
    ``ROLLING_DAYS``) — each the distinct-(user,day) combiner → ONE
    user-hash co-partition — joined driver-side on the #days-bounded
    results."""
    d1 = rolling_active_users(events, 1).to_pandas() \
        .rename(columns={"n_active_users": "dau"})
    d7 = rolling_active_users(events, ROLLING_DAYS).to_pandas() \
        .rename(columns={"n_active_users": "wau"})
    m = d1.merge(d7, on="day", how="inner").sort_values("day") \
        .reset_index(drop=True)
    m["dau"] = m["dau"].astype(np.int64)
    m["wau"] = m["wau"].astype(np.int64)
    m["stickiness_fp"] = (np.int64(STICKINESS_FP)
                          * m["dau"].to_numpy(np.int64)
                          // np.maximum(m["wau"].to_numpy(np.int64), 1))
    return m[["day", "dau", "wau", "stickiness_fp"]]


# ---- daily periodicity (24h-recurrence detector) ----

PERIOD_LO_US = 23 * 3_600_000_000 + 1_800_000_000   # 23h30m
PERIOD_HI_US = 24 * 3_600_000_000 + 1_800_000_000   # 24h30m
PERIOD_FP = 10 ** 6


def daily_periodicity(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_events, n_daily_pairs, periodicity_fp): for each
    user, how many event pairs are separated by roughly one day
    (gap ∈ [23h30m, 24h30m], inclusive) — the circadian-recurrence
    signal that separates scheduled agents (cron-like fetchers, the
    reference's polling loops) and habitual returners from random
    traffic. periodicity_fp = FP·n_daily_pairs // n_events, exact.

    Shape: ONE user-hash co-partition; all users' window pair-counts
    come from a single vectorized merge-rank lexsort (the
    ``burst_profile`` machinery with a two-sided window): for each
    event, #(ts_j ≤ t−LO) − #(ts_j < t−HI) within the user, summed.
    Only (user, n, pairs) rows leave a partition."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"],
                          kind="stable").reset_index(drop=True)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"user_id": np.empty(0, np.int64),
                                 "n_events": np.empty(0, np.int64),
                                 "n_daily_pairs": np.empty(0, np.int64)})
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), 0))
        # one lexsort answers both bounds: data rows flag 1; "≤ t−LO"
        # queries flag 2 (after equal-time data); "< t−HI" queries
        # flag 0 (before equal-time data)
        all_uid = np.concatenate([uid, uid, uid])
        all_time = np.concatenate([ts, ts - PERIOD_LO_US,
                                   ts - PERIOD_HI_US])
        all_flag = np.concatenate([np.full(n, 1, np.int8),
                                   np.full(n, 2, np.int8),
                                   np.full(n, 0, np.int8)])
        order = np.lexsort((all_flag, all_time, all_uid))
        is_data = all_flag[order] == 1
        data_before = np.cumsum(is_data) - is_data
        pos = np.empty(3 * n, dtype=np.int64)
        pos[order] = np.arange(3 * n)
        le_lo = data_before[pos[n:2 * n]] - seg_start   # ≤ t−LO
        lt_hi = data_before[pos[2 * n:]] - seg_start    # < t−HI
        pairs = le_lo - lt_hi
        out = pd.DataFrame({"user_id": uid, "p": pairs}) \
            .groupby("user_id", sort=False)["p"] \
            .agg(n_events="size", n_daily_pairs="sum").reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_daily_pairs"] = out["n_daily_pairs"].astype(np.int64)
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["periodicity_fp"] = (np.int64(PERIOD_FP)
                                * df["n_daily_pairs"].to_numpy(np.int64)
                                // np.maximum(df["n_events"]
                                              .to_numpy(np.int64), 1))
        return df

    return (events.select_columns(["user_id", "ts"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(fold, batch_format="pandas")
            .map_batches(finish, batch_format="pandas"))


# ---- adoption curve (first-touch cohorts per event type) ----

def adoption_curve(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, day, n_new_users): for each event type, how many
    users performed it FOR THE FIRST TIME on each day — the feature
    adoption curve (first-touch cohort counts), the product-analytics
    complement to ``cohort_retention`` (which tracks users after their
    first day overall, not per type).

    Shape: per-batch (user, type, min-ts) combiner → ONE user-hash
    co-partition makes the per-(user,type) minimum global (a user's
    rows co-locate) → per-partition fold to ≤ types × days count
    partials → tiny Sum groupby."""
    from ray.data.aggregate import Sum

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_type": df["event_type"].to_numpy(object),
            "ts_us": df["ts"].astype("datetime64[us]")
            .astype(np.int64).to_numpy()}) \
            .groupby(["user_id", "event_type"], sort=False,
                     as_index=False)["ts_us"].min()
        g["part"] = (g["user_id"].to_numpy(np.int64)
                     % N_USER_PARTS).astype(np.int32)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["user_id", "event_type"], sort=False,
                      as_index=False)["ts_us"].min()
        day_us = 86_400_000_000
        m["day"] = (m["ts_us"].to_numpy(np.int64) // day_us) * day_us
        out = m.groupby(["event_type", "day"], sort=False,
                        as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(object),
            "day": df["day"].to_numpy(np.int64)
            .astype("datetime64[us]"),
            "n_new_users": df["n_new_users"].astype(np.int64)})

    return (events.select_columns(["user_id", "event_type", "ts"])
            .map_batches(combine, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby(["event_type", "day"])    # ≤ types × days rows
            .aggregate(Sum("n", alias_name="n_new_users"))
            .map_batches(finish, batch_format="pandas"))


# ---- weekday activity profile ----

def weekday_profile(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, day_of_week, n): event counts by day-of-week
    (0 = Sunday, DuckDB's ``dayofweek`` convention) per type — the
    weekly-rhythm companion to ``hourly_seasonality`` (weekday-heavy
    purchase types vs weekend browsing; schedule crawls/batch jobs in
    the troughs). Integer epoch-day arithmetic: dow = (days_since_epoch
    + 4) % 7 (1970-01-01 was a Thursday), bit-exact vs the mirror.

    Shape: per-batch (type, dow) count combiner → ≤ types×7 partials →
    tiny Sum groupby."""
    from ray.data.aggregate import Sum
    day_us = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        dow = ((us // day_us) + 4) % 7
        g = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object),
            "day_of_week": dow.astype(np.int64),
            "n": np.ones(len(df), dtype=np.int64)}) \
            .groupby(["event_type", "day_of_week"], sort=False,
                     as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n"] = df["n"].astype(np.int64)
        df["day_of_week"] = df["day_of_week"].astype(np.int64)
        return df

    return (events.select_columns(["event_type", "ts"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby(["event_type", "day_of_week"])   # ≤ types×7 rows
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(fix, batch_format="pandas"))


# ---- time-decayed activity score (half-life counters) ----

DECAY_FP_SHIFT = 40            # score unit = 2^40 per zero-age event
_DAY_DECAY_US = 86_400_000_000


def decayed_user_activity(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_events, score_fp): per-user activity score where an
    event's weight halves per day of age relative to the corpus max
    timestamp — the freshness/recency counter behind adaptive crawl
    scheduling and churn scoring, with NO floating point: the weight is
    ``2^40 >> age_days`` (exact, order-independent integer sum), so the
    result is bit-identical to the SQL bit-shift mirror. A float
    ``Σ exp(-λ·age)`` is summation-order-dependent and can never pin a
    distributed==sequential equality; the power-of-two ladder can.

    Scale shape: the global max timestamp is one scalar aggregate
    (parquet footer statistics at read time make this nearly free);
    then ONE combiner pass folds each batch to per-user partials and
    ONE user-hash co-partition completes the sums. Bit shifts are
    clamped at 63 (numpy shift ≥ 64 is undefined; DuckDB saturates to
    0 — ages that old contribute 0 in both engines)."""
    from ray.data.aggregate import Max

    mx = events.select_columns(["ts"]).aggregate(Max("ts"))["max(ts)"]
    mx_us = np.int64(pd.Timestamp(mx).value // 1000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        age = (mx_us - us) // np.int64(_DAY_DECAY_US)
        w = np.int64(1 << DECAY_FP_SHIFT) >> np.minimum(age, np.int64(63))
        t = pd.DataFrame({"u": df["user_id"].to_numpy(np.int64), "w": w})
        agg = t.groupby("u", as_index=False).agg(
            n=("w", "size"), s=("w", "sum"))
        agg["part"] = (agg["u"].to_numpy(np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("u", sort=False, as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"))
        return pd.DataFrame({
            "user_id": agg["u"].to_numpy(np.int64),
            "n_events": agg["n"].to_numpy(np.int64),
            "score_fp": agg["s"].to_numpy(np.int64)})

    return (events.select_columns(["ts", "user_id"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas"))


# ---- day-over-day deltas per event type (discrete derivative) ----

def daily_type_deltas(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, day, n, delta): daily event count per type and its
    change from the type's previous ACTIVE day (first day delta = n) —
    the discrete-derivative trend feed behind release-regression and
    traffic-shift alerts.

    Scale shape: per-batch (type, day) count partials (combiner) → the
    bounded (types × days) series reduces under ONE type-hash
    co-partition where each type's days sort locally and the lag diff
    is one vectorized shift — the corpus never re-shuffles and no
    global sort runs."""
    from ..urls import hash64_array

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        t = pd.DataFrame({"et": df["event_type"].to_numpy(dtype=object),
                          "d": d})
        agg = t.groupby(["et", "d"], as_index=False).size()
        agg["part"] = (hash64_array(agg["et"]) % 16).astype(np.int32)
        return agg.rename(columns={"size": "n"})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["et", "d"], sort=False, as_index=False)["n"].sum()
        s = s.sort_values(["et", "d"], kind="stable").reset_index(drop=True)
        n = s["n"].to_numpy(np.int64)
        et = s["et"].to_numpy(dtype=object)
        prev = np.concatenate([[np.int64(0)], n[:-1]])
        new_type = np.zeros(len(s), dtype=bool)
        if len(s) > 1:
            new_type[1:] = et[1:] != et[:-1]
        new_type[0] = True
        prev[new_type] = 0
        return pd.DataFrame({
            "event_type": et,
            "day": s["d"].to_numpy(np.int64)
            .astype("datetime64[D]").astype("datetime64[us]"),
            "n": n, "delta": n - prev})

    return (events.select_columns(["event_type", "ts"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .select_columns(["event_type", "day", "n", "delta"]))


# ---- behavioral diversity (inverse Simpson index per user) ----

SIMPSON_FP = 10 ** 6


def user_type_diversity(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_events, n_types, simpson_fp): per-user behavioral
    diversity as the inverse Simpson index ``n² / Σ c_t²`` (1 = does
    one thing, #types = perfectly mixed) in 1e6 fixed point — the
    bot/spam signature feed (single-type firehose users score 1e6).
    Shannon entropy needs logs whose float sums are order-dependent;
    inverse Simpson is a pure integer rational, so distributed ==
    sequential == SQL bit-for-bit.

    Scale shape: per-batch (user, type) count partials → ONE user-hash
    co-partition completes each user's type histogram and folds to one
    row per user; ≤ users × types slim rows shuffle once."""
    from ..urls import hash64_array

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"u": df["user_id"].to_numpy(np.int64),
                          "et": df["event_type"].to_numpy(dtype=object)})
        agg = t.groupby(["u", "et"], as_index=False).size()
        agg["part"] = (agg["u"].to_numpy(np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return agg.rename(columns={"size": "n"})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["u", "et"], sort=False, as_index=False)["n"].sum()
        c = s["n"].to_numpy(np.int64)
        agg = pd.DataFrame({"u": s["u"].to_numpy(np.int64),
                            "n": c, "sq": c * c}) \
            .groupby("u", as_index=False) \
            .agg(n_events=("n", "sum"), n_types=("n", "size"),
                 ssq=("sq", "sum"))
        n = agg["n_events"].to_numpy(np.int64)
        ssq = agg["ssq"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": agg["u"].to_numpy(np.int64),
            "n_events": n,
            "n_types": agg["n_types"].to_numpy(np.int64),
            "simpson_fp": np.int64(SIMPSON_FP) * n * n
            // np.maximum(ssq, 1)})

    return (events.select_columns(["user_id", "event_type"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .select_columns(["user_id", "n_events", "n_types",
                             "simpson_fp"]))


# ---- association rules (market-basket over behavior types) ----

RULE_MIN_BOTH = 1


def association_rules(events: ray.data.Dataset,
                      min_both: int = RULE_MIN_BOTH) -> pd.DataFrame:
    """Directed association rules antecedent→consequent over per-user
    distinct event-type baskets: (antecedent, consequent, n_ante,
    n_cons, n_both, n_users, support, confidence, lift) for every
    ordered type pair co-occurring in ≥ ``min_both`` users — the
    classic market-basket readout with exact integer counts and one
    IEEE division per measure (support = n_both/n_users, confidence =
    n_both/n_ante, lift = n_both·n_users / (n_ante·n_cons)).

    Scale shape = ``event_type_affinity``: per-batch distinct
    (user, type) combiner → ONE user-hash co-partition (partitions own
    disjoint users, so partition-local distinct-user and pair counts
    sum exactly) → ≤ types² + types + 1 partial rows per partition →
    tiny Sum groupby → driver finish over ≤ types² rows."""

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "event_type"]].drop_duplicates()
        out = pd.DataFrame({
            "user_id": d["user_id"].to_numpy(np.int64),
            "event_type": d["event_type"].to_numpy(object)})
        out["part"] = (out["user_id"].to_numpy(np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        singles = d.groupby("event_type", sort=False, as_index=False) \
            .size()
        # kind discriminates row roles out-of-band (0=user total,
        # 1=single, 2=pair) — a real "" event_type cannot collide
        singles = pd.DataFrame({
            "kind": np.full(len(singles), 1, dtype=np.int32),
            "type_a": singles["event_type"].to_numpy(object),
            "type_b": np.full(len(singles), "", dtype=object),
            "n": singles["size"].astype(np.int64)})
        users = pd.DataFrame({
            "kind": np.array([0], dtype=np.int32),
            "type_a": np.array([""], dtype=object),
            "type_b": np.array([""], dtype=object),
            "n": np.array([d["user_id"].nunique()], dtype=np.int64)})
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"], sort=False,
                          as_index=False).size()
        pairs = pd.DataFrame({
            "kind": np.full(len(pairs), 2, dtype=np.int32),
            "type_a": pairs["event_type_x"].to_numpy(object),
            "type_b": pairs["event_type_y"].to_numpy(object),
            "n": pairs["size"].astype(np.int64)})
        return pd.concat([users, singles, pairs], ignore_index=True)

    from ray.data.aggregate import Sum
    rows = (events.select_columns(["user_id", "event_type"])
            .map_batches(distinct_partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas")
            .groupby(["kind", "type_a", "type_b"])   # ≤ types² + types + 1
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    n_users = int(rows.loc[rows["kind"] == 0, "n"].iloc[0])
    cnt = {t: int(n) for t, n in
           rows.loc[rows["kind"] == 1,
                    ["type_a", "n"]].itertuples(index=False)}
    pr = rows[rows["kind"] == 2].reset_index(drop=True)
    pr = pr[pr["n"].to_numpy(np.int64) >= min_both].reset_index(drop=True)
    # both directions from the undirected pair counts (driver-side,
    # ≤ types² rows)
    ante = np.concatenate([pr["type_a"].to_numpy(object),
                           pr["type_b"].to_numpy(object)])
    cons = np.concatenate([pr["type_b"].to_numpy(object),
                           pr["type_a"].to_numpy(object)])
    n_both = np.concatenate([pr["n"].to_numpy(np.int64)] * 2) \
        if len(pr) else np.empty(0, dtype=np.int64)
    n_ante = np.array([cnt[t] for t in ante], dtype=np.int64)
    n_cons = np.array([cnt[t] for t in cons], dtype=np.int64)
    out = pd.DataFrame({
        "antecedent": ante, "consequent": cons,
        "n_ante": n_ante, "n_cons": n_cons, "n_both": n_both,
        "n_users": np.full(len(ante), n_users, dtype=np.int64),
        "support": n_both.astype(np.float64) / np.float64(n_users),
        "confidence": n_both.astype(np.float64)
        / n_ante.astype(np.float64),
        "lift": (n_both * n_users).astype(np.float64)
        / (n_ante * n_cons).astype(np.float64)})
    return out.sort_values(["antecedent", "consequent"], kind="stable") \
        .reset_index(drop=True)


# ---- Markov next-event prediction accuracy (model eval at scale) ----

def markov_accuracy(events: ray.data.Dataset) -> pd.DataFrame:
    """One-row (n_transitions, n_correct, accuracy): top-1 accuracy of
    the global first-order Markov next-event model evaluated over every
    consecutive event pair — the distributed train-then-score loop in
    miniature (train = ``event_transitions``' count matrix, score = a
    second streaming pass against the broadcast argmax table).

    The predictor for prev-type t is the next-type with the highest
    global count, ties broken lexicographically smallest — mirrored by
    the SQL ``row_number() ORDER BY n DESC, next_type`` window. In-
    sample by design (the eval-harness shape, not a generalization
    claim).

    Scale shape: the transition matrix is ≤ types² rows (driver-small);
    the argmax table broadcasts via ``ray.put`` as sorted key/value
    arrays; the scoring pass reuses the user-hash co-partition so each
    partition scores ALL its users with one vectorized shift + one
    searchsorted probe, folding to TWO ints per partition."""
    tm = event_transitions(events).to_pandas()
    tm = tm.sort_values(["prev_type", "n", "next_type"],
                        ascending=[True, False, True], kind="stable")
    am = tm.drop_duplicates("prev_type", keep="first")
    prev_sorted = am["prev_type"].to_numpy(dtype=object)
    order = np.argsort(prev_sorted, kind="stable")
    ref = ray.put((prev_sorted[order],
                   am["next_type"].to_numpy(dtype=object)[order]))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "event_type"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def score(g: pd.DataFrame) -> pd.DataFrame:
        pk, pv = ray.get(ref)
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy(dtype=object)
        if len(g) < 2 or len(pk) == 0:
            return pd.DataFrame({"n_transitions": [0], "n_correct": [0]})
        same = uid[1:] == uid[:-1]
        prev = et[:-1][same]
        actual = et[1:][same]
        pos = np.searchsorted(pk, prev)
        pos[pos == len(pk)] = 0
        pred = pv[pos]
        known = pk[pos] == prev
        hits = int(((pred == actual) & known).sum())
        return pd.DataFrame({"n_transitions": [int(same.sum())],
                             "n_correct": [hits]})

    from ray.data.aggregate import Sum
    agg = (events.select_columns(["user_id", "ts", "event_id",
                                  "event_type"])
           .map_batches(add_part, batch_format="pandas")
           .groupby("part").map_groups(score, batch_format="pandas")
           .aggregate(Sum("n_transitions", alias_name="n_transitions"),
                      Sum("n_correct", alias_name="n_correct")))
    n = int(agg["n_transitions"]); c = int(agg["n_correct"])
    return pd.DataFrame({
        "n_transitions": [n], "n_correct": [c],
        "accuracy": [float(c) / float(max(n, 1))]})


# ---- session path mining (top behavior sequences) ----

SESSION_PATH_LEN = 5


def session_paths(events: ray.data.Dataset,
                  gap_minutes: int = SESSION_GAP_MIN,
                  max_len: int = SESSION_PATH_LEN) -> ray.data.Dataset:
    """(path, n_sessions, n_users): behavior-path mining — for every
    gap-session, path = its first ``max_len`` event types in
    (ts, event_id) order joined with '>'; rolled up to how many
    sessions and how many distinct users follow each prefix path. The
    UX-flow readout ("view>view>purchase vs view>bounce") that sits on
    top of sessionization the way funnel_conversion sits on ordered
    pairs.

    Scale shape: slim 4-column projection → ONE user-hash co-partition
    (a user's events resolve into sessions wholly inside their
    partition, so per-partition distinct-user counts are exact and sum
    globally — partitions own disjoint users); session assignment and
    prefix selection fully vectorized; ≤ |paths| × parts partial rows →
    small path-keyed fold (path alphabet is types^max_len-bounded)."""
    from ..urls import hash64_array

    gap = np.timedelta64(gap_minutes * 60_000_000, "us")

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "ts", "user_id", "event_type"]].copy()
        out["upart"] = (df["user_id"].to_numpy(dtype=np.int64)
                        % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        uid = g["user_id"].to_numpy(dtype=np.int64)
        new_user = np.zeros(len(g), dtype=bool)
        brk = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            new_user[1:] = uid[1:] != uid[:-1]
            brk[1:] = ((np.diff(ts) > gap) & ~new_user[1:]) \
                .astype(np.int64)
        c = brk.cumsum()
        starts = np.flatnonzero(np.concatenate([[True], new_user[1:]]))
        runlen = np.diff(np.concatenate([starts, [len(g)]]))
        g["session_id"] = c - np.repeat(c[starts], runlen)
        rn = g.groupby(["user_id", "session_id"], sort=False).cumcount()
        sub = g[rn.to_numpy() < max_len]
        p = sub.groupby(["user_id", "session_id"], sort=False) \
            ["event_type"].agg(">".join).reset_index(name="path")
        agg = p.groupby("path", as_index=False) \
            .agg(n_sessions=("user_id", "size"),
                 n_users=("user_id", "nunique"))
        agg = agg.astype({"n_sessions": np.int64, "n_users": np.int64})
        agg["ppart"] = (hash64_array(agg["path"]) % 16).astype(np.int32)
        return agg

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("path", as_index=False) \
            .agg(n_sessions=("n_sessions", "sum"),
                 n_users=("n_users", "sum"))
        return s.astype({"n_sessions": np.int64, "n_users": np.int64})

    return (events.select_columns(["event_id", "ts", "user_id",
                                   "event_type"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("upart").map_groups(fold, batch_format="pandas")
            .groupby("ppart")
            .map_groups(lambda g: finish(g.drop(columns=["ppart"])),
                        batch_format="pandas"))


# ---- dwell time attributed to the preceding event type ----

def dwell_by_type(events: ray.data.Dataset) -> pd.DataFrame:
    """(event_type, n_gaps, total_dwell_us, mean_dwell_us): how long
    users linger AFTER each event type — every consecutive same-user
    event pair (ordered by ts, event_id) attributes its gap to the
    FIRST event's type. The per-state companion to
    ``inter_event_gaps``'s global histogram: "users sit 40 s on a view
    but bounce 2 s after an error" is this table. Types whose events
    are always stream-final appear with n_gaps 0. Exact integer µs;
    mean = total // max(n, 1), mirrored.

    Scale shape: slim 4-column projection → ONE user-hash co-partition
    (a user's stream is wholly inside its partition, so adjacent-row
    gaps are exact); one vectorized diff per partition → ≤ types ×
    parts partial rows → bounded driver fold."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts", "event_id", "event_type"]].copy()
        out["part"] = (df["user_id"].to_numpy(dtype=np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").to_numpy().astype(np.int64)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        has_next = np.zeros(len(g), dtype=bool)
        gap = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            same = uid[1:] == uid[:-1]
            has_next[:-1] = same
            gap[:-1] = np.where(same, ts[1:] - ts[:-1], 0)
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy(dtype=object),
            "n": has_next.astype(np.int64),
            "dwell": gap}).groupby("event_type", as_index=False).sum()

    parts = (events.select_columns(["user_id", "ts", "event_id",
                                    "event_type"])
             .map_batches(add_part, batch_format="pandas")
             .groupby("part")
             .map_groups(lambda g: fold(g.drop(columns=["part"])),
                         batch_format="pandas")
             .to_pandas())               # ≤ types × parts rows
    s = parts.groupby("event_type", as_index=False).sum()
    n = s["n"].to_numpy(np.int64)
    tot = s["dwell"].to_numpy(np.int64)
    return pd.DataFrame({
        "event_type": s["event_type"].to_numpy(dtype=object),
        "n_gaps": n, "total_dwell_us": tot,
        "mean_dwell_us": tot // np.maximum(n, 1)}) \
        .sort_values("event_type", kind="stable").reset_index(drop=True)


# ---- watermark / late-event accounting (stream out-of-orderness) ----

WATERMARK_DELAY_MIN = 60       # allowed event-time lag behind the watermark
LATE_BLOCK = 4096              # arrival-order block = event_id // LATE_BLOCK


def late_event_stats(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, n_events, n_late, max_lateness_us): out-of-order
    accounting under a bounded watermark — ``event_id`` is the ARRIVAL
    order (the stream position a queue would deliver in), ``ts`` the
    event time; an event is LATE when its event time lags the maximum
    event time over ALL earlier-arriving events by more than
    ``WATERMARK_DELAY_MIN`` minutes. The streaming-ingestion health
    readout: how much state a windowed operator must retain, per type.

    Scale shape: the running max over arrival order is a classic
    two-pass prefix scan — (1) per-arrival-block partial ``max(ts)``
    rows (≤ #blocks, block = ``event_id // LATE_BLOCK``) folded
    driver-side into an EXCLUSIVE prefix-max per block and broadcast;
    (2) slim (event_id, ts_us, type) rows co-partition ONCE by block,
    each partition seeds its numpy running max with the broadcast
    prefix and folds to ≤ |types| partial rows. Driver state is
    O(#blocks); raw events shuffle once. All integer µs — exact."""
    _NEG = np.int64(np.iinfo(np.int64).min // 4)   # "-inf" seed, no overflow

    def block_max(df: pd.DataFrame) -> pd.DataFrame:
        b = df["event_id"].to_numpy(np.int64) // LATE_BLOCK
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        agg = pd.DataFrame({"b": b, "t": t}).groupby("b", as_index=False) \
            .max()
        return pd.DataFrame({"b": agg["b"].to_numpy(np.int64),
                             "t": agg["t"].to_numpy(np.int64)})

    blocks = (events.select_columns(["event_id", "ts"])
              .map_batches(block_max, batch_format="pandas",
                           batch_size=65536)
              .to_pandas().groupby("b", as_index=False)["t"].max()
              .sort_values("b"))                       # ≤ #blocks rows
    bs = blocks["b"].to_numpy(np.int64)
    # exclusive prefix: seed for block b = max over blocks < b
    pref = np.concatenate([[_NEG],
                           np.maximum.accumulate(
                               blocks["t"].to_numpy(np.int64))[:-1]])
    seed_ref = ray.put((bs, pref))

    thresh = np.int64(WATERMARK_DELAY_MIN) * 60_000_000

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(np.int64)
        b = eid // LATE_BLOCK
        # COARSE partition (block % P), never one Ray group per block:
        # a block's rows still co-locate, the per-block seed scan runs
        # vectorized inside the partition fold
        return pd.DataFrame({
            "part": (b % N_USER_PARTS).astype(np.int32),
            "b": b, "eid": eid,
            "t": df["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64),
            "event_type": df["event_type"].to_numpy(dtype=object)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        bs_, pref_ = ray.get(seed_ref)
        out = []
        for b, sub in g.groupby("b", sort=False):
            sub = sub.sort_values("eid", kind="stable")
            t = sub["t"].to_numpy(np.int64)
            seed = pref_[np.searchsorted(bs_, b)]
            prev_max = np.maximum.accumulate(
                np.concatenate([[seed], t[:-1]]))
            lateness = np.maximum(prev_max - t, 0)
            d = pd.DataFrame({
                "event_type": sub["event_type"].to_numpy(dtype=object),
                "late": (lateness > thresh).astype(np.int64),
                "lateness": lateness})
            agg = d.groupby("event_type", sort=False).agg(
                n_events=("late", "size"), n_late=("late", "sum"),
                max_lateness_us=("lateness", "max")).reset_index()
            out.append(agg)
        res = pd.concat(out, ignore_index=True)
        return pd.DataFrame({
            "event_type": res["event_type"].to_numpy(dtype=object),
            "n_events": res["n_events"].to_numpy(np.int64),
            "n_late": res["n_late"].to_numpy(np.int64),
            "max_lateness_us": res["max_lateness_us"].to_numpy(np.int64)})

    from ray.data.aggregate import Max, Sum
    return (events.select_columns(["event_id", "ts", "event_type"])
            .map_batches(tag, batch_format="pandas", batch_size=65536)
            .groupby("part").map_groups(
                lambda g: fold(g.drop(columns=["part"])),
                batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_late", alias_name="n_late"),
                       Max("max_lateness_us", alias_name="max_lateness_us")))


# ---- peak concurrent sessions (global interval-overlap scan) ----

_DAY_US_EV = 86_400_000_000


def concurrent_sessions_peak(events: ray.data.Dataset,
                             gap_minutes: int = SESSION_GAP_MIN
                             ) -> ray.data.Dataset:
    """(day, n_starts, peak_concurrent): per epoch-day, how many gap
    sessions started and the PEAK number of simultaneously-open
    sessions — the interval-overlap capacity readout (connection-pool /
    rate-limit sizing; the crawl analogue is peak concurrent polite
    hosts). A session is open from its first to its last event
    (inclusive); the running count is evaluated at endpoint instants
    with the deterministic tie order (ts, kind start<end, user_id,
    session_id).

    Scale shape: sessions come from :func:`sessionize` (ONE user-hash
    co-partition); each session folds to two ±1 endpoint rows; the
    global running count is a two-pass prefix scan — per-day net sums
    (≤ #days rows) fold driver-side into an EXCLUSIVE day prefix,
    broadcast; endpoints then co-partition ONCE by day (coarse
    day-hash groups, vectorized per-day scan inside) and each day
    emits one output row. Driver state is O(#days)."""
    sess = sessionize(events, gap_minutes)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        ts0 = df["t_start"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ts1 = df["t_end"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        sid = df["session_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "t": np.concatenate([ts0, ts1]),
            "kind": np.concatenate([np.zeros(len(df), np.int64),
                                    np.ones(len(df), np.int64)]),
            "user_id": np.concatenate([uid, uid]),
            "session_id": np.concatenate([sid, sid]),
            "delta": np.concatenate([np.ones(len(df), np.int64),
                                     np.full(len(df), -1, np.int64)])})

    ep = sess.map_batches(endpoints, batch_format="pandas",
                          batch_size=65536).materialize()

    def day_net(df: pd.DataFrame) -> pd.DataFrame:
        d = df["t"].to_numpy(np.int64) // _DAY_US_EV
        agg = pd.DataFrame({"day": d, "net": df["delta"]
                            .to_numpy(np.int64)}) \
            .groupby("day", as_index=False).sum()
        return agg

    nets = (ep.map_batches(day_net, batch_format="pandas")
            .to_pandas().groupby("day", as_index=False)["net"].sum()
            .sort_values("day"))                    # ≤ #days rows
    days = nets["day"].to_numpy(np.int64)
    pref = np.concatenate([[0], np.cumsum(nets["net"]
                                          .to_numpy(np.int64))[:-1]])
    seed_ref = ray.put((days, pref))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["day"] = out["t"].to_numpy(np.int64) // _DAY_US_EV
        out["part"] = (out["day"].to_numpy(np.int64)
                       % N_USER_PARTS).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        days_, pref_ = ray.get(seed_ref)
        rows = []
        for day, sub in g.groupby("day", sort=False):
            sub = sub.sort_values(["t", "kind", "user_id", "session_id"],
                                  kind="stable")
            run = pref_[np.searchsorted(days_, day)] \
                + np.cumsum(sub["delta"].to_numpy(np.int64))
            rows.append((int(day),
                         int((sub["kind"].to_numpy(np.int64) == 0).sum()),
                         int(run.max())))
        return pd.DataFrame(rows, columns=["day", "n_starts",
                                           "peak_concurrent"]) \
            .astype({"day": np.int64, "n_starts": np.int64,
                     "peak_concurrent": np.int64})

    return (ep.map_batches(tag, batch_format="pandas")
            .groupby("part").map_groups(
                lambda g: fold(g.drop(columns=["part"])),
                batch_format="pandas"))
