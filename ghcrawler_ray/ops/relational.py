"""Relational pipelines over the TPC-H-style tables (lineitem / orders /
customer) — the wide-aggregate and join shapes a data-processing engine
must provide beyond the crawl's url-keyed joins (SURVEY.md §2.4 has only
exact url/urn joins; these add the broadcast hash join and the
co-partition big×big join).

Scale shapes (100 TB discipline):
- ``pricing_summary``: per-batch PARTIAL groupby (the combiner) collapses
  each batch to its ≤ #(flag,status) group rows before the one tiny hash
  shuffle — the canonical pre-aggregated wide aggregate.
- ``segment_revenue``: customer is the SMALL side — broadcast once via
  ``ray.put`` (sorted key array + values, probed with searchsorted), the
  orders stream never shuffles for the join; only the per-segment
  partials shuffle.
- ``order_revenue_join``: big×big equi-join by CO-PARTITIONING both
  sides on the join key (union slim tagged rows, one
  ``groupby(hash(key) % P)`` shuffle, vectorized pandas join within
  each coarse partition). Documented partitioning assumption: both
  sides hash-partition by orderkey; P bounds task count, not key
  cardinality.

Exactness: every money/quantity column is 2-decimal fixed-point, so all
sums are carried as int64 (cents / 1e-4 / 1e-6 units) and divided ONCE
at the end — aggregation is order-independent and bit-identical to the
DuckDB mirrors (same trick as ``ops/ann.embedding_centroids``). int64
headroom: charge sums in 1e-6 units reach ~1.2e11 per row, so ~7.6e7
rows per (flag,status) group per PARTIAL would be needed to overflow —
at larger scale carry the e6 sums as DECIMAL128-style hi/lo pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

#: TPC-H Q1-style cutoff (dataset ships 1995-2001 dates)
PRICING_CUTOFF = np.datetime64("1998-09-02", "us")
N_JOIN_PARTS = 64


def _cents(x: pd.Series) -> np.ndarray:
    """Exact 2-dp fixed-point: the values are 2-decimal by construction,
    so round-to-nearest recovers the integer cents exactly."""
    return np.floor(x.to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1 analogue: per (l_returnflag, l_linestatus) over rows with
    l_shipdate <= cutoff — sum_qty, sum_base_price, sum_disc_price,
    sum_charge, avg_qty, avg_price, avg_disc, count_order."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= PRICING_CUTOFF]
        q = _cents(df["l_quantity"])
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        t = _cents(df["l_tax"])
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(dtype=object),
            "l_linestatus": df["l_linestatus"].to_numpy(dtype=object),
            "q": q, "p": p, "d": d,
            "disc_e4": p * (100 - d),
            "charge_e6": p * (100 - d) * (100 + t),
            "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["l_returnflag", "l_linestatus"], sort=False) \
            .sum().reset_index()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["q"].to_numpy(np.int64) / 100.0,
            "sum_base_price": df["p"].to_numpy(np.int64) / 100.0,
            "sum_disc_price": df["disc_e4"].to_numpy(np.int64) / 10000.0,
            "sum_charge": df["charge_e6"].to_numpy(np.int64) / 1000000.0,
            "avg_qty": df["q"].to_numpy(np.int64) / 100.0 / n,
            "avg_price": df["p"].to_numpy(np.int64) / 100.0 / n,
            "avg_disc": df["d"].to_numpy(np.int64) / 100.0 / n,
            "count_order": n})
        return out

    return (lineitem.select_columns(
                ["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
            .map_batches(partial, batch_format="pandas")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("q", alias_name="q"), Sum("p", alias_name="p"),
                       Sum("d", alias_name="d"),
                       Sum("disc_e4", alias_name="disc_e4"),
                       Sum("charge_e6", alias_name="charge_e6"),
                       Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pandas"))


def segment_revenue(orders: ray.data.Dataset,
                    customer: pd.DataFrame) -> ray.data.Dataset:
    """Broadcast hash join orders → customer(c_custkey → c_mktsegment),
    then per-segment revenue: (c_mktsegment, n_orders, total_revenue,
    avg_order_value). The customer side is broadcast ONCE (ray.put);
    each batch probes it with one vectorized searchsorted."""
    keys = customer["c_custkey"].to_numpy(dtype=np.int64)
    order_idx = np.argsort(keys, kind="stable")
    seg = customer["c_mktsegment"].to_numpy(dtype=object)[order_idx]
    small_ref = ray.put((keys[order_idx], seg))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        skeys, sseg = ray.get(small_ref)
        ck = df["o_custkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(skeys, ck)
        pos[pos == len(skeys)] = 0
        ok = skeys[pos] == ck            # inner join: drop unmatched
        g = pd.DataFrame({
            "c_mktsegment": sseg[pos[ok]],
            "rev": _cents(df["o_totalprice"][ok]),
            "n": np.ones(int(ok.sum()), dtype=np.int64)})
        return g.groupby("c_mktsegment", sort=False).sum().reset_index()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"],
            "n_orders": df["n"].to_numpy(np.int64),
            "total_revenue": df["rev"].to_numpy(np.int64) / 100.0,
            "avg_order_value": (df["rev"].to_numpy(np.int64) / 100.0
                                / df["n"].to_numpy(np.int64))})

    return (orders.select_columns(["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pandas")
            .groupby("c_mktsegment")
            .aggregate(Sum("rev", alias_name="rev"), Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pandas"))


def order_revenue_join(orders: ray.data.Dataset,
                       lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """Big×big equi-join: per order, line count and gross revenue
    Σ l_extendedprice·(1−l_discount) next to o_totalprice. Both sides
    are slimmed to (key, payload) rows, tagged, unioned, and
    co-partitioned with ONE ``groupby(key % P)`` shuffle; the join is a
    vectorized pandas merge within each coarse partition (many orders
    per partition — never one task per key). Inner join: orders with no
    lineitem rows are dropped."""

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "v": _cents(df["o_totalprice"])})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(dtype=np.int64)
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(df), dtype=np.int8),
            "v": p * (100 - d)})          # 1e-4 units

    def join(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        agg = l.groupby("k", sort=False)["v"].agg(["size", "sum"])
        m = o.merge(agg, left_on="k", right_index=True, how="inner")
        return pd.DataFrame({
            "o_orderkey": m["k"].to_numpy(np.int64),
            "o_totalprice": m["v"].to_numpy(np.int64) / 100.0,
            "n_lines": m["size"].to_numpy(np.int64),
            "gross_revenue": m["sum"].to_numpy(np.int64) / 10000.0})

    tagged = (orders.select_columns(["o_orderkey", "o_totalprice"])
              .map_batches(tag_orders, batch_format="pandas")
              .union(lineitem
                     .select_columns(["l_orderkey", "l_extendedprice",
                                      "l_discount"])
                     .map_batches(tag_lines, batch_format="pandas")))
    return tagged.groupby("part").map_groups(join, batch_format="pandas")


# ---- TPC-H Q3-style composite join (broadcast + co-partition + top-k) ----

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = np.datetime64("1998-06-01", "us")
Q3_TOPK = 10


def shipping_priority(customer: pd.DataFrame, orders: ray.data.Dataset,
                      lineitem: ray.data.Dataset,
                      k: int = Q3_TOPK) -> pd.DataFrame:
    """TPC-H Q3 analogue: top-``k`` open orders of one market segment by
    outstanding revenue — (o_orderkey, revenue, o_orderdate,
    o_orderpriority), revenue = Σ l_extendedprice·(1−l_discount) over
    lines shipped after the cutoff, orders placed before it, ordered by
    (revenue desc, o_orderdate asc, o_orderkey asc).

    The composite shape: SMALL side (segment's custkeys) broadcast via
    ``ray.put`` into the orders filter; the surviving slim order rows
    and the date-filtered line revenues co-partition under ONE
    ``orderkey % P`` shuffle (tagged-union big×big join); per-partition
    local top-k means the driver reduce sees ≤ k × P rows."""
    keys = np.sort(customer.loc[customer["c_mktsegment"] == Q3_SEGMENT,
                                "c_custkey"].to_numpy(dtype=np.int64))
    keys_ref = ray.put(keys)

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        ck = ray.get(keys_ref)
        df = df[df["o_orderdate"] < Q3_CUTOFF]
        pos = np.searchsorted(ck, df["o_custkey"].to_numpy(dtype=np.int64))
        pos[pos == len(ck)] = 0
        df = df[ck[pos] == df["o_custkey"].to_numpy(dtype=np.int64)]
        k_ = df["o_orderkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": k_, "part": (k_ % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "v": df["o_orderdate"].to_numpy()
            .astype("datetime64[us]").astype(np.int64),
            "prio": df["o_orderpriority"].to_numpy(dtype=object)})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > Q3_CUTOFF]
        k_ = df["l_orderkey"].to_numpy(dtype=np.int64)
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        return pd.DataFrame({
            "k": k_, "part": (k_ % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(df), dtype=np.int8),
            "v": p * (100 - d),          # 1e-4 units, exact int64
            "prio": np.full(len(df), "", dtype=object)})

    def join_topk(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        agg = l.groupby("k", sort=False)["v"].sum()
        m = o.merge(agg.rename("rev"), left_on="k", right_index=True,
                    how="inner").reset_index(drop=True)
        m = m.sort_values(["rev", "v", "k"],
                          ascending=[False, True, True]).head(k)
        return pd.DataFrame({
            "o_orderkey": m["k"].to_numpy(np.int64),
            "revenue": m["rev"].to_numpy(np.int64),   # still 1e-4 units
            "odate": m["v"].to_numpy(np.int64),
            "o_orderpriority": m["prio"].to_numpy(dtype=object)})

    tagged = (orders.select_columns(["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_orderpriority"])
              .map_batches(tag_orders, batch_format="pandas")
              .union(lineitem
                     .select_columns(["l_orderkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])
                     .map_batches(tag_lines, batch_format="pandas")))
    top = (tagged.groupby("part").map_groups(join_topk,
                                             batch_format="pandas")
           .to_pandas())                 # ≤ k × P slim rows
    top = top.sort_values(["revenue", "odate", "o_orderkey"],
                          ascending=[False, True, True],
                          kind="stable").head(k).reset_index(drop=True)
    return pd.DataFrame({
        "o_orderkey": top["o_orderkey"].to_numpy(np.int64),
        "revenue": top["revenue"].to_numpy(np.int64) / 10000.0,
        "o_orderdate": top["odate"].to_numpy(np.int64)
        .astype("datetime64[us]"),
        "o_orderpriority": top["o_orderpriority"].astype(str)})


# ---- windowed running total (cumulative sum per key) ----

def customer_running_totals(orders: ray.data.Dataset) -> ray.data.Dataset:
    """``sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY
    o_orderdate, o_orderkey)`` at scale: (o_custkey, o_orderkey,
    o_orderdate, running_total) — the per-entity cumulative spend a
    billing/LTV pipeline computes.

    Shape: ONE custkey-hash co-partition; within a partition the
    cumulative sum is one sort + grouped cumsum vectorized across ALL
    its customers (never a task per key). Totals accumulate as exact
    int64 cents and divide once on output, so the mirror is bit-exact
    regardless of accumulation order."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
            "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
            "odate": df["o_orderdate"].to_numpy()
            .astype("datetime64[us]").astype(np.int64),
            "cents": _cents(df["o_totalprice"])})
        out["part"] = (out["o_custkey"] % N_JOIN_PARTS).astype(np.int32)
        return out

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "odate", "o_orderkey"],
                          kind="stable").reset_index(drop=True)
        run = g.groupby("o_custkey", sort=False)["cents"].cumsum() \
            .to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": g["odate"].to_numpy(np.int64)
            .astype("datetime64[us]"),
            "running_total": run / 100.0})

    return (orders.select_columns(["o_custkey", "o_orderkey",
                                   "o_orderdate", "o_totalprice"])
            .map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(cumsum, batch_format="pandas"))


# ---- star-schema rollup (orders ⋈ customer ⋈ nation ⋈ region) ----

def region_revenue(orders: ray.data.Dataset, customer: ray.data.Dataset,
                   nation: pd.DataFrame,
                   region: pd.DataFrame) -> ray.data.Dataset:
    """Star-schema rollup: (r_name, n_orders, total_revenue) — order
    revenue through the customer → nation → region dimension chain.

    Shape: the two FACT sides (orders, customer) co-partition under ONE
    ``custkey % P`` tagged-union shuffle; the dimension chain
    (nation ⋈ region, dozens of rows) is composed driver-side into one
    nationkey → region-name array broadcast in the closure (``ray.put``
    at fleet scale). Revenue sums are exact int64 cents."""
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")
    nk = dim["n_nationkey"].to_numpy(dtype=np.int64)
    rname = dim["r_name"].to_numpy(dtype=object)
    order_idx = np.argsort(nk, kind="stable")
    nk, rname = nk[order_idx], rname[order_idx]

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_custkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "v": _cents(df["o_totalprice"])})

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(df), dtype=np.int8),
            "v": df["c_nationkey"].to_numpy(dtype=np.int64)})

    def join_fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        c = g[g["side"] == 1].drop_duplicates("k")
        m = o.merge(c[["k", "v"]].rename(columns={"v": "nat"}),
                    on="k", how="inner")
        pos = np.searchsorted(nk, m["nat"].to_numpy(dtype=np.int64))
        out = pd.DataFrame({
            "r_name": rname[pos],
            "rev": m["v"].to_numpy(dtype=np.int64),
            "n": np.ones(len(m), dtype=np.int64)})
        return out.groupby("r_name", sort=False, as_index=False).sum()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "r_name": df["r_name"].astype(str),
            "n_orders": df["n"].to_numpy(np.int64),
            "total_revenue": df["rev"].to_numpy(np.int64) / 100.0})

    from ray.data.aggregate import Sum
    tagged = (orders.select_columns(["o_custkey", "o_totalprice"])
              .map_batches(tag_orders, batch_format="pandas")
              .union(customer.select_columns(["c_custkey", "c_nationkey"])
                     .map_batches(tag_cust, batch_format="pandas")))
    return (tagged.groupby("part").map_groups(join_fold,
                                              batch_format="pandas")
            .groupby("r_name")
            .aggregate(Sum("rev", alias_name="rev"),
                       Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pandas"))


# ---- promo revenue share (TPC-H Q14 shape: fact ⋈ dimension CASE agg) ----

def promo_revenue(lineitem: ray.data.Dataset,
                  part: pd.DataFrame) -> pd.DataFrame:
    """One-row Q14 analogue: the share of discounted revenue earned by
    PROMO-type parts — (promo_revenue, total_revenue, promo_share).

    Shape: the part dimension (p_partkey → is-promo bit) broadcasts
    once via ``ray.put``; each lineitem batch probes it with one
    searchsorted and folds to TWO int64 partials, so the reduce is a
    2-scalar Sum. promo_share is one IEEE division of exact 1e-4-unit
    ints — bit-exact vs the mirror."""
    keys = part["p_partkey"].to_numpy(dtype=np.int64)
    order_idx = np.argsort(keys, kind="stable")
    promo = (part["p_type"].to_numpy(dtype=object)[order_idx] == "PROMO") \
        .astype(np.int64)
    ref = ray.put((keys[order_idx], promo))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, pr = ray.get(ref)
        k = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(pk, k)
        pos[pos == len(pk)] = 0
        ok = pk[pos] == k
        rev = (_cents(df["l_extendedprice"])
               * (100 - _cents(df["l_discount"])))[ok]   # 1e-4 units
        isp = pr[pos[ok]]
        return pd.DataFrame({"promo_e4": [int((rev * isp).sum())],
                             "total_e4": [int(rev.sum())]})

    c = (lineitem.select_columns(["l_partkey", "l_extendedprice",
                                  "l_discount"])
         .map_batches(partial, batch_format="pandas")
         .aggregate(Sum("promo_e4", alias_name="promo_e4"),
                    Sum("total_e4", alias_name="total_e4")))
    p_e4, t_e4 = int(c["promo_e4"]), int(c["total_e4"])
    return pd.DataFrame({
        "promo_revenue": [p_e4 / 10000.0],
        "total_revenue": [t_e4 / 10000.0],
        "promo_share": [np.float64(p_e4) / np.float64(t_e4)]})


# ---- supplier balances by nation ----

def supplier_balances(supplier: ray.data.Dataset,
                      nation: pd.DataFrame) -> ray.data.Dataset:
    """(n_name, n_suppliers, total_acctbal, avg_acctbal): account-balance
    rollup of the supplier table through the nation dimension — the
    small-dimension broadcast-join aggregate over the remaining base
    table. Balances are exact int64 cents, divided once on output."""
    nk = nation["n_nationkey"].to_numpy(dtype=np.int64)
    order_idx = np.argsort(nk, kind="stable")
    nname = nation["n_name"].to_numpy(dtype=object)[order_idx]
    nk = nk[order_idx]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = np.searchsorted(nk, df["s_nationkey"]
                              .to_numpy(dtype=np.int64))
        g = pd.DataFrame({"n_name": nname[pos],
                          "bal": _cents(df["s_acctbal"]),
                          "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby("n_name", sort=False, as_index=False).sum()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        bal = df["bal"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_name": df["n_name"].astype(str),
            "n_suppliers": n,
            "total_acctbal": bal / 100.0,
            "avg_acctbal": bal / 100.0 / n})

    return (supplier.select_columns(["s_nationkey", "s_acctbal"])
            .map_batches(partial, batch_format="pandas")
            .groupby("n_name")
            .aggregate(Sum("bal", alias_name="bal"),
                       Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pandas"))


# ---- TPC-H Q4-shaped EXISTS semi-join ----

def orders_with_returns(orders: ray.data.Dataset,
                        lineitem: ray.data.Dataset) -> pd.DataFrame:
    """(o_orderpriority, n_orders): how many orders have AT LEAST ONE
    returned line item (l_returnflag = 'R'), counted per priority — the
    TPC-H Q4 EXISTS-semi-join shape (the predicate adapted to this
    schema's columns). The semi-join primitive the catalog's inner /
    broadcast / anti flavors don't cover: existence, not payload.

    Scale shape: lineitem folds to per-batch DISTINCT returned
    orderkeys (slim int rows — the combiner kills within-batch repeat
    lines); orders fold to (orderkey, priority) slim rows; ONE
    orderkey-hash co-partition; inside each coarse partition the
    semi-join is one vectorized ``isin``; output partials are ≤ #parts
    × #priorities count rows folded on the driver."""

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "prio": df["o_orderpriority"].astype(str)})

    def tag_returns(df: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(df.loc[df["l_returnflag"].astype(str) == "R",
                             "l_orderkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "prio": np.full(len(k), "", dtype=object)})

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        ret = g.loc[g["side"] == 1, "k"].to_numpy(np.int64)
        hit = o[o["k"].isin(ret)]
        c = hit.groupby("prio", sort=False).size().reset_index(name="n")
        c["n"] = c["n"].astype(np.int64)
        return c[["prio", "n"]]

    parts = (orders.select_columns(["o_orderkey", "o_orderpriority"])
             .map_batches(tag_orders, batch_format="pandas")
             .union(lineitem.select_columns(["l_orderkey", "l_returnflag"])
                    .map_batches(tag_returns, batch_format="pandas"))
             .groupby("part")
             .map_groups(semi, batch_format="pandas")
             .to_pandas())                  # ≤ #parts × #priorities rows
    out = parts.groupby("prio", sort=True)["n"].sum().reset_index()
    return pd.DataFrame({"o_orderpriority": out["prio"].astype(object),
                         "n_orders": out["n"].astype(np.int64)})


# ---- TPC-H Q22-shaped big×big ANTI join ----

ANTI_PRIORITY = "1-URGENT"


def customers_without_orders(customer: ray.data.Dataset,
                             orders: ray.data.Dataset,
                             priority: str = ANTI_PRIORITY) -> pd.DataFrame:
    """(c_mktsegment, n_customers, total_acctbal_cents): customers who
    never placed a ``priority`` order, rolled up per market segment —
    the TPC-H Q22 anti-join shape completing the join family: inner
    (order_revenue_join), broadcast (segment_revenue), semi
    (orders_with_returns), and now anti. (Every customer in this
    generator has SOME order, so the anti predicate filters on order
    priority to stay selective.) Balances carried as exact integer
    cents.

    Scale shape: orders fold to per-batch DISTINCT matching custkeys
    (slim int combiner); customers ride as (custkey, segment, cents)
    rows; ONE custkey-hash co-partition; inside each coarse partition
    the anti-join is one vectorized ``~isin``; ≤ #parts × #segments
    partial rows fold on the driver."""

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "seg": df["c_mktsegment"].astype(str),
            "bal": _cents(df["c_acctbal"])})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        sel = df["o_orderpriority"].astype(str) == priority
        k = np.unique(df.loc[sel, "o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "seg": np.full(len(k), "", dtype=object),
            "bal": np.zeros(len(k), dtype=np.int64)})

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["side"] == 0]
        has = g.loc[g["side"] == 1, "k"].to_numpy(np.int64)
        miss = c[~c["k"].isin(has)]
        out = miss.groupby("seg", sort=False).agg(
            n=("k", "size"), bal=("bal", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["bal"] = out["bal"].astype(np.int64)
        return out[["seg", "n", "bal"]]

    parts = (customer.select_columns(["c_custkey", "c_mktsegment",
                                      "c_acctbal"])
             .map_batches(tag_cust, batch_format="pandas")
             .union(orders.select_columns(["o_custkey",
                                           "o_orderpriority"])
                    .map_batches(tag_orders, batch_format="pandas"))
             .groupby("part")
             .map_groups(anti, batch_format="pandas")
             .to_pandas())                 # ≤ #parts × #segments rows
    if not len(parts):
        parts = pd.DataFrame({"seg": np.empty(0, object),
                              "n": np.empty(0, np.int64),
                              "bal": np.empty(0, np.int64)})
    out = parts.groupby("seg", sort=True).agg(
        n_customers=("n", "sum"),
        total_acctbal_cents=("bal", "sum")).reset_index()
    return pd.DataFrame({
        "c_mktsegment": out["seg"].astype(object),
        "n_customers": out["n_customers"].astype(np.int64),
        "total_acctbal_cents": out["total_acctbal_cents"]
        .astype(np.int64)})


# ---- part revenue share (TPC-H Q11 shape: HAVING vs global scalar) ----

SHARE_FP = 10 ** 6
# keep parts with share > (NUM/DEN) × the average part's share
SHARE_MULT_NUM = 3
SHARE_MULT_DEN = 2


def part_revenue_share(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(p_partkey, revenue_e4, share_fp) for parts whose lineitem
    revenue share exceeds ``NUM/DEN ×`` the average part's share — the
    TPC-H Q11 shape: a grouped aggregate filtered against a GLOBAL
    aggregate of the same data. The threshold is self-scaling
    (DEN·rev·n_parts > NUM·total), so it stays selective at every sf.
    Revenue is exact 1e-4-dollar int64 units (cents × (100−disc_cents));
    the filter is an integer cross-multiply, so no division enters the
    comparison and the DuckDB mirror is bit-exact. int64 bound: the
    cross-products stay under 2^63 up to ~10^14 e4-units of total
    revenue (~$10^10); beyond that switch the compare to Python/HUGEINT.

    Scale shape: per-batch per-part combiner (batch 65536) → ONE
    coarse partkey-hash co-partition (64 int parts) whose in-partition
    pandas fold finishes per-part revenue — NOT ``groupby(partkey)``
    directly: Ray's aggregate pays ~ms per output GROUP, which is
    pathological at #parts cardinality (measured 45 s for 20k parts vs
    ~1 s for this fold). The slim (#parts-sized) table materializes
    ONCE and serves three bounded reads (scalar total, count, final
    filter map). The fact table streams exactly once."""
    from ray.data.aggregate import Sum

    n_copart = 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = (_cents(df["l_extendedprice"])
               * (100 - _cents(df["l_discount"])))      # 1e-4 units
        g = pd.DataFrame({"l_partkey": df["l_partkey"]
                          .to_numpy(np.int64), "rev_e4": rev}) \
            .groupby("l_partkey", sort=False, as_index=False).sum()
        g["rev_e4"] = g["rev_e4"].astype(np.int64)
        g["part"] = (g["l_partkey"].to_numpy(np.int64)
                     % n_copart).astype(np.int32)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_partkey", sort=False, as_index=False) \
            ["rev_e4"].sum().rename(columns={"rev_e4": "revenue_e4"})
        out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
        return out

    per_part = (lineitem.select_columns(["l_partkey", "l_extendedprice",
                                         "l_discount"])
                .map_batches(partial, batch_format="pandas",
                             batch_size=65536)
                .groupby("part")
                .map_groups(fold, batch_format="pandas")
                .materialize())                 # slim: one row per part
    tot = int(per_part.aggregate(Sum("revenue_e4",
                                     alias_name="t"))["t"])
    n_parts = per_part.count()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["revenue_e4"].to_numpy(np.int64)
        keep = (np.int64(SHARE_MULT_DEN) * rev * np.int64(n_parts)
                > np.int64(SHARE_MULT_NUM) * tot)
        out = df.loc[keep, ["l_partkey", "revenue_e4"]].copy()
        out = out.rename(columns={"l_partkey": "p_partkey"})
        out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
        out["share_fp"] = (np.int64(SHARE_FP)
                           * out["revenue_e4"].to_numpy(np.int64)
                           // np.int64(max(tot, 1)))
        return pd.DataFrame({
            "p_partkey": out["p_partkey"].to_numpy(np.int64),
            "revenue_e4": out["revenue_e4"].to_numpy(np.int64),
            "share_fp": out["share_fp"].to_numpy(np.int64)})

    return per_part.map_batches(finish, batch_format="pandas")


# ---- RFM customer segmentation (recency/frequency/monetary quartiles) ----

_DAY_US = 86_400_000_000


def rfm_segments(orders: ray.data.Dataset) -> ray.data.Dataset:
    """(c_custkey, recency_days, frequency, monetary_e2, r_label,
    f_label, m_label, rfm_code): classic RFM segmentation — each
    customer labeled 1-4 per dimension by exact nearest-rank quartiles
    (label = 1 + #thresholds strictly below the value; threshold_q =
    k-th smallest with k = ceil(q·n), integer ceil). Recency = whole
    days between the customer's last order and the corpus-max order
    date (labels are mechanical: low recency_days ⇒ label 1 = most
    recent). Monetary quartiles are computed at DOLLAR resolution
    (m_bin = cents // 100) so the threshold histogram stays bounded at
    any scale; labels compare the same binned value on both sides.
    rfm_code = 100·r + 10·f + m.

    Scale shape: per-batch per-customer combiner → ONE coarse
    custkey-hash co-partition (64 int parts) whose in-partition pandas
    fold finishes the slim per-customer table (materialized once) —
    not ``groupby(custkey)``, whose per-output-group cost is
    pathological at customer cardinality (see part_revenue_share);
    the three quartile histograms are value-bounded (days / order
    counts / dollar bins) Sum shuffles folded on the driver; the label
    pass streams the per-customer table with nine broadcast ints."""
    from ray.data.aggregate import Max

    n_copart = 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "last_us": df["o_orderdate"].astype("datetime64[us]")
            .astype(np.int64).to_numpy(),
            "f": np.ones(len(df), dtype=np.int64),
            "m_e2": _cents(df["o_totalprice"])})
        g = g.groupby("o_custkey", as_index=False, sort=False) \
            .agg(last_us=("last_us", "max"), f=("f", "sum"),
                 m_e2=("m_e2", "sum"))
        g["part"] = (g["o_custkey"].to_numpy(np.int64)
                     % n_copart).astype(np.int32)
        return g

    def cust_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", as_index=False, sort=False) \
            .agg(last_us=("last_us", "max"), frequency=("f", "sum"),
                 monetary_e2=("m_e2", "sum"))
        for c in ("last_us", "frequency", "monetary_e2"):
            out[c] = out[c].astype(np.int64)
        return out

    cust = (orders.select_columns(["o_custkey", "o_orderdate",
                                   "o_totalprice"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part")
            .map_groups(cust_fold, batch_format="pandas")
            .materialize())                 # slim: one row per customer
    gmax = int(cust.aggregate(Max("last_us", alias_name="g"))["g"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        r = (gmax - df["last_us"].to_numpy(np.int64)) // _DAY_US
        f = df["frequency"].to_numpy(np.int64)
        m = df["monetary_e2"].to_numpy(np.int64) // 100
        frames = []
        for dim, v in (("r", r), ("f", f), ("m", m)):
            u, c = np.unique(v, return_counts=True)
            frames.append(pd.DataFrame({
                "dim": np.full(len(u), dim, dtype=object),
                "val": u.astype(np.int64), "n": c.astype(np.int64)}))
        out = pd.concat(frames, ignore_index=True)
        # coarse int co-partition, NOT groupby((dim,val)): Ray's
        # aggregate is ~ms per output group (pathological at bin
        # cardinality); the fold finishes (dim,val) inside 64 parts
        out["hpart"] = (out["val"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return out

    def hist_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["dim", "val"], sort=False, as_index=False) \
            ["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    hist = (cust.map_batches(hist_partial, batch_format="pandas",
                             batch_size=65536)
            .groupby("hpart")
            .map_groups(hist_fold, batch_format="pandas")
            .to_pandas())                   # value-bounded rows
    thr: dict[str, tuple[int, int, int]] = {}
    for dim, g in hist.groupby("dim"):
        g = g.sort_values("val", kind="stable")
        vals = g["val"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        ks = ((n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4)
        thr[str(dim)] = tuple(int(vals[np.searchsorted(cum, k)])
                              for k in ks)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        r = (gmax - df["last_us"].to_numpy(np.int64)) // _DAY_US
        f = df["frequency"].to_numpy(np.int64)
        m2 = df["monetary_e2"].to_numpy(np.int64)
        m = m2 // 100
        def lab(v, t):
            return (1 + (v > t[0]).astype(np.int64)
                    + (v > t[1]).astype(np.int64)
                    + (v > t[2]).astype(np.int64))
        rl, fl, ml = lab(r, thr["r"]), lab(f, thr["f"]), lab(m, thr["m"])
        return pd.DataFrame({
            "c_custkey": df["o_custkey"].to_numpy(np.int64),
            "recency_days": r, "frequency": f, "monetary_e2": m2,
            "r_label": rl, "f_label": fl, "m_label": ml,
            "rfm_code": 100 * rl + 10 * fl + ml})

    return cust.map_batches(label, batch_format="pandas")


# ---- customer activity × spend join (events × orders) ----

LTV_FP = 10 ** 6


def customer_activity_join(events: ray.data.Dataset,
                           orders: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, n_events, n_orders, total_spend_e2,
    events_per_order_fp): the engagement-vs-purchase profile joining
    the behavioral stream to the transactional table on the shared
    user/customer key — the LTV segmentation input (heavy browsers who
    never buy vs quiet big spenders). Inner join: only keys present in
    BOTH tables appear. Spend is exact int64 cents;
    events_per_order_fp = FP·n_events // n_orders.

    Scale shape: BOTH fact tables pre-aggregate per batch (combiner) to
    slim per-key partials, then co-partition under ONE shared
    ``key % N_JOIN_PARTS`` tagged-union shuffle; the per-partition fold
    finishes each side's counts and joins vectorized. Neither fact
    table ever shuffles raw rows."""

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": df["user_id"].to_numpy(np.int64),
                          "n": np.ones(len(df), dtype=np.int64)}) \
            .groupby("k", sort=False, as_index=False).sum()
        return pd.DataFrame({
            "k": g["k"].astype(np.int64),
            "part": (g["k"].to_numpy(np.int64)
                     % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(g), dtype=np.int8),
            "n": g["n"].astype(np.int64),
            "spend": np.zeros(len(g), dtype=np.int64)})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": df["o_custkey"].to_numpy(np.int64),
                          "n": np.ones(len(df), dtype=np.int64),
                          "spend": _cents(df["o_totalprice"])}) \
            .groupby("k", sort=False, as_index=False).sum()
        return pd.DataFrame({
            "k": g["k"].astype(np.int64),
            "part": (g["k"].to_numpy(np.int64)
                     % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(g), dtype=np.int8),
            "n": g["n"].astype(np.int64),
            "spend": g["spend"].astype(np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == 0].groupby("k", sort=False, as_index=False) \
            ["n"].sum().rename(columns={"n": "n_events"})
        od = g[g["side"] == 1].groupby("k", sort=False, as_index=False) \
            .agg(n_orders=("n", "sum"), total_spend_e2=("spend", "sum"))
        m = ev.merge(od, on="k", how="inner")
        ne = m["n_events"].to_numpy(np.int64)
        no = m["n_orders"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": m["k"].to_numpy(np.int64),
            "n_events": ne, "n_orders": no,
            "total_spend_e2": m["total_spend_e2"].to_numpy(np.int64),
            "events_per_order_fp": np.int64(LTV_FP) * ne
            // np.maximum(no, 1)})

    ev = events.select_columns(["user_id"]) \
        .map_batches(tag_events, batch_format="pandas", batch_size=65536)
    od = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(tag_orders, batch_format="pandas", batch_size=65536)
    return (ev.union(od).groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- large orders (TPC-H Q18 shape: HAVING over a big groupby) ----

LARGE_QTY_E2 = 300 * 100       # Σ l_quantity > 300, exact cents-of-qty


def large_orders(orders: ray.data.Dataset,
                 lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(o_orderkey, o_custkey, o_orderdate, total_qty_e2): orders whose
    total lineitem quantity exceeds 300 — the TPC-H Q18 "large volume
    customer" shape: a big-fact groupby with a HAVING cut, then a join
    back to the order header. Quantities are exact 1e-2 integers.

    Scale shape: lineitem folds to per-order qty partials per batch
    (combiner) and co-partitions with the slim order headers under ONE
    shared ``orderkey % N_JOIN_PARTS`` tagged-union shuffle; each
    partition finishes its orders' sums, applies the HAVING cut and
    joins vectorized. Neither fact table shuffles raw rows."""

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64),
                          "q": _cents(df["l_quantity"])}) \
            .groupby("k", sort=False, as_index=False).sum()
        return pd.DataFrame({
            "k": g["k"].astype(np.int64),
            "part": (g["k"].to_numpy(np.int64)
                     % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(g), dtype=np.int8),
            "q": g["q"].astype(np.int64),
            "cust": np.zeros(len(g), dtype=np.int64),
            "odate": np.zeros(len(g), dtype=np.int64)})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "q": np.zeros(len(k), dtype=np.int64),
            "cust": df["o_custkey"].to_numpy(np.int64),
            "odate": df["o_orderdate"].astype("datetime64[us]")
            .astype(np.int64).to_numpy()})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0].groupby("k", sort=False,
                                       as_index=False)["q"].sum()
        li = li[li["q"].to_numpy(np.int64) > LARGE_QTY_E2]
        od = g[g["side"] == 1][["k", "cust", "odate"]]
        m = li.merge(od, on="k", how="inner")
        return pd.DataFrame({
            "o_orderkey": m["k"].to_numpy(np.int64),
            "o_custkey": m["cust"].to_numpy(np.int64),
            "o_orderdate": m["odate"].to_numpy(np.int64)
            .astype("datetime64[us]"),
            "total_qty_e2": m["q"].to_numpy(np.int64)})

    li = lineitem.select_columns(["l_orderkey", "l_quantity"]) \
        .map_batches(tag_lines, batch_format="pandas", batch_size=65536)
    od = orders.select_columns(["o_orderkey", "o_custkey",
                                "o_orderdate"]) \
        .map_batches(tag_orders, batch_format="pandas", batch_size=65536)
    return (li.union(od).groupby("part")
            .map_groups(fold, batch_format="pandas"))


# ---- per-key exact distinct count (supplier part coverage) ----

COVERAGE_RATIO_FP = 10 ** 6


def supplier_part_coverage(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(s_suppkey, n_parts, n_lines, lines_per_part_fp): how many
    DISTINCT parts each supplier ships and how concentrated the volume
    is — the exact COUNT(DISTINCT x) GROUP BY k shape done distributed:
    a supplier with few parts but many lines is a single-SKU firehose,
    the assortment-breadth readout.

    Scale shape: each batch emits its distinct (supp, part) pairs PLUS
    per-supp line-count partials (tagged rows, one pass); ONE supp-hash
    co-partition makes the pair-dedup global (a supplier's rows
    co-locate) and folds both kinds to one row per supplier. The
    distinct state never sits on the driver and never re-shuffles."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df["l_suppkey"].to_numpy(np.int64)
        p = df["l_partkey"].to_numpy(np.int64)
        pairs = pd.DataFrame({"s": s, "p": p}).drop_duplicates()
        pairs["kind"] = np.int8(0)
        pairs["n"] = np.int64(0)
        cnt = pd.DataFrame({"s": s}).groupby("s", as_index=False) \
            .size().rename(columns={"size": "n"})
        cnt["p"] = np.int64(-1)
        cnt["kind"] = np.int8(1)
        cnt["n"] = cnt["n"].astype(np.int64)
        out = pd.concat([pairs, cnt[["s", "p", "kind", "n"]]],
                        ignore_index=True)
        out["part"] = (out["s"].to_numpy(np.int64) % 64).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["kind"] == 0].drop_duplicates(["s", "p"])
        np_ = pr.groupby("s", sort=False, as_index=False) \
            .size().rename(columns={"size": "n_parts"})
        nl = g[g["kind"] == 1].groupby("s", sort=False,
                                       as_index=False)["n"].sum() \
            .rename(columns={"n": "n_lines"})
        m = np_.merge(nl, on="s", how="inner")
        npa = m["n_parts"].to_numpy(np.int64)
        nli = m["n_lines"].to_numpy(np.int64)
        return pd.DataFrame({
            "s_suppkey": m["s"].to_numpy(np.int64),
            "n_parts": npa, "n_lines": nli,
            "lines_per_part_fp": np.int64(COVERAGE_RATIO_FP) * nli
            // np.maximum(npa, 1)})

    return (lineitem.select_columns(["l_suppkey", "l_partkey"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas"))


# ---- TPC-H Q7 analogue: cross-nation trade volume ----

def nation_trade_volume(orders: ray.data.Dataset,
                        lineitem: ray.data.Dataset,
                        customer: pd.DataFrame,
                        supplier: pd.DataFrame,
                        nation: pd.DataFrame) -> ray.data.Dataset:
    """(cust_nation, supp_nation, year, revenue_e4, n_lines): revenue
    flowing between distinct customer/supplier nation pairs per
    ship-year — the TPC-H Q7 "volume shipping" shape with three
    broadcast dimension attaches riding ONE big×big co-partition join.

    Scale shape: customer→nation, supplier→nation and nation→name are
    dimension lookups, broadcast once via ``ray.put`` as sorted
    key/value arrays and probed with searchsorted inside the tag
    stages; orders and lineitem co-partition by ``orderkey % P``
    (tagged union, one shuffle), each partition folds to ≤
    nations²·years partial rows, and the final hash groupby touches
    only those partials. The fact rows never shuffle twice.

    Exactness: revenue carried as int64 1e-4 units
    (price_cents · (100 − disc_cents)); summation order-independent."""
    cn = customer.sort_values("c_custkey")
    ck = cn["c_custkey"].to_numpy(np.int64)
    cnat = cn["c_nationkey"].to_numpy(np.int64)
    sn = supplier.sort_values("s_suppkey")
    sk = sn["s_suppkey"].to_numpy(np.int64)
    snat = sn["s_nationkey"].to_numpy(np.int64)
    nn = nation.sort_values("n_nationkey")
    nk = nn["n_nationkey"].to_numpy(np.int64)
    nname = nn["n_name"].to_numpy(dtype=object)
    ref = ray.put((ck, cnat, sk, snat, nk, nname))

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        ck_, cnat_, *_ = ray.get(ref)
        k = df["o_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(ck_, df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "a": cnat_[pos],                       # customer nationkey
            "b": np.zeros(len(df), dtype=np.int64),
            "v": np.zeros(len(df), dtype=np.int64)})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        _, _, sk_, snat_, *_ = ray.get(ref)
        k = df["l_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(sk_, df["l_suppkey"].to_numpy(np.int64))
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        yr = pd.DatetimeIndex(df["l_shipdate"]).year.to_numpy() \
            .astype(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(df), dtype=np.int8),
            "a": snat_[pos],                       # supplier nationkey
            "b": yr,
            "v": p * (100 - d)})                   # 1e-4 units

    def join_fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        m = l.merge(o[["k", "a"]].rename(columns={"a": "cn"}),
                    on="k", how="inner")
        m = m[m["cn"].to_numpy(np.int64) != m["a"].to_numpy(np.int64)]
        agg = m.groupby(["cn", "a", "b"], sort=False).agg(
            revenue_e4=("v", "sum"), n_lines=("v", "size")).reset_index()
        cn_ = agg["cn"].to_numpy(np.int64)
        sn_ = agg["a"].to_numpy(np.int64)
        yr_ = agg["b"].to_numpy(np.int64)
        # int composite key for the final fold — a 3-string-key Ray
        # groupby at a few thousand distinct keys is the pathological
        # per-group shape; one int co-partition fold is not
        return pd.DataFrame({
            "fpart": (((cn_ * 64 + sn_) * 16 + yr_ % 16)
                      % N_JOIN_PARTS).astype(np.int32),
            "cn": cn_, "sn": sn_, "year": yr_,
            "revenue_e4": agg["revenue_e4"].to_numpy(np.int64),
            "n_lines": agg["n_lines"].to_numpy(np.int64)})

    def final_fold(g: pd.DataFrame) -> pd.DataFrame:
        *_, nk_, nname_ = ray.get(ref)
        agg = g.groupby(["cn", "sn", "year"], sort=False).agg(
            revenue_e4=("revenue_e4", "sum"),
            n_lines=("n_lines", "sum")).reset_index()
        return pd.DataFrame({
            "cust_nation": nname_[np.searchsorted(
                nk_, agg["cn"].to_numpy(np.int64))],
            "supp_nation": nname_[np.searchsorted(
                nk_, agg["sn"].to_numpy(np.int64))],
            "year": agg["year"].to_numpy(np.int64),
            "revenue_e4": agg["revenue_e4"].to_numpy(np.int64),
            "n_lines": agg["n_lines"].to_numpy(np.int64)})

    tagged = (orders.select_columns(["o_orderkey", "o_custkey"])
              .map_batches(tag_orders, batch_format="pandas",
                           batch_size=65536)
              .union(lineitem.select_columns(
                  ["l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount", "l_shipdate"])
                  .map_batches(tag_lines, batch_format="pandas",
                               batch_size=65536)))
    return (tagged.groupby("part").map_groups(join_fold,
                                              batch_format="pandas")
            .groupby("fpart").map_groups(final_fold,
                                         batch_format="pandas")
            .select_columns(["cust_nation", "supp_nation", "year",
                             "revenue_e4", "n_lines"]))


# ---- TPC-H Q13 analogue: customer order-count distribution ----

def customer_order_distribution(customer: ray.data.Dataset,
                                orders: ray.data.Dataset) -> ray.data.Dataset:
    """(c_count, custdist): how many customers placed exactly N orders,
    INCLUDING the zero-order customers a plain inner join loses — the
    TPC-H Q13 left-outer-join + double-groupby shape.

    Scale shape: orders collapse to per-custkey count partials inside
    each batch (combiner); customer keys ride as tagged presence rows.
    ONE custkey-hash co-partition completes each customer's global
    count next to its presence row (zero when no order rows arrived);
    each partition folds to ≤ #distinct-counts histogram partials and
    a tiny Sum groupby finishes."""

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "n": np.zeros(len(df), dtype=np.int64)})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("o_custkey", as_index=False).size()
        k = c["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "n": c["size"].to_numpy(np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cust = g.loc[g["side"] == 0, ["k"]]
        cnt = g[g["side"] == 1].groupby("k", sort=False)["n"].sum()
        m = cust.merge(cnt.rename("c_count"), left_on="k",
                       right_index=True, how="left")
        cc = m["c_count"].fillna(0).to_numpy(np.int64)
        h = pd.DataFrame({"c_count": cc}).groupby(
            "c_count", as_index=False).size()
        return pd.DataFrame({
            "c_count": h["c_count"].to_numpy(np.int64),
            "custdist": h["size"].to_numpy(np.int64)})

    tagged = (customer.select_columns(["c_custkey"])
              .map_batches(tag_cust, batch_format="pandas",
                           batch_size=65536)
              .union(orders.select_columns(["o_custkey"])
                     .map_batches(tag_orders, batch_format="pandas",
                                  batch_size=65536)))
    return (tagged.groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("c_count")
            .aggregate(Sum("custdist", alias_name="custdist")))


# ---- TPC-H Q17 analogue: small-quantity revenue gate ----

SMALL_QTY_YEARS = 7


def small_quantity_revenue(lineitem: ray.data.Dataset) -> pd.DataFrame:
    """One row (n_lines, total_price_e2, avg_yearly_e2): revenue from
    lineitem rows whose quantity is below 20% of their part's average
    quantity — the TPC-H Q17 correlated-aggregate shape (per-key scalar
    aggregate joined back to the fact rows of the same key).

    Scale shape: slim (partkey, qty_e2, price_e2) rows co-partition
    ONCE by ``partkey % P``; each partition computes its parts' global
    sum/count (all of a part's rows co-locate) and the row-level gate
    vectorized, emitting one scalar partial per partition. The gate
    ``qty < 0.2·avg`` is evaluated as ``5·qty·n < sum_qty`` — pure
    int64, no division, bit-exact vs the SQL window mirror."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_partkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "part": (k % N_JOIN_PARTS).astype(np.int32), "k": k,
            "q": _cents(df["l_quantity"]),
            "p": _cents(df["l_extendedprice"])})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("k", sort=False)["q"].agg(["sum", "size"])
        m = g.merge(s, left_on="k", right_index=True, how="left")
        keep = (np.int64(5) * m["q"].to_numpy(np.int64)
                * m["size"].to_numpy(np.int64)) \
            < m["sum"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_lines": [np.int64(keep.sum())],
            "total_price_e2": [m["p"].to_numpy(np.int64)[keep].sum()]})

    parts = (lineitem.select_columns(["l_partkey", "l_quantity",
                                      "l_extendedprice"])
             .map_batches(tag, batch_format="pandas", batch_size=65536)
             .groupby("part").map_groups(fold, batch_format="pandas")
             .to_pandas())                       # ≤ P scalar partials
    n = np.int64(parts["n_lines"].to_numpy(np.int64).sum())
    tot = np.int64(parts["total_price_e2"].to_numpy(np.int64).sum())
    return pd.DataFrame({
        "n_lines": [n], "total_price_e2": [tot],
        "avg_yearly_e2": [tot // np.int64(SMALL_QTY_YEARS)]})


# ---- TPC-H Q10 analogue: returned-item revenue top customers ----

RETURNED_TOPK = 20


def returned_item_revenue(orders: ray.data.Dataset,
                          lineitem: ray.data.Dataset,
                          customer: pd.DataFrame,
                          nation: pd.DataFrame,
                          k: int = RETURNED_TOPK) -> pd.DataFrame:
    """Top-``k`` customers by revenue lost to returned lines
    (l_returnflag = 'R'): (c_custkey, c_name, n_name, revenue_e4) —
    the TPC-H Q10 two-join + group + top-k shape, ties broken by
    custkey asc.

    Scale shape: returned lines collapse to per-orderkey revenue
    partials inside each batch; orders ride slim (orderkey, custkey);
    ONE orderkey co-partition joins them and folds to per-custkey
    partials ≤ customers per partition; a second custkey co-partition
    completes each customer's total and keeps a local top-k, so the
    driver merges ≤ k·P slim rows and attaches the broadcast
    customer/nation attributes once (at 100 TB customer attrs attach
    via the same co-partition instead — documented tradeoff)."""
    P = N_JOIN_PARTS

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        a = pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64),
                          "v": p * (100 - d)})
        a = a.groupby("k", as_index=False)["v"].sum()
        kk = a["k"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": kk, "part": (kk % P).astype(np.int32),
            "side": np.ones(len(kk), dtype=np.int8),
            "v": a["v"].to_numpy(np.int64)})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        kk = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": kk, "part": (kk % P).astype(np.int32),
            "side": np.zeros(len(kk), dtype=np.int8),
            "v": df["o_custkey"].to_numpy(np.int64)})

    def join_fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1].groupby("k", sort=False)["v"].sum()
        m = o.merge(l.rename("rev"), left_on="k", right_index=True,
                    how="inner")
        agg = m.groupby("v", sort=False)["rev"].sum()
        ck = agg.index.to_numpy(np.int64)
        return pd.DataFrame({
            "ck": ck, "cpart": (ck % P).astype(np.int32),
            "rev": agg.to_numpy(np.int64)})

    def topk_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("ck", sort=False)["rev"].sum().reset_index()
        s = s.sort_values(["rev", "ck"], ascending=[False, True],
                          kind="stable").head(k)
        return s

    tagged = (orders.select_columns(["o_orderkey", "o_custkey"])
              .map_batches(tag_orders, batch_format="pandas",
                           batch_size=65536)
              .union(lineitem.select_columns(
                  ["l_orderkey", "l_returnflag", "l_extendedprice",
                   "l_discount"])
                  .map_batches(tag_lines, batch_format="pandas",
                               batch_size=65536)))
    top = (tagged.groupby("part")
           .map_groups(join_fold, batch_format="pandas")
           .groupby("cpart").map_groups(topk_fold, batch_format="pandas")
           .to_pandas())                          # ≤ k·P slim rows
    top = top.sort_values(["rev", "ck"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
    cs = customer.sort_values("c_custkey")
    pos = np.searchsorted(cs["c_custkey"].to_numpy(np.int64),
                          top["ck"].to_numpy(np.int64))
    ns = nation.sort_values("n_nationkey")
    npos = np.searchsorted(
        ns["n_nationkey"].to_numpy(np.int64),
        cs["c_nationkey"].to_numpy(np.int64)[pos])
    return pd.DataFrame({
        "c_custkey": top["ck"].to_numpy(np.int64),
        "c_name": cs["c_name"].to_numpy(dtype=object)[pos],
        "n_name": ns["n_name"].to_numpy(dtype=object)[npos],
        "revenue_e4": top["rev"].to_numpy(np.int64)})


# ---- TPC-H Q22 analogue: wealthy inactive customers per nation ----

WEALTHY_CUTOFF = np.datetime64("2000-01-01", "us")


def wealthy_inactive_customers(customer: ray.data.Dataset,
                               orders: ray.data.Dataset) -> ray.data.Dataset:
    """(c_nationkey, n_cust, total_acctbal_e2): customers whose account
    balance exceeds the global average POSITIVE balance and who placed
    no order on/after the cutoff (lapsed, not merely order-less — every
    fixture customer has SOME order) — the TPC-H Q22 scalar-subquery +
    anti-join shape.

    Scale shape: the scalar threshold is a Sum/Count pass over
    customer (exact int64 cents; the comparison ``bal·n > sum`` avoids
    the division); the anti-join co-partitions customer rows with
    per-batch-distinct recent-order custkeys under ONE custkey hash
    shuffle; partition folds emit ≤ nations partials."""
    bal = customer.map_batches(
        lambda df: pd.DataFrame({
            "s": [_cents(df.loc[df["c_acctbal"] > 0.0, "c_acctbal"]).sum()],
            "n": [np.int64((df["c_acctbal"] > 0.0).sum())]}),
        batch_format="pandas", batch_size=65536) \
        .to_pandas()
    sum_pos = np.int64(bal["s"].to_numpy(np.int64).sum())
    n_pos = np.int64(bal["n"].to_numpy(np.int64).sum())

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        b = _cents(df["c_acctbal"])
        keep = b * n_pos > sum_pos
        df = df[keep]
        kk = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": kk, "part": (kk % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(kk), dtype=np.int8),
            "nat": df["c_nationkey"].to_numpy(np.int64),
            "bal": b[keep]})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderdate"] >= WEALTHY_CUTOFF]
        kk = np.unique(df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "k": kk, "part": (kk % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(kk), dtype=np.int8),
            "nat": np.zeros(len(kk), dtype=np.int64),
            "bal": np.zeros(len(kk), dtype=np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        active = np.unique(g.loc[g["side"] == 1, "k"].to_numpy(np.int64))
        c = g[g["side"] == 0]
        kk = c["k"].to_numpy(np.int64)
        if len(active):
            pos = np.searchsorted(active, kk)
            pos[pos == len(active)] = 0
            inactive = active[pos] != kk
        else:
            inactive = np.ones(len(kk), dtype=bool)
        c = c[inactive]
        agg = c.groupby("nat", sort=False)["bal"].agg(["size", "sum"])
        return pd.DataFrame({
            "c_nationkey": agg.index.to_numpy(np.int64),
            "n_cust": agg["size"].to_numpy(np.int64),
            "total_acctbal_e2": agg["sum"].to_numpy(np.int64)})

    tagged = (customer.select_columns(["c_custkey", "c_nationkey",
                                       "c_acctbal"])
              .map_batches(tag_cust, batch_format="pandas",
                           batch_size=65536)
              .union(orders.select_columns(["o_custkey", "o_orderdate"])
                     .map_batches(tag_orders, batch_format="pandas",
                                  batch_size=65536)))
    return (tagged.groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("c_nationkey")
            .aggregate(Sum("n_cust", alias_name="n_cust"),
                       Sum("total_acctbal_e2",
                           alias_name="total_acctbal_e2")))


# ---- TPC-H Q2 analogue: cheapest supplier per part ----

UNIT_PRICE_FP = 10 ** 6


def cheapest_supplier_per_part(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(l_partkey, s_suppkey, unit_price_fp, n_offers): for every part,
    the supplier offering the lowest observed unit price — the TPC-H Q2
    groupwise-argmin join shape. ``unit_price_fp =
    (price_e2 · 1e6) // qty_e2`` (pure int64), ties broken by suppkey
    asc; ``n_offers`` counts the part's lineitem rows.

    Scale shape: each batch reduces to its parts' local argmin + count
    partials (combiner — the shuffle carries ≤ #parts·#batches slim
    rows, not the fact table); ONE partkey co-partition finishes the
    argmin and the count. Argmin-of-partials is valid because min over
    (unit_price_fp, suppkey) lexicographic pairs is associative."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_partkey"].to_numpy(np.int64)
        q = _cents(df["l_quantity"])
        p = _cents(df["l_extendedprice"])
        up = (p * np.int64(UNIT_PRICE_FP)) // np.maximum(q, 1)
        t = pd.DataFrame({"k": k, "s": df["l_suppkey"]
                          .to_numpy(np.int64), "up": up})
        t = t.sort_values(["k", "up", "s"], kind="stable")
        best = t.drop_duplicates("k", keep="first")
        cnt = t.groupby("k", sort=False, as_index=False).size()
        m = best.merge(cnt, on="k")
        m["part"] = (m["k"].to_numpy(np.int64)
                     % N_JOIN_PARTS).astype(np.int32)
        return m.rename(columns={"size": "n"})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values(["k", "up", "s"], kind="stable")
        best = t.drop_duplicates("k", keep="first")
        cnt = g.groupby("k", sort=False, as_index=False)["n"].sum()
        m = best[["k", "s", "up"]].merge(cnt, on="k")
        return pd.DataFrame({
            "l_partkey": m["k"].to_numpy(np.int64),
            "s_suppkey": m["s"].to_numpy(np.int64),
            "unit_price_fp": m["up"].to_numpy(np.int64),
            "n_offers": m["n"].to_numpy(np.int64)})

    return (lineitem.select_columns(["l_partkey", "l_suppkey",
                                     "l_quantity", "l_extendedprice"])
            .map_batches(partial, batch_format="pandas",
                         batch_size=65536)
            .groupby("part").map_groups(fold, batch_format="pandas"))


# ---- TPC-H Q8 analogue: national market share within a region ----

SHARE_REGION = "ASIA"
SHARE_NATION_KEY = 2           # NATION_2 (an ASIA nation)
MARKET_SHARE_FP = 10 ** 6


def nation_market_share(orders: ray.data.Dataset,
                        lineitem: ray.data.Dataset,
                        customer: pd.DataFrame,
                        nation: pd.DataFrame,
                        supplier: pd.DataFrame,
                        region: pd.DataFrame) -> pd.DataFrame:
    """(year, target_rev_e4, total_rev_e4, share_fp): of all revenue
    sold to customers in ``SHARE_REGION``, the share supplied by
    suppliers of nation ``SHARE_NATION_KEY``, per order-year — the
    TPC-H Q8 market-share shape (two dimension chains onto one fact
    join, ratio per group).

    Scale shape: region→nation→customer and supplier→nation are
    broadcast probes inside the tag stages; orders (filtered to the
    region's customers) and lineitem co-partition ONCE by orderkey;
    each partition folds to ≤ years (rev_target, rev_total) partials;
    the ≤ years × P partial rows reduce driver-side and the share is
    ONE division mirrored in SQL."""
    rk = region.loc[region["r_name"] == SHARE_REGION,
                    "r_regionkey"].iloc[0]
    nat_in_region = np.sort(nation.loc[nation["n_regionkey"] == rk,
                                       "n_nationkey"].to_numpy(np.int64))
    cs = customer.sort_values("c_custkey")
    ck = cs["c_custkey"].to_numpy(np.int64)
    cnat = cs["c_nationkey"].to_numpy(np.int64)
    in_region = np.isin(cnat, nat_in_region)
    region_custkeys = ck[in_region]
    ss = supplier.sort_values("s_suppkey")
    sk = ss["s_suppkey"].to_numpy(np.int64)
    snat = ss["s_nationkey"].to_numpy(np.int64)
    ref = ray.put((region_custkeys, sk, snat))

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        rck, *_ = ray.get(ref)
        c = df["o_custkey"].to_numpy(np.int64)
        pos = np.searchsorted(rck, c)
        pos[pos == len(rck)] = 0
        keep = rck[pos] == c if len(rck) else np.zeros(len(c), bool)
        df = df[keep]
        k = df["o_orderkey"].to_numpy(np.int64)
        yr = pd.DatetimeIndex(df["o_orderdate"]).year.to_numpy() \
            .astype(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(df), dtype=np.int8),
            "a": yr, "v": np.zeros(len(df), dtype=np.int64)})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        _, sk_, snat_ = ray.get(ref)
        k = df["l_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(sk_, df["l_suppkey"].to_numpy(np.int64))
        is_target = snat_[pos] == SHARE_NATION_KEY
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(df), dtype=np.int8),
            "a": is_target.astype(np.int64),
            "v": p * (100 - d)})

    def join_fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        m = l.merge(o[["k", "a"]].rename(columns={"a": "yr"}),
                    on="k", how="inner")
        tgt = m["v"].to_numpy(np.int64) * m["a"].to_numpy(np.int64)
        agg = pd.DataFrame({"yr": m["yr"].to_numpy(np.int64),
                            "t": tgt,
                            "v": m["v"].to_numpy(np.int64)}) \
            .groupby("yr", as_index=False).sum()
        return pd.DataFrame({
            "year": agg["yr"].to_numpy(np.int64),
            "t": agg["t"].to_numpy(np.int64),
            "v": agg["v"].to_numpy(np.int64)})

    tagged = (orders.select_columns(["o_orderkey", "o_custkey",
                                     "o_orderdate"])
              .map_batches(tag_orders, batch_format="pandas",
                           batch_size=65536)
              .union(lineitem.select_columns(
                  ["l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount"])
                  .map_batches(tag_lines, batch_format="pandas",
                               batch_size=65536)))
    parts = (tagged.groupby("part").map_groups(join_fold,
                                               batch_format="pandas")
             .to_pandas())                    # ≤ years × P rows
    out = parts.groupby("year", sort=True, as_index=False).sum()
    t = out["t"].to_numpy(np.int64)
    v = out["v"].to_numpy(np.int64)
    return pd.DataFrame({
        "year": out["year"].to_numpy(np.int64),
        "target_rev_e4": t, "total_rev_e4": v,
        "share_fp": np.int64(MARKET_SHARE_FP) * t // np.maximum(v, 1)})


# ---- cumulative distinct count (first-occurrence cumsum) ----

def cumulative_unique_customers(orders: ray.data.Dataset) -> pd.DataFrame:
    """(day, n_new, cum_customers): running count of distinct customers
    ever seen, per order-day — the audience-growth curve. A naive
    windowed COUNT(DISTINCT) rescans history per day; the exact
    streaming shape is: each customer contributes on their FIRST order
    day only, then one ordered cumsum over the ≤ #days series.

    Scale shape: per-batch (custkey → min day) combiner partials; ONE
    custkey co-partition completes each customer's global first day;
    per-day counts are ≤ #days rows reduced driver-side where the
    cumsum is a single vectorized pass."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        t = pd.DataFrame({"k": df["o_custkey"].to_numpy(np.int64),
                          "d": d})
        agg = t.groupby("k", as_index=False)["d"].min()
        agg["part"] = (agg["k"].to_numpy(np.int64)
                       % N_JOIN_PARTS).astype(np.int32)
        return agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("k", sort=False)["d"].min()
        c = pd.DataFrame({"d": first.to_numpy(np.int64)}) \
            .groupby("d", as_index=False).size()
        return pd.DataFrame({"d": c["d"].to_numpy(np.int64),
                             "n": c["size"].to_numpy(np.int64)})

    parts = (orders.select_columns(["o_custkey", "o_orderdate"])
             .map_batches(partial, batch_format="pandas",
                          batch_size=65536)
             .groupby("part").map_groups(fold, batch_format="pandas")
             .to_pandas())                     # ≤ days × P rows
    day = parts.groupby("d", as_index=False)["n"].sum() \
        .sort_values("d").reset_index(drop=True)
    n = day["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "day": day["d"].to_numpy(np.int64).astype("datetime64[D]")
        .astype("datetime64[us]"),
        "n_new": n,
        "cum_customers": np.cumsum(n)})


def _member_mask(sorted_keys: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``k`` in a sorted broadcast key array;
    always returns a boolean ndarray (empty key set → all-False)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(k), dtype=bool)
    pos = np.searchsorted(sorted_keys, k)
    pos[pos == len(sorted_keys)] = 0
    return sorted_keys[pos] == k


# ---- TPC-H Q6 shape: predicate-pushdown scalar aggregate ----

Q6_LO = np.datetime64("1996-01-01", "us")
Q6_HI = np.datetime64("1997-01-01", "us")


def forecast_revenue(lineitem: ray.data.Dataset) -> pd.DataFrame:
    """TPC-H Q6 analogue: one-row forecast-revenue-change scalar —
    sum(l_extendedprice * l_discount) over a ship-year with discount in
    [0.05, 0.07] and quantity < 24.

    Scale shape: pure streaming filter + per-batch partial (each batch
    collapses to ONE partial row) → scalar ``Sum``; nothing shuffles but
    #batches 2-column rows. Column-pruned read; revenue carried as int64
    1e-4 units (cents × discount-cents) so the sum is order-independent
    and bit-exact vs the SQL mirror."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy()
        d = _cents(df["l_discount"])
        ok = ((sd >= Q6_LO) & (sd < Q6_HI) & (d >= 5) & (d <= 7)
              & (df["l_quantity"].to_numpy(np.float64) < 24.0))
        p = _cents(df["l_extendedprice"][ok])
        return pd.DataFrame({"rev_e4": [int((p * d[ok]).sum())],
                             "n_lines": [int(ok.sum())]})

    agg = (lineitem.select_columns(
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
           .map_batches(partial, batch_format="pandas")
           .aggregate(Sum("rev_e4", alias_name="rev_e4"),
                      Sum("n_lines", alias_name="n_lines")))
    return pd.DataFrame({"revenue": [int(agg["rev_e4"]) / 10000.0],
                         "n_lines": [int(agg["n_lines"])]})


# ---- TPC-H Q9 shape: product-type profit by nation and year ----

Q9_NAME_SUFFIX = "rod"


def nation_year_profit(lineitem: ray.data.Dataset,
                       part: pd.DataFrame,
                       supplier: pd.DataFrame,
                       nation: pd.DataFrame) -> ray.data.Dataset:
    """TPC-H Q9 analogue (the tables carry no partsupp, so profit =
    discounted revenue): per (supplier-nation, ship-year) profit over
    lineitems whose part name ends with ``rod``.

    Scale shape: part membership (sorted key array) and supplier→nation
    name are DIMENSION broadcasts (``ray.put`` once, searchsorted probe
    per batch); the fact table never shuffles — each batch folds to
    ≤ nations × years partial rows before one tiny hash groupby.
    Exactness: profit carried as int64 1e-4 units."""
    pk = np.sort(part.loc[part["p_name"].str.endswith(Q9_NAME_SUFFIX),
                          "p_partkey"].to_numpy(np.int64))
    sn = supplier.sort_values("s_suppkey")
    sk = sn["s_suppkey"].to_numpy(np.int64)
    snat = sn["s_nationkey"].to_numpy(np.int64)
    nn = nation.sort_values("n_nationkey")
    nname = nn["n_name"].to_numpy(dtype=object)
    nk = nn["n_nationkey"].to_numpy(np.int64)
    ref = ray.put((pk, sk, snat, nk, nname))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk_, sk_, snat_, nk_, nname_ = ray.get(ref)
        k = df["l_partkey"].to_numpy(np.int64)
        ok = _member_mask(pk_, k)
        if not np.any(ok):
            return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                                 "year": pd.Series([], dtype=np.int64),
                                 "profit_e4": pd.Series([], dtype=np.int64),
                                 "n_lines": pd.Series([], dtype=np.int64)})
        df = df[ok]
        spos = np.searchsorted(sk_, df["l_suppkey"].to_numpy(np.int64))
        npos = np.searchsorted(nk_, snat_[spos])
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        yr = pd.DatetimeIndex(df["l_shipdate"]).year.to_numpy() \
            .astype(np.int64)
        g = pd.DataFrame({"n_name": nname_[npos], "year": yr,
                          "profit_e4": p * (100 - d),
                          "n_lines": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["n_name", "year"], sort=False, as_index=False) \
            .sum()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": df["n_name"],
            "year": df["year"].astype(np.int64),
            "profit": df["profit_e4"].to_numpy(np.int64) / 10000.0,
            "n_lines": df["n_lines"].astype(np.int64)})

    return (lineitem.select_columns(
                ["l_partkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])
            .map_batches(partial, batch_format="pandas")
            .groupby(["n_name", "year"])
            .aggregate(Sum("profit_e4", alias_name="profit_e4"),
                       Sum("n_lines", alias_name="n_lines"))
            .map_batches(finish, batch_format="pandas"))


# ---- TPC-H Q16 shape: supplier count per part attribute group ----

Q16_EXCLUDE_BRAND = "Brand#13"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def parts_supplier_count(lineitem: ray.data.Dataset,
                         part: pd.DataFrame) -> pd.DataFrame:
    """TPC-H Q16 analogue (supplier relationships observed from the fact
    table instead of partsupp): distinct supplier count per
    (p_brand, p_type, p_size) for a size shortlist, excluding one brand.

    Scale shape: partkey → attribute-GROUP id (brand, type, size
    factorized driver-side over the small dimension) rides the
    broadcast, so the distinct unit is exactly Q16's (group, supplier):
    per-batch (gid, suppkey) dedup (the combiner) → ONE co-partition
    shuffle on hash(gid, suppkey) % P with local dedup inside each
    partition → ≤ |groups| × P counting partials → bounded driver fold.
    The fact rows themselves never shuffle."""
    keep = part[(part["p_brand"] != Q16_EXCLUDE_BRAND)
                & part["p_size"].isin(Q16_SIZES)].sort_values("p_partkey")
    pk = keep["p_partkey"].to_numpy(np.int64)
    grp = keep[["p_brand", "p_type", "p_size"]].drop_duplicates() \
        .sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)
    grp["g"] = np.arange(len(grp), dtype=np.int64)
    gid = keep.merge(grp, on=["p_brand", "p_type", "p_size"],
                     how="left")["g"].to_numpy(np.int64)
    battr = grp["p_brand"].to_numpy(dtype=object)
    tattr = grp["p_type"].to_numpy(dtype=object)
    sattr = grp["p_size"].to_numpy(np.int64)
    ref = ray.put((pk, gid, battr, tattr, sattr))

    def dedup_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk_, gid_, *_ = ray.get(ref)
        k = df["l_partkey"].to_numpy(np.int64)
        ok = _member_mask(pk_, k)
        pos = np.searchsorted(pk_, k[ok])
        t = pd.DataFrame({"g": gid_[pos],
                          "sk": df["l_suppkey"].to_numpy(np.int64)[ok]}) \
            .drop_duplicates()
        t["part"] = ((t["g"].to_numpy(np.int64) * 1000003
                      + t["sk"].to_numpy(np.int64))
                     % N_JOIN_PARTS).astype(np.int32)
        return t

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g[["g", "sk"]].drop_duplicates()
        c = u.groupby("g", sort=False, as_index=False).size()
        return pd.DataFrame({"g": c["g"].to_numpy(np.int64),
                             "n": c["size"].to_numpy(np.int64)})

    # the per-partition counting partials are ≤ |groups| × P rows — fold
    # them driver-side (sidecar-aggregate pattern) instead of paying a
    # second all-to-all barrier for a bounded-size Sum
    parts = (lineitem.select_columns(["l_partkey", "l_suppkey"])
             .map_batches(dedup_partial, batch_format="pandas")
             .groupby("part").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("g", as_index=False)["n"].sum()
    g = agg["g"].to_numpy(np.int64)
    return pd.DataFrame({"p_brand": battr[g], "p_type": tattr[g],
                         "p_size": sattr[g],
                         "supplier_cnt": agg["n"].astype(np.int64)})


# ---- TPC-H Q19 shape: disjunctive multi-predicate revenue ----

Q19_CASES = (("Brand#1", 1, 11, 1, 5),
             ("Brand#2", 10, 20, 1, 10),
             ("Brand#3", 20, 30, 1, 15))


def disjunctive_revenue(lineitem: ray.data.Dataset,
                        part: pd.DataFrame) -> pd.DataFrame:
    """TPC-H Q19 analogue: one-row discounted revenue over the UNION of
    three (brand, quantity-band, size-band) predicates — the disjunctive
    pushdown shape.

    Scale shape: part (brand, size) attributes broadcast once as sorted
    arrays; each batch probes + evaluates all three predicate branches
    vectorized and collapses to one partial row → scalar ``Sum``."""
    ps = part.sort_values("p_partkey")
    pk = ps["p_partkey"].to_numpy(np.int64)
    pb = ps["p_brand"].to_numpy(dtype=object)
    psz = ps["p_size"].to_numpy(np.int64)
    ref = ray.put((pk, pb, psz))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk_, pb_, psz_ = ray.get(ref)
        lpk = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk_, lpk)
        pos[pos == len(pk_)] = 0
        # membership mask: an l_partkey absent from part must drop out
        # (inner-join semantics), not inherit a neighboring part's
        # brand/size via the clamped searchsorted probe
        known = pk_[pos] == lpk
        brand = pb_[pos]
        size = psz_[pos]
        q = df["l_quantity"].to_numpy(np.float64)
        hit = np.zeros(len(df), dtype=bool)
        for b, qlo, qhi, slo, shi in Q19_CASES:
            hit |= ((brand == b) & (q >= qlo) & (q <= qhi)
                    & (size >= slo) & (size <= shi))
        hit &= known
        p = _cents(df["l_extendedprice"][hit])
        d = _cents(df["l_discount"][hit])
        return pd.DataFrame({"rev_e4": [int((p * (100 - d)).sum())],
                             "n_lines": [int(hit.sum())]})

    agg = (lineitem.select_columns(
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
           .map_batches(partial, batch_format="pandas")
           .aggregate(Sum("rev_e4", alias_name="rev_e4"),
                      Sum("n_lines", alias_name="n_lines")))
    return pd.DataFrame({"revenue": [int(agg["rev_e4"]) / 10000.0],
                         "n_lines": [int(agg["n_lines"])]})


# ---- TPC-H Q20 shape: quantity-threshold supplier semi-join ----

Q20_NAME_SUFFIX = "widget"
Q20_QTY_FACTOR = 0.5


def top_shippers(lineitem: ray.data.Dataset,
                 part: pd.DataFrame,
                 supplier: pd.DataFrame) -> pd.DataFrame:
    """TPC-H Q20 analogue: suppliers whose shipped quantity of
    ``*widget`` parts exceeds half the global average per-supplier
    shipped quantity of those parts — the "who can promise excess
    stock" semi-join, with the availability threshold derived from the
    fact table itself (the tables carry no partsupp).

    Scale shape: part membership broadcast; per-batch partial groupby by
    l_suppkey (≤ |suppliers| rows per batch) → ONE tiny hash groupby →
    driver-side threshold over ≤ |suppliers| rows, supplier names
    attached from the already-small dimension frame."""
    pk = np.sort(part.loc[part["p_name"].str.endswith(Q20_NAME_SUFFIX),
                          "p_partkey"].to_numpy(np.int64))
    ref = ray.put(pk)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk_ = ray.get(ref)
        k = df["l_partkey"].to_numpy(np.int64)
        ok = _member_mask(pk_, k)
        g = pd.DataFrame({"s_suppkey": df["l_suppkey"].to_numpy(np.int64)[ok],
                          "qty_c": _cents(df["l_quantity"][ok])})
        return g.groupby("s_suppkey", sort=False, as_index=False).sum()

    per_supp = (lineitem.select_columns(
                    ["l_partkey", "l_suppkey", "l_quantity"])
                .map_batches(partial, batch_format="pandas")
                .groupby("s_suppkey")
                .aggregate(Sum("qty_c", alias_name="qty_c"))
                .to_pandas())                  # ≤ |suppliers| rows
    if not len(per_supp):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "total_qty": pd.Series([], dtype=np.float64)})
    q = per_supp["qty_c"].to_numpy(np.int64)
    # threshold: half the mean, in exact integer arithmetic —
    # 2·n·qty_c > sum(qty_c) avoids any float division on the gate
    n = len(per_supp)
    tot = int(q.sum())
    keep = (2 * n * q) > tot
    out = per_supp[keep].copy()
    sn = supplier.set_index("s_suppkey")["s_name"]
    out["s_name"] = sn.reindex(out["s_suppkey"].to_numpy(np.int64)) \
        .to_numpy(dtype=object)
    out["total_qty"] = out.pop("qty_c").to_numpy(np.int64) / 100.0
    return out.sort_values("s_suppkey").reset_index(drop=True) \
        [["s_suppkey", "s_name", "total_qty"]]


# ---- TPC-H Q15 shape: top supplier by windowed revenue ----

Q15_LO = np.datetime64("1996-01-01", "us")
Q15_HI = np.datetime64("1996-04-01", "us")


def top_supplier_revenue(lineitem: ray.data.Dataset,
                         supplier: pd.DataFrame) -> pd.DataFrame:
    """TPC-H Q15 analogue: the supplier(s) achieving the maximum
    discounted revenue over one ship-quarter — (s_suppkey, s_name,
    total_revenue), ALL ties kept (the view + max subquery semantics).

    Scale shape: per-batch per-suppkey revenue combiner (≤ |suppliers|
    rows per batch) → ONE tiny Sum groupby → driver max + tie filter
    over ≤ |suppliers| rows; revenue exact int64 1e-4 units so the max
    comparison is integral (no float ties)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy()
        ok = (sd >= Q15_LO) & (sd < Q15_HI)
        df = df[ok]
        p = _cents(df["l_extendedprice"])
        d = _cents(df["l_discount"])
        g = pd.DataFrame({"s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                          "rev_e4": p * (100 - d)})
        return g.groupby("s_suppkey", sort=False, as_index=False).sum()

    per = (lineitem.select_columns(
               ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
           .map_batches(partial, batch_format="pandas")
           .groupby("s_suppkey")
           .aggregate(Sum("rev_e4", alias_name="rev_e4"))
           .to_pandas())
    if not len(per):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue": pd.Series([], dtype=np.float64)})
    r = per["rev_e4"].to_numpy(np.int64)
    top = per[r == int(r.max())].copy()
    sn = supplier.set_index("s_suppkey")["s_name"]
    top["s_name"] = sn.reindex(top["s_suppkey"].to_numpy(np.int64)) \
        .to_numpy(dtype=object)
    top["total_revenue"] = top.pop("rev_e4").to_numpy(np.int64) / 10000.0
    return top.sort_values("s_suppkey").reset_index(drop=True) \
        [["s_suppkey", "s_name", "total_revenue"]]


# ---- TPC-H Q5 shape: local (intra-nation) supplier volume ----

Q5_LO = np.datetime64("1996-01-01", "us")
Q5_HI = np.datetime64("1997-01-01", "us")
Q5_REGION = "ASIA"


def local_supplier_volume(orders: ray.data.Dataset,
                          lineitem: ray.data.Dataset,
                          customer: pd.DataFrame,
                          supplier: pd.DataFrame,
                          nation: pd.DataFrame,
                          region: pd.DataFrame) -> ray.data.Dataset:
    """(n_name, revenue_e4, n_lines): revenue where the customer and the
    line's supplier sit in the SAME nation of one region, over one
    order-year — the TPC-H Q5 "local supplier volume" six-table shape
    (region/nation/customer/supplier are dimension lookups; the
    orders×lineitem big×big join carries the filter).

    Scale shape: region→nations, custkey→nationkey and suppkey→nationkey
    broadcast once via ``ray.put`` (sorted key arrays, searchsorted
    probes); both fact streams pre-filter to in-region rows BEFORE the
    ONE orderkey co-partition shuffle (orders also date-pruned at the
    tag), each partition folds to ≤ |nations| partials, and the final
    hash groupby touches only those. Revenue exact int64 1e-4 units."""
    rk = region.loc[region["r_name"] == Q5_REGION, "r_regionkey"] \
        .to_numpy(np.int64)
    nat = nation[nation["n_regionkey"].isin(rk)].sort_values("n_nationkey")
    nk = nat["n_nationkey"].to_numpy(np.int64)
    nname = nat["n_name"].to_numpy(dtype=object)
    cs = customer.sort_values("c_custkey")
    ck = cs["c_custkey"].to_numpy(np.int64)
    cnat = cs["c_nationkey"].to_numpy(np.int64)
    ss = supplier.sort_values("s_suppkey")
    sk = ss["s_suppkey"].to_numpy(np.int64)
    snat = ss["s_nationkey"].to_numpy(np.int64)
    ref = ray.put((ck, cnat, sk, snat, nk))

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        ck_, cnat_, _, _, nk_ = ray.get(ref)
        d = df["o_orderdate"].to_numpy()
        df = df[(d >= Q5_LO) & (d < Q5_HI)]
        k = df["o_orderkey"].to_numpy(np.int64)
        cu = df["o_custkey"].to_numpy(np.int64)
        known = _member_mask(ck_, cu)
        cn = cnat_[np.minimum(np.searchsorted(ck_, cu),
                              max(len(ck_) - 1, 0))] if len(ck_) else \
            np.zeros(len(cu), np.int64)
        keep = known & _member_mask(nk_, cn)
        k, cn = k[keep], cn[keep]
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(k), dtype=np.int8),
            "nat": cn, "v": np.zeros(len(k), dtype=np.int64)})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        _, _, sk_, snat_, nk_ = ray.get(ref)
        k = df["l_orderkey"].to_numpy(np.int64)
        su = df["l_suppkey"].to_numpy(np.int64)
        known = _member_mask(sk_, su)
        sn = snat_[np.minimum(np.searchsorted(sk_, su),
                              max(len(sk_) - 1, 0))] if len(sk_) else \
            np.zeros(len(su), np.int64)
        keep = known & _member_mask(nk_, sn)
        p = _cents(df["l_extendedprice"][keep])
        d = _cents(df["l_discount"][keep])
        k, sn = k[keep], sn[keep]
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "nat": sn, "v": p * (100 - d)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        m = l.merge(o[["k", "nat"]].rename(columns={"nat": "cn"}),
                    on="k", how="inner")
        m = m[m["cn"].to_numpy(np.int64) == m["nat"].to_numpy(np.int64)]
        agg = m.groupby("nat", sort=False).agg(
            revenue_e4=("v", "sum"), n_lines=("v", "size")).reset_index()
        return pd.DataFrame({
            "nat": agg["nat"].to_numpy(np.int64),
            "revenue_e4": agg["revenue_e4"].to_numpy(np.int64),
            "n_lines": agg["n_lines"].to_numpy(np.int64)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pos = np.searchsorted(nk, df["nat"].to_numpy(np.int64))
        return pd.DataFrame({
            "n_name": nname[pos],
            "revenue_e4": df["revenue_e4"].to_numpy(np.int64),
            "n_lines": df["n_lines"].to_numpy(np.int64)})

    tagged = (orders.select_columns(
                  ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(tag_orders, batch_format="pandas",
                           batch_size=65536)
              .union(lineitem.select_columns(
                  ["l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount"])
                  .map_batches(tag_lines, batch_format="pandas",
                               batch_size=65536)))
    return (tagged.groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("nat")
            .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                       Sum("n_lines", alias_name="n_lines"))
            .map_batches(finish, batch_format="pandas"))


# ---- TPC-H Q12 shape: shipping-delay bands x order priority ----

DELAY_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")
_DELAY_BAND_EDGES = (0, 30, 90)          # days, band = [edge_i, edge_i+1)
_DELAY_BAND_NAMES = ("early", "0-29", "30-89", "90+")


def shipping_delay_profile(orders: ray.data.Dataset,
                           lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(delay_band, high_line_count, low_line_count, n_lines): lineitem
    counts per ship-delay band (days from o_orderdate to l_shipdate;
    'early' = shipped before the order date, which the synthetic tables
    do contain), split into high-priority (1-URGENT/2-HIGH) vs other
    orders — the TPC-H Q12 shipmode/priority CASE-count shape, with the
    delay band standing in for l_shipmode (the tables carry none).

    Scale shape: both sides slim-tag (key, one int64 timestamp, one
    int8 flag) and co-partition ONCE by orderkey; each partition folds
    to ≤ |bands| partial rows via one vectorized date diff + select;
    the final hash groupby touches ≤ bands × P rows."""

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        hi = df["o_orderpriority"].isin(DELAY_HIGH_PRIORITIES) \
            .to_numpy().astype(np.int8)
        od = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(k), dtype=np.int8), "hi": hi, "t": od})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(np.int64)
        sd = df["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "hi": np.zeros(len(k), dtype=np.int8), "t": sd})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        m = l[["k", "t"]].merge(
            o[["k", "hi", "t"]].rename(columns={"t": "od"}),
            on="k", how="inner")
        delay = (m["t"].to_numpy(np.int64)
                 - m["od"].to_numpy(np.int64)) // _DAY_US
        band = np.select(
            [delay < _DELAY_BAND_EDGES[0], delay < _DELAY_BAND_EDGES[1],
             delay < _DELAY_BAND_EDGES[2]],
            _DELAY_BAND_NAMES[:3], default=_DELAY_BAND_NAMES[3])
        hi = m["hi"].to_numpy(np.int8).astype(np.int64)
        agg = pd.DataFrame({"delay_band": band, "hi": hi,
                            "n": np.ones(len(m), dtype=np.int64)}) \
            .groupby("delay_band", sort=False).sum().reset_index()
        return pd.DataFrame({
            "delay_band": agg["delay_band"].to_numpy(dtype=object),
            "high_line_count": agg["hi"].to_numpy(np.int64),
            "low_line_count": (agg["n"] - agg["hi"]).to_numpy(np.int64),
            "n_lines": agg["n"].to_numpy(np.int64)})

    tagged = (orders.select_columns(
                  ["o_orderkey", "o_orderpriority", "o_orderdate"])
              .map_batches(tag_orders, batch_format="pandas",
                           batch_size=65536)
              .union(lineitem.select_columns(["l_orderkey", "l_shipdate"])
                     .map_batches(tag_lines, batch_format="pandas",
                                  batch_size=65536)))
    return (tagged.groupby("part").map_groups(fold, batch_format="pandas")
            .groupby("delay_band")
            .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count"),
                       Sum("n_lines", alias_name="n_lines")))


# ---- TPC-H Q21 shape: sole-late supplier on multi-supplier orders ----

WAIT_LATE_DAYS = 90


def waiting_suppliers(orders: ray.data.Dataset,
                      lineitem: ray.data.Dataset,
                      supplier: pd.DataFrame) -> pd.DataFrame:
    """(s_suppkey, s_name, numwait): for FINISHED orders (o_orderstatus
    'F') involving at least two distinct suppliers, counts per supplier
    the orders where that supplier was the ONLY one shipping late
    (l_shipdate > o_orderdate + WAIT_LATE_DAYS days) — the TPC-H Q21
    "suppliers who kept orders waiting" EXISTS + NOT-EXISTS correlated
    shape, with ship-date lag standing in for the receipt/commit delta
    (the tables carry neither).

    Scale shape: the status filter rides the orders tag (slim (key,
    orderdate) rows), lineitem tags (key, suppkey, shipdate); ONE
    orderkey co-partition makes every per-order existence test
    partition-local (an order's lines co-locate), folded vectorized to
    per-supplier partial counts; the final groupby and name attach
    touch ≤ |suppliers| rows."""

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderstatus"] == "F"]
        k = df["o_orderkey"].to_numpy(np.int64)
        od = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(k), dtype=np.int8),
            "s": np.zeros(len(k), dtype=np.int64), "t": od})

    def tag_lines(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(np.int64)
        sd = df["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8),
            "s": df["l_suppkey"].to_numpy(np.int64), "t": sd})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        m = l[["k", "s", "t"]].merge(
            o[["k", "t"]].rename(columns={"t": "od"}), on="k", how="inner")
        late = m["t"].to_numpy(np.int64) > (
            m["od"].to_numpy(np.int64) + WAIT_LATE_DAYS * _DAY_US)
        ks = m[["k", "s"]].drop_duplicates()
        n_supp = ks.groupby("k", sort=False).size()
        kl = m.loc[late, ["k", "s"]].drop_duplicates()
        n_late = kl.groupby("k", sort=False).size()
        late_s = kl.groupby("k", sort=False)["s"].max()
        sel = late_s.index[(n_late.reindex(late_s.index) == 1)
                           & (n_supp.reindex(late_s.index) >= 2)]
        cnt = late_s.loc[sel].value_counts()
        return pd.DataFrame({
            "s_suppkey": cnt.index.to_numpy(np.int64),
            "numwait": cnt.to_numpy(np.int64)})

    per = (orders.select_columns(
               ["o_orderkey", "o_orderstatus", "o_orderdate"])
           .map_batches(tag_orders, batch_format="pandas",
                        batch_size=65536)
           .union(lineitem.select_columns(
               ["l_orderkey", "l_suppkey", "l_shipdate"])
               .map_batches(tag_lines, batch_format="pandas",
                            batch_size=65536))
           .groupby("part").map_groups(fold, batch_format="pandas")
           .groupby("s_suppkey")
           .aggregate(Sum("numwait", alias_name="numwait"))
           .to_pandas())                     # <= |suppliers| rows
    if not len(per):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "numwait": pd.Series([], dtype=np.int64)})
    sn = supplier.set_index("s_suppkey")["s_name"]
    per = per.copy()
    per["s_name"] = sn.reindex(per["s_suppkey"].to_numpy(np.int64)) \
        .to_numpy(dtype=object)
    per["numwait"] = per["numwait"].astype(np.int64)
    return per.sort_values("s_suppkey").reset_index(drop=True) \
        [["s_suppkey", "s_name", "numwait"]]


# ---- cross-table referential-integrity audit ----

def fk_integrity_audit(lineitem: ray.data.Dataset,
                       orders: ray.data.Dataset,
                       customer: pd.DataFrame,
                       supplier: pd.DataFrame,
                       part: pd.DataFrame) -> pd.DataFrame:
    """(constraint, n_child_rows, n_orphans): foreign-key audit across
    the fact tables — lineitem→orders / supplier / part and
    orders→customer — the cross-table companion of the row-local
    ``ops/corpus.data_quality_audit`` (Deequ's referential constraint
    check). Non-zero orphans on ingest = a broken upstream export.

    Scale shape: small dimensions (customer/supplier/part) broadcast
    once as sorted key arrays and probed per batch (counts fold to one
    partial row per batch); the big×big lineitem→orders check rides
    ONE orderkey co-partition (slim tagged keys only). All counts
    int64-exact."""
    from ray.data.aggregate import Sum

    ck = np.sort(customer["c_custkey"].to_numpy(np.int64))
    sk = np.sort(supplier["s_suppkey"].to_numpy(np.int64))
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))
    ref = ray.put((ck, sk, pk))

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, sk_, pk_ = ray.get(ref)
        su = df["l_suppkey"].to_numpy(np.int64)
        pa_ = df["l_partkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [len(df)],
            "supp_orph": [int((~_member_mask(sk_, su)).sum())],
            "part_orph": [int((~_member_mask(pk_, pa_)).sum())]})

    li = (lineitem.select_columns(["l_suppkey", "l_partkey"])
          .map_batches(li_partial, batch_format="pandas",
                       batch_size=65536)
          .aggregate(Sum("n", alias_name="n"),
                     Sum("supp_orph", alias_name="supp_orph"),
                     Sum("part_orph", alias_name="part_orph")))

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        ck_, _, _ = ray.get(ref)
        cu = df["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [len(df)],
            "cust_orph": [int((~_member_mask(ck_, cu)).sum())]})

    od = (orders.select_columns(["o_custkey"])
          .map_batches(o_partial, batch_format="pandas",
                       batch_size=65536)
          .aggregate(Sum("n", alias_name="n"),
                     Sum("cust_orph", alias_name="cust_orph")))

    # big x big: lineitem.l_orderkey ∖ orders.o_orderkey (co-partition)
    def tag_l(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.zeros(len(k), dtype=np.int8)})

    def tag_o(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "part": (k % N_JOIN_PARTS).astype(np.int32),
            "side": np.ones(len(k), dtype=np.int8)})

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        li_k = g.loc[g["side"] == 0, "k"].to_numpy(np.int64)
        ok = np.sort(g.loc[g["side"] == 1, "k"].unique())
        return pd.DataFrame({
            "orph": [int((~_member_mask(ok, li_k)).sum())]})

    ord_orph = (lineitem.select_columns(["l_orderkey"])
                .map_batches(tag_l, batch_format="pandas",
                             batch_size=65536)
                .union(orders.select_columns(["o_orderkey"])
                       .map_batches(tag_o, batch_format="pandas",
                                    batch_size=65536))
                .groupby("part").map_groups(
                    lambda g: anti(g.drop(columns=["part"])),
                    batch_format="pandas")
                .aggregate(Sum("orph", alias_name="orph")))

    n_li = int(li["n"])
    n_o = int(od["n"])
    return pd.DataFrame({
        "constraint": ["lineitem.l_orderkey->orders",
                       "lineitem.l_suppkey->supplier",
                       "lineitem.l_partkey->part",
                       "orders.o_custkey->customer"],
        "n_child_rows": np.array([n_li, n_li, n_li, n_o], np.int64),
        "n_orphans": np.array([int(ord_orph["orph"]),
                               int(li["supp_orph"]),
                               int(li["part_orph"]),
                               int(od["cust_orph"])], np.int64)})
