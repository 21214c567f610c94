"""Unit tests for the relational pipelines (ghcrawler_ray/ops/relational.py)
on tiny handcrafted tables: exact fixed-point sums, broadcast-join
inner-join semantics, co-partition join correctness across partitions.
The full value-vs-DuckDB gate runs in test_ops_oracle.py."""

import numpy as np
import pandas as pd
import ray.data

from ghcrawler_ray.ops.relational import (N_JOIN_PARTS, order_revenue_join,
                                          pricing_summary, segment_revenue)

TS = np.datetime64("1997-01-01", "us")
LATE = np.datetime64("1999-01-01", "us")   # past the cutoff → excluded


def test_pricing_summary_exact_and_filtered(ray_session):
    li = pd.DataFrame({
        "l_returnflag": ["A", "A", "N"],
        "l_linestatus": ["F", "F", "O"],
        "l_quantity": [10.0, 20.0, 5.0],
        "l_extendedprice": [100.10, 200.20, 50.0],
        "l_discount": [0.05, 0.10, 0.0],
        "l_tax": [0.02, 0.0, 0.08],
        "l_shipdate": [TS, TS, LATE],      # the N/O row is filtered out
    })
    out = pricing_summary(ray.data.from_pandas(li)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["l_returnflag"], r["l_linestatus"]) == ("A", "F")
    assert r["count_order"] == 2
    assert r["sum_qty"] == 30.0
    assert r["sum_base_price"] == 300.30
    # 100.10*0.95 + 200.20*0.90 = 95.095 + 180.18 (exact in 1e-4 units)
    assert r["sum_disc_price"] == 275.275
    assert r["sum_charge"] == 95.095 * 1.02 + 180.18
    # exact fixed-point: (5 + 10 cents) / 100 / 2 — NOT the float-literal
    # sum 0.05+0.10 which is 0.07500000000000001
    assert r["avg_disc"] == 0.075


def test_segment_revenue_broadcast_inner_join(ray_session):
    cust = pd.DataFrame({"c_custkey": [1, 2, 3],
                         "c_mktsegment": ["AUTO", "AUTO", "STEEL"]})
    orders = pd.DataFrame({
        "o_custkey": [1, 2, 2, 3, 99],     # 99 has no customer → dropped
        "o_totalprice": [10.0, 20.0, 30.0, 40.0, 1000.0]})
    out = segment_revenue(ray.data.from_pandas(orders), cust).to_pandas() \
        .set_index("c_mktsegment")
    assert out.loc["AUTO", "n_orders"] == 3
    assert out.loc["AUTO", "total_revenue"] == 60.0
    assert out.loc["AUTO", "avg_order_value"] == 20.0
    assert out.loc["STEEL", "n_orders"] == 1
    assert out["n_orders"].sum() == 4      # unmatched order excluded


def test_order_revenue_join_across_partitions(ray_session):
    # keys straddle partition boundaries (k and k + N_JOIN_PARTS collide
    # mod P but are distinct orders)
    k1, k2 = 7, 7 + N_JOIN_PARTS
    orders = pd.DataFrame({
        "o_orderkey": [k1, k2, 999],       # 999 has no lines → dropped
        "o_totalprice": [100.0, 200.0, 5.0]})
    li = pd.DataFrame({
        "l_orderkey": [k1, k1, k2],
        "l_extendedprice": [50.0, 30.0, 200.0],
        "l_discount": [0.10, 0.0, 0.25]})
    out = order_revenue_join(ray.data.from_pandas(orders),
                             ray.data.from_pandas(li)).to_pandas() \
        .set_index("o_orderkey")
    assert set(out.index) == {k1, k2}
    assert out.loc[k1, "n_lines"] == 2
    assert out.loc[k1, "gross_revenue"] == 45.0 + 30.0
    assert out.loc[k2, "gross_revenue"] == 150.0
    assert out.loc[k2, "o_totalprice"] == 200.0


def test_local_supplier_volume_q5_semantics(ray_session):
    from ghcrawler_ray.ops.relational import local_supplier_volume
    D = lambda s: np.datetime64(s, "us")
    region = pd.DataFrame({"r_regionkey": [0, 1],
                           "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame({"n_nationkey": [10, 11, 20],
                           "n_name": ["JAPAN", "INDIA", "FRANCE"],
                           "n_regionkey": [0, 0, 1]})
    cust = pd.DataFrame({"c_custkey": [1, 2, 3],
                         "c_nationkey": [10, 11, 20]})
    supp = pd.DataFrame({"s_suppkey": [5, 6, 7],
                         "s_nationkey": [10, 11, 20]})
    orders = pd.DataFrame({
        "o_orderkey": [100, 101, 102, 103],
        "o_custkey": [1, 2, 3, 1],
        "o_orderdate": [D("1996-06-01"), D("1996-06-01"),
                        D("1996-06-01"), D("1995-06-01")]})  # 103: off-year
    li = pd.DataFrame({
        "l_orderkey": [100, 100, 101, 102, 103],
        "l_suppkey": [5, 6, 6, 7, 5],
        "l_extendedprice": [100.0, 100.0, 50.0, 80.0, 999.0],
        "l_discount": [0.10, 0.0, 0.0, 0.0, 0.0]})
    # 100/5: JAPAN cust+supp same nation → 90.0 counts for JAPAN
    # 100/6: supplier INDIA ≠ cust JAPAN → dropped
    # 101/6: INDIA == INDIA → 50.0 for INDIA
    # 102/7: FRANCE but region EUROPE → dropped (region filter)
    # 103: order-year 1995 → dropped
    out = local_supplier_volume(
        ray.data.from_pandas(orders), ray.data.from_pandas(li),
        cust, supp, nation, region).to_pandas().set_index("n_name")
    assert set(out.index) == {"JAPAN", "INDIA"}
    assert out.loc["JAPAN", "revenue_e4"] == 100_00 * 90   # 90.00 in 1e-4
    assert out.loc["JAPAN", "n_lines"] == 1
    assert out.loc["INDIA", "revenue_e4"] == 50_00 * 100
    assert out.loc["INDIA", "n_lines"] == 1


def test_shipping_delay_profile_bands(ray_session):
    from ghcrawler_ray.ops.relational import shipping_delay_profile
    D = lambda s: np.datetime64(s, "us")
    orders = pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderpriority": ["1-URGENT", "5-LOW"],
        "o_orderdate": [D("1996-01-10"), D("1996-01-10")]})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 2],
        "l_shipdate": [D("1996-01-09"),   # -1d → early
                       D("1996-01-10"),   # 0d  → 0-29
                       D("1996-02-09"),   # 30d → 30-89
                       D("1996-04-09"),   # 90d → 90+
                       D("1996-02-08")]}) # 29d → 0-29
    out = shipping_delay_profile(
        ray.data.from_pandas(orders),
        ray.data.from_pandas(li)).to_pandas().set_index("delay_band")
    assert out.loc["early", "high_line_count"] == 1
    assert out.loc["early", "low_line_count"] == 0
    assert out.loc["0-29", "high_line_count"] == 1
    assert out.loc["0-29", "low_line_count"] == 1
    assert out.loc["30-89", "n_lines"] == 1
    assert out.loc["90+", "low_line_count"] == 1
    assert out["n_lines"].sum() == 5


def test_waiting_suppliers_sole_late_rule(ray_session):
    from ghcrawler_ray.ops.relational import waiting_suppliers
    D = lambda s: np.datetime64(s, "us")
    OD, LATE, OK = D("1996-01-01"), D("1996-06-01"), D("1996-02-01")
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderstatus": ["F", "F", "F", "O"],
        "o_orderdate": [OD] * 4})
    li = pd.DataFrame({
        # order 1: supp 10 late, supp 11 on time → 10 gets a wait fault
        # order 2: both 10 and 11 late → nobody (NOT-EXISTS fails)
        # order 3: single-supplier late → nobody (EXISTS fails)
        # order 4: status O → excluded even though sole-late
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
        "l_suppkey": [10, 11, 10, 11, 12, 10, 11],
        "l_shipdate": [LATE, OK, LATE, LATE, LATE, LATE, OK]})
    supp = pd.DataFrame({"s_suppkey": [10, 11, 12],
                         "s_name": ["S10", "S11", "S12"]})
    out = waiting_suppliers(ray.data.from_pandas(orders),
                            ray.data.from_pandas(li), supp)
    assert list(out["s_suppkey"]) == [10]
    assert list(out["s_name"]) == ["S10"]
    assert list(out["numwait"]) == [1]


def test_fk_integrity_audit_counts_orphans(ray_session):
    from ghcrawler_ray.ops.relational import fk_integrity_audit
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 99],       # 99 has no order header
        "l_suppkey": [10, 10, 77, 10],     # 77 unknown supplier
        "l_partkey": [5, 88, 5, 5]})       # 88 unknown part
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [7, 7, 555]})         # 555 unknown customer
    out = fk_integrity_audit(
        ray.data.from_pandas(li), ray.data.from_pandas(orders),
        pd.DataFrame({"c_custkey": [7]}),
        pd.DataFrame({"s_suppkey": [10]}),
        pd.DataFrame({"p_partkey": [5]})).set_index("constraint")
    assert out.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
    assert out.loc["lineitem.l_suppkey->supplier", "n_orphans"] == 1
    assert out.loc["lineitem.l_partkey->part", "n_orphans"] == 1
    assert out.loc["orders.o_custkey->customer", "n_orphans"] == 1
    assert (out["n_child_rows"] == [4, 4, 4, 3]).all()
