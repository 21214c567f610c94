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
