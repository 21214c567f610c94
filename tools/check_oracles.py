#!/usr/bin/env python
"""Driver-faithful oracle sweep: run EVERY queries() pipeline AND its DuckDB
mirror at the given sf dir (default sf0.01 — the driver's comparison scale),
compare value-exact after canonicalization. Round 3: 246/246 OK at sf0.01.

    PYTHONPATH=. python tools/check_oracles.py [/root/testdata/sf0.01]
"""
import json, time, traceback
import duckdb, numpy as np, pandas as pd
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
import ray.data
import __ray_entry__ as E

import sys
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ("documents","embeddings","events","lineitem","orders","customer",
          "supplier","part","nation","region"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

def to_pd(res):
    if isinstance(res, ray.data.Dataset): return res.to_pandas()
    if isinstance(res, pd.DataFrame): return res
    return res.to_pandas()

def canon(df):
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu": df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "M": df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].fillna("").astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

import re as _re
_sf = float(_re.search(r"sf([0-9.]+)", SF_DIR).group(1))
qs = E.queries()
# scale-matched mirrors: the crawl-family SQL embeds the synthesized-web
# paths for ONE sf; oracle_sql() hardcodes the driver's 0.01
sqls = dict(E._ops_sql()); sqls.update(E._crawl_sql(_sf))
bad, ok = [], 0
for name in qs:
    if name not in sqls: continue
    try:
        got = canon(to_pd(qs[name](SF_DIR)))
        want = canon(con.execute(sqls[name]).df())
        assert list(got.columns) == list(want.columns), f"cols {list(got.columns)} vs {list(want.columns)}"
        assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)
        ok += 1
    except Exception as e:
        bad.append((name, str(e).split("\n")[0][:200]))
        print("FAIL", name, str(e).split(chr(10))[0][:200], flush=True)
print(json.dumps({"ok": ok, "fail": [b[0] for b in bad]}))
ray.shutdown()
