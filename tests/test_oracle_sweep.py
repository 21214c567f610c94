"""Rotating value-exact oracle sweep — driver-sample durability.

The round-harness samples ~50 of the ~250 catalog queries per round, and
the sample rotates: a query rotated OUT could regress invisibly between
rounds. This sweep pins a rotating 20-query subset value-exact against
the DuckDB mirrors at sf0.001 (fast; the full 246-query sweep lives in
``tools/check_oracles.py`` at the driver's sf0.01), seeded per ISO week
(override with ``GHCRAWLER_SWEEP_SEED``) so successive rounds cover
different slices while any single run is deterministic.
"""

import datetime
import os
import zlib

import duckdb
import pandas as pd
import ray.data

N_SWEEP = 20
SF = 0.001
SF_DIR = f"/root/testdata/sf{SF}"
TABLES = ("documents", "embeddings", "events", "lineitem", "orders",
          "customer", "supplier", "part", "nation", "region")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].fillna("").astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def _to_pd(res):
    return res.to_pandas() if not isinstance(res, pd.DataFrame) else res


def test_rotating_oracle_sweep(ray_session):
    import __ray_entry__ as E

    qs = E.queries()
    sqls = dict(E._ops_sql())
    sqls.update(E._crawl_sql(SF))
    eligible = sorted(n for n in qs if n in sqls)
    seed = os.environ.get("GHCRAWLER_SWEEP_SEED")
    if seed is None:
        iso = datetime.date.today().isocalendar()
        seed = f"{iso.year}w{iso.week}"
    # deterministic rotation: rank every eligible query by a seed-keyed
    # hash and take the first N — different seed, different slice
    eligible.sort(key=lambda n: zlib.crc32(f"{seed}:{n}".encode()))
    sweep = eligible[:N_SWEEP]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{SF_DIR}/{t}.parquet'")
    failures = []
    for name in sweep:
        try:
            got = _canon(_to_pd(qs[name](SF_DIR)))
            want = _canon(con.execute(sqls[name]).df())
            assert list(got.columns) == list(want.columns), \
                f"cols {list(got.columns)} vs {list(want.columns)}"
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          rtol=0, atol=0)
        except Exception as e:  # collect all, report together
            failures.append(f"{name}: {str(e).splitlines()[0][:200]}")
    assert not failures, \
        f"sweep seed={seed}: {len(failures)}/{len(sweep)} failed:\n" \
        + "\n".join(failures)
