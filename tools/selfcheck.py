"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet tables, then compare row count,
column names, and an order-insensitive value comparison (columns sorted
by name, rows sorted by all columns, exact cell equality).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from sutro_spark.session import get_spark

    spark = get_spark("selfcheck", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    orphans = set(oracles) - set(qs)
    if orphans:
        print(f"FAIL contract: oracle keys without queries: {sorted(orphans)}")
        failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
            failures += 1
            continue
        s, o = normalize(sdf), normalize(odf)
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
        except AssertionError as e:
            diff = (s != o) & ~(s.isna() & o.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: value mismatch ({int(bad.sum())} rows)")
            print(s[bad].head(3))
            print(o[bad].head(3))
            print(str(e).splitlines()[-1] if str(e) else "")
            failures += 1
            continue
        print(f"OK   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
