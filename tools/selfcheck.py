"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet tables, then compare row count,
column names, and an order-insensitive value comparison (columns sorted
by name, rows sorted by all columns, exact cell equality).

``--strict`` additionally compares a type-classed canonical form of every
cell (int vs float vs str vs bool ...), which mirrors the driver's
dtype-sensitive value hash: a DuckDB HUGEINT aggregate surfaces as
float64 in pandas and hashes differently from Spark's int64 even when
the values are numerically equal.  Plain equality (``check_dtype=False``)
cannot see that; strict mode can.

Usage: python tools/selfcheck.py [--strict] [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb
import numpy as np
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
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def canon(v) -> str:
    """Type-classed canonical cell repr: two cells agree iff the driver's
    dtype-sensitive value hash would agree.  Ints and floats of any width
    collapse to ``i:``/``f:`` classes, so int32-vs-int64 is benign but
    float64-vs-int64 (the DuckDB HUGEINT trap) is a mismatch."""
    if v is None:
        return "@"
    if isinstance(v, (np.floating, float)):
        return "@" if math.isnan(v) else f"f:{float(v)!r}"
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, (tuple, list, np.ndarray)):
        return "l:(" + ",".join(canon(x) for x in v) + ")"
    if isinstance(v, bytes):
        return f"y:{v!r}"
    if isinstance(v, str):
        return f"s:{v}"
    if v != v:  # NaT and friends
        return "@"
    return f"{type(v).__name__}:{v}"


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    checked = 0
    orphans = set(oracles) - set(qs)
    if orphans:
        print(f"FAIL contract: oracle keys without queries: {sorted(orphans)}")
        failures += 1
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL contract: requested queries not in registry: {sorted(unknown)}")
        failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sparkdf = fn(spark, sf_dir)
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures += 1
            continue
        # Driver contract: its canonicalizer (pandas sort_values →
        # factorize) dies on unhashable cells, so ANY complex-typed
        # top-level column (array/map/struct) is a driver red even
        # when values match — exactly how hadamard_rotate failed in
        # r14 while the list→tuple leniency below kept it green
        # locally. Inspect the SCHEMA (pre-materialization — no point
        # collecting a large array-typed result just to reject it);
        # strict mode fails, non-strict warns so the divergence is
        # never silent.
        from pyspark.sql.types import ArrayType, MapType, StructType

        complex_cols = [
            f.name
            for f in sparkdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            if strict:
                print(
                    f"FAIL {name}: complex-typed top-level columns "
                    f"{complex_cols} violate the driver contract "
                    f"(scalar columns only — posexplode them)"
                )
                failures += 1
                continue
            print(
                f"WARN {name}: complex-typed top-level columns "
                f"{complex_cols} — would FAIL the driver contract "
                f"(strict mode rejects these; posexplode to scalars)"
            )
        try:
            sdf = sparkdf.toPandas()
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
        if strict:
            bad_cols = []
            for c in s.columns:
                sc = s[c].map(canon)
                oc = o[c].map(canon)
                if not sc.equals(oc):
                    ex = next(
                        (f"{a!r} vs {b!r}" for a, b in zip(sc, oc) if a != b), ""
                    )
                    bad_cols.append(f"{c} ({s[c].dtype} vs {o[c].dtype}: {ex})")
            if bad_cols:
                print(f"FAIL {name}: strict dtype mismatch: {'; '.join(bad_cols)}")
                failures += 1
                continue
        print(f"OK   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    # Completeness gate (closes the round-5/round-6 selfcheck/registry
    # race): a FULL run that checked fewer queries than the registry
    # holds is a stale artifact, not a green one — fail loudly so the
    # artifact can never again claim "complete" while missing entries
    # registered after generation.
    expected = len(only) if only else len(qs)
    print(f"\nCHECKED {checked}/{expected} (registry holds {len(qs)} queries)")
    if checked != expected:
        print(f"FAIL contract: checked {checked} != expected {expected}")
        failures += 1
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
