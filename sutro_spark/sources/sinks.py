"""Warehouse sinks for the 100 TB layout (SURVEY.md §7 scale notes).

At cluster scale the dominant costs are shuffles; these helpers encode
the two standard layouts that remove them:

- ``write_partitioned`` — directory partitioning: queries filtering on
  the partition column scan only matching directories (partition
  pruning — visible as ``PartitionFilters`` in the scan node).
- ``write_bucketed`` — hash-bucketed tables: two tables bucketed by the
  same key join WITHOUT any exchange (the sort-merge join reads
  co-located buckets). This is the layout for the fact-fact joins
  (lineitem ⋈ orders) that broadcast can't help with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Spark only honors bucketing metadata through the table catalog, so
    this is ``saveAsTable``, not a bare path write.

    With overwrite, also clears a stale warehouse location — the
    default in-memory catalog forgets tables across sessions while
    their files persist, which otherwise fails LOCATION_ALREADY_EXISTS.
    """
    if mode == "overwrite":
        import os
        import shutil

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
        loc = os.path.join(wh, table.split(".")[-1])
        if wh and os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — zero
    exchanges when bucket specs line up (assert via
    ``plan_has_no_shuffle``)."""
    return spark.table(left).join(spark.table(right), key)


def plan_has_no_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains no shuffle exchange
    (BroadcastExchange doesn't count — broadcasts move a dim table, not
    the data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange") == 0


def _spread16(v):
    """Spread the low 16 bits of ``v`` to even bit positions (Morton
    spreading via the classic shift-and-mask ladder — 4 codegen-able
    integer ops, no per-bit loop)."""
    from pyspark.sql import functions as F

    v = v.bitwiseAND(F.lit(0xFFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x33333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x55555555))
    return v


def zorder_key(x, y):
    """Morton / Z-order interleave of two non-negative integer columns
    (low 16 bits each) into one 32-bit locality key. Sorting or
    range-partitioning by this key clusters rows that are close in
    BOTH dimensions, so parquet row-group min/max stats (and partition
    bounds) become selective for filters on EITHER column — the
    data-skipping layout a 100 TB table wants when no single sort
    column dominates (Delta/Iceberg OPTIMIZE ZORDER; plain open-source
    Spark has no native expression, so this is it).

    Pure integer shift/mask arithmetic — identical semantics in any
    engine (the DuckDB oracle reproduces keys bit-for-bit) and fully
    inside whole-stage codegen.
    """
    from pyspark.sql import functions as F

    xs = _spread16(x.cast("long"))
    ys = _spread16(y.cast("long"))
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-partitioned and sorted by the Z-order key of
    (x, y): each output file covers a compact Z-curve segment, i.e. a
    bounded rectangle-ish region of (x, y) space, so BOTH columns'
    min/max file stats are narrow. One range shuffle, no driver work."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("__z", zorder_key(F.col(x), F.col(y)))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
