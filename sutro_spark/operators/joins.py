"""Temporal joins Spark lacks as built-ins (global build plan: "as-of
join, range join" as composition of DataFrame ops — no reference
counterpart; standard public techniques).

- ``asof_join`` — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key. Implemented with the union + keyed
  window trick: tag both sides, union, per-key ``last(..., ignorenulls)``
  over rows ordered by (ts, side). ONE shuffle on (key), no per-key
  Python, no range explosion — the scale-safe formulation (a naive
  inequality join is O(n·m) per key).
- ``range_join`` — pairs within ``[left_ts, left_ts + window)``.
  Bucketize both sides to ``window``-sized buckets, equi-join on
  (key, bucket) for the candidate set (each left row probes 2 buckets),
  then apply the exact range filter — turning an inequality join into
  an equi-join Catalyst can hash-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_columns: list[str],
    how: str = "left",
) -> DataFrame:
    """As-of join: attach the most recent right-side values at or
    before each left row's timestamp, per key.

    ``how="left"`` keeps left rows with no prior right row (null
    values); ``how="inner"`` drops them.
    """
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_columns],
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        *[F.col(c).alias(f"__v_{c}") for c in value_columns],
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts → inclusive (<=)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "__side",
        "__lrow",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_columns
        ],
    ).where(F.col("__side") == 1)
    out = filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(c) for c in value_columns],
    )
    if how == "inner":
        cond = None
        for c in value_columns:
            notnull = F.col(c).isNotNull()
            cond = notnull if cond is None else (cond | notnull)
        out = out.where(cond)
    elif how != "left":
        raise ValueError("how must be 'left' or 'inner'")
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    window: int,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    ``left_ts <= right_ts < left_ts + window`` (timestamps as integer
    seconds/units). Candidates come from an equi-join on
    (key, time-bucket) with each left row probing its own and the next
    bucket — no unbounded inequality join.
    """
    lb = left.withColumn("__bucket", F.floor(F.col(left_ts) / window))
    l_probe = lb.withColumn(
        "__probe", F.explode(F.array(F.col("__bucket"), F.col("__bucket") + 1))
    ).drop("__bucket")
    rb = right.withColumn("__probe", F.floor(F.col(right_ts) / window))
    joined = l_probe.join(rb, on=[on, "__probe"]).drop("__probe")
    return joined.where(
        (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + window)
    )
