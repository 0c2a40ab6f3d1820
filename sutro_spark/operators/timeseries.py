"""Time-series operators over the events table: bucket resampling with
gap fill + forward fill, ordered funnel conversion, and retention
cohorts. All pure Catalyst — `sequence()`/`explode` generates missing
buckets distributed (never a driver-side calendar), window functions
carry values forward, and the funnel is conditional aggregation rather
than a per-user collect.

Scale notes:
- `resample_ffill` explodes one row per (user, bucket) — output size is
  bounded by span/bucket, independent of event count; the explode and
  the fill window share the user-key partitioning so AQE keeps it to
  one effective shuffle;
- `funnel_stages` is three min-aggregations chained by broadcast-able
  per-user milestones — at 1000 executors each stage is one shuffle on
  user_id, no skew (users are high-cardinality);
- `retention_cohorts` is a single groupBy over (cohort, offset) after a
  per-user min window — two shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_ffill", "funnel_stages", "retention_cohorts"]


def resample_ffill(
    events: DataFrame,
    *,
    bucket_seconds: int = 3600,
    user_column: str = "user_id",
    sec_column: str = "sec",
    value_column: str = "value",
) -> DataFrame:
    """Per-user fixed-width resample with gap fill: one row per
    (user, bucket) between the user's first and last event, carrying the
    bucket's event count and value sum; empty buckets get n=0 and the
    most recent previous bucket's running value (forward fill).

    Output: (user_id, bucket, n_events, sum_cents, filled_cents).
    Values are summed as exact integer cents so both engines agree
    bit-for-bit.
    """
    cents = F.round(F.col(value_column) * 100).cast("long")
    bucket = (F.col(sec_column) / bucket_seconds).cast("long") * bucket_seconds
    per_bucket = (
        events.select(
            F.col(user_column).alias("user_id"),
            bucket.alias("bucket"),
            cents.alias("__cents"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("__cents").alias("sum_cents"))
    )
    spans = per_bucket.groupBy("user_id").agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(bucket_seconds).cast("long"))
        ).alias("bucket"),
    )
    joined = grid.join(per_bucket, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("sum_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        "n_events",
        F.coalesce("sum_cents", F.lit(0)).alias("sum_cents"),
        F.coalesce(F.last("sum_cents", ignorenulls=True).over(w), F.lit(0)).alias(
            "filled_cents"
        ),
    )


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    *,
    user_column: str = "user_id",
    sec_column: str = "sec",
    type_column: str = "event_type",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel: for each user, the earliest step-1 event, then
    the earliest step-2 event at-or-after it, and so on; a user counts
    toward stage k only having completed stages 1..k in order.

    Fully lazy — per-stage user sets are unioned and aggregated in ONE
    job (no driver-side count() per stage). Output: (stage bigint
    1-based, step string, n_users). ``horizon_seconds`` bounds the whole
    funnel to a window after the step-1 time when set."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        F.col(user_column).alias("user_id"),
        F.col(sec_column).alias("sec"),
        F.col(type_column).alias("event_type"),
    )
    milestones = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    stages = [
        milestones.select(
            "user_id", F.lit(1).cast("bigint").alias("stage"), F.lit(steps[0]).alias("step")
        )
    ]
    prev = milestones
    prev_col = "t1"
    for i, step in enumerate(steps[1:], start=2):
        cand = ev.where(F.col("event_type") == step).join(prev, "user_id")
        cand = cand.where(F.col("sec") >= F.col(prev_col))
        if horizon_seconds is not None:
            cand = cand.where(F.col("sec") <= F.col("t1") + horizon_seconds)
        prev = cand.groupBy("user_id", *[c for c in prev.columns if c != "user_id"]).agg(
            F.min("sec").alias(f"t{i}")
        )
        prev_col = f"t{i}"
        stages.append(
            prev.select(
                "user_id", F.lit(i).cast("bigint").alias("stage"), F.lit(step).alias("step")
            )
        )
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out.groupBy("stage", "step").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    sec_column: str = "sec",
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period,
    counted per (cohort period, periods-since-cohort offset).

    Output: (cohort bigint epoch-seconds, offset bigint, n_users) with
    distinct users per cell.
    """
    period = (F.col(sec_column) / period_seconds).cast("long")
    ev = events.select(F.col(user_column).alias("user_id"), period.alias("__p"))
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("__cohort_p", F.min("__p").over(w))
        .select(
            (F.col("__cohort_p") * period_seconds).alias("cohort"),
            (F.col("__p") - F.col("__cohort_p")).alias("offset"),
            "user_id",
        )
        .groupBy("cohort", "offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
