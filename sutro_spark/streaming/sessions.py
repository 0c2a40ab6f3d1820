"""Session-window aggregation: the streaming face of the batch
sessionization query (``__spark_entry__.q_events_sessionize``'s
gap-based sessions, re-expressed with ``F.session_window``).

``session_window(ts, gap)`` is Spark's native dynamic-gap window: a
session extends while events keep arriving within ``gap`` of the last
one and closes after a quiet period — exactly the lag-based >gap rule
the batch query implements with window functions. The same expression
runs in BOTH batch and streaming plans, so stream==batch equality is
testable directly (tests/test_streaming_sessions.py).

Streaming state discipline: the watermark bounds session state — a
session's state is emittable/evictable once the watermark passes its
close time, so memory is (open sessions × active keys), not history.
Aggregations are all map-side-combinable (count/sum/min/max).

Scale notes: state is keyed by (user, session) and partitioned by the
grouping key; skewed users produce long sessions, not hot partitions,
because one user still holds exactly one open session at a time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def session_stats(
    df: DataFrame,
    *,
    user_column: str = "user_id",
    ts_column: str = "event_ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(user, session) stats: start, end, event count, value sum.

    ``df`` needs a real timestamp column (``ts_column``). Pass
    ``watermark`` (e.g. ``"1 hour"``) on streaming inputs — without it
    a streaming session agg cannot finalize state. Batch inputs run
    identically with no watermark.
    """
    src = df
    if watermark is not None:
        src = src.withWatermark(ts_column, watermark)
    cents: Column = F.round(F.col("value") * 100).cast("long")
    return (
        src.groupBy(
            F.col(user_column),
            F.session_window(F.col(ts_column), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("value_cents"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .select(
            user_column,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "value_cents",
            "first_event",
            "last_event",
        )
    )
