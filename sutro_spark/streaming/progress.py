"""Progress streaming (SURVEY.md §2.6 C5 + §2.4 A5) and the windowed
event-stream demo.

Reference: attached jobs consume an NDJSON progress stream —
rows-completed plus token counters — and the client applies
**monotonic-max** semantics so late or duplicate updates never move
progress backwards (/root/reference/sutro/sdk.py:362-390).

Spark mapping: task-level progress comes from an accumulator updated
inside the transform's Arrow batches; the monotonic-max rule lives in
``ProgressTracker.update`` exactly as the reference applies it. For
data-plane streams (not in the reference, but the Spark checkbox) we
provide watermarked tumbling-window aggregation over the events table,
runnable both as a batch query (oracle-checkable) and as a real
Structured Streaming query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ProgressTracker:
    """Monotonic progress state (A5): updates apply only forward."""

    rows_total: int = 0
    rows_completed: int = 0
    tokens: dict[str, int] = field(default_factory=dict)

    def update_rows(self, value: int) -> bool:
        """Apply only if ahead of current (sdk.py:372-373)."""
        if value > self.rows_completed:
            self.rows_completed = value
            return True
        return False

    def update_tokens(self, **counters: int) -> None:
        """Each counter only moves forward (sdk.py:381-386)."""
        for k, v in counters.items():
            if v >= self.tokens.get(k, 0):
                self.tokens[k] = v


def event_timestamp(events: DataFrame, ts_column: str = "ts") -> F.Column:
    """A proper TIMESTAMP column regardless of how the events parquet
    stores ``ts``: nanos-as-long (microsecond truncation), TIMESTAMP_NTZ
    micros (cast — identical instant under the pinned UTC session
    timezone, and required because watermarks/windows reject NTZ), or
    TIMESTAMP (pass through)."""
    from pyspark.sql import types as T

    dt = events.schema[ts_column].dataType
    if isinstance(dt, T.LongType):
        return F.timestamp_micros(F.expr(f"{ts_column} div 1000"))
    if isinstance(dt, T.TimestampNTZType):
        return F.col(ts_column).cast("timestamp")
    return F.col(ts_column)


def epoch_seconds(events: DataFrame, ts_column: str = "ts") -> F.Column:
    """Exact integer epoch-seconds for bucketing, robust to how the
    events parquet stores ``ts``: nanos-as-long (integer division — nanos
    exceed 2^53, a double round-trip would silently perturb values near
    bucket boundaries) or TIMESTAMP/TIMESTAMP_NTZ micros
    (``unix_timestamp`` under the pinned UTC session timezone). Every
    query that needs epoch seconds MUST go through this helper — inline
    ``ts div 1e9`` breaks the moment the physical type changes."""
    from pyspark.sql import types as T

    if isinstance(events.schema[ts_column].dataType, T.LongType):
        return F.expr(f"{ts_column} div 1000000000")
    return F.unix_timestamp(F.col(ts_column))


# backwards-compatible private alias (earlier call sites)
_epoch_seconds = epoch_seconds


def windowed_event_stats(
    events: DataFrame, *, window_seconds: int = 300, value_column: str = "value"
) -> DataFrame:
    """Tumbling-window aggregation over the events table, expressed via
    epoch bucketing so the identical query runs on a batch DataFrame, a
    streaming DataFrame, and the SQL oracle.

    Output: (bucket_start bigint epoch-seconds, event_type, n_events,
    sum_value rounded)."""
    sec = _epoch_seconds(events, "ts")
    bucket = F.floor(sec / window_seconds) * window_seconds
    return (
        events.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_column), 4).alias("sum_value"),
        )
    )


def streaming_event_stats(
    spark: SparkSession,
    parquet_dir: str,
    *,
    window_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The same aggregation as a genuine Structured Streaming query:
    file source → watermark (late-data bound) → tumbling window → agg.
    Run with ``.writeStream.trigger(availableNow=True)`` in tests; in
    production the watermark bounds state so the query runs forever at
    constant memory."""
    schema = spark.read.parquet(parquet_dir).schema
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    stream = stream.withColumn("ts", event_timestamp(stream))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{window_seconds} seconds"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
