"""Watermarked stream-stream join: correlate two live event streams
within a bounded time window (clicks within N minutes of the signup
that preceded them, impressions joined to conversions, ...).

State discipline: BOTH sides carry a watermark and the join condition
bounds the right timestamp to a window after the left timestamp, so
Spark can compute, per side, exactly how long a row must be buffered
before no future match can arrive — state is evicted continuously and
the query runs forever at constant memory. An unbounded stream-stream
join (no watermark or no time bound) would buffer both streams in
full; this module's API makes the bound mandatory.

The same frame produced on static DataFrames is a plain range join —
the unit tests assert stream output == the batch inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_stream_join"]


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two (streaming or static) frames on ``on`` where
    ``left_ts <= right_ts < left_ts + window_seconds``.

    Streaming inputs must be timestamp-typed on their ts columns; both
    get ``watermark`` applied here (idempotent on static frames, which
    simply ignore it — the identical expression tree runs in both
    modes, the stream==batch equality the tests assert).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] < lw[left_ts] + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
