"""Streaming exact dedup: the streaming face of
sutro_spark/operators/dedup.py's exact_dedup, for ingest-time
pipelines (keep the first arrival of each content digest, drop later
copies as they stream in).

State discipline is the whole design: ``dropDuplicatesWithinWatermark``
keys the dedup state by digest and EVICTS entries once the watermark
passes them — the query runs forever at constant memory, bounded by
(duplicate horizon × arrival rate), not corpus size. The no-timestamp
variant (plain ``dropDuplicates``) keeps every digest ever seen and is
only sane for bounded replays; production ingest should always have an
event time.

The digest is the same sha2-over-concatenated-columns key exact_dedup
shuffles on, so batch and stream agree on what "duplicate" means —
the unit test asserts stream output == batch distinct set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: separator matching operators/dedup.py's digest recipe
_SEP = "\x1f"


def content_digest(columns: list[str]) -> F.Column:
    """sha256 over the null-coalesced, unit-separator-joined columns."""
    return F.sha2(
        F.concat_ws(_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]),
        256,
    )


def streaming_dedup(
    stream: DataFrame,
    columns: list[str],
    *,
    ts_column: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival dedup on the content digest of ``columns``.

    With ``ts_column`` (a timestamp column): watermark +
    ``dropDuplicatesWithinWatermark`` — duplicates separated by more
    than the watermark horizon are NOT collapsed (they are different
    "occurrences" as far as bounded state can know); choose the horizon
    to cover your real duplicate window. Without it: unbounded-state
    ``dropDuplicates`` for bounded replays only.
    """
    keyed = stream.withColumn("__digest", content_digest(columns))
    if ts_column is not None:
        return keyed.withWatermark(ts_column, watermark).dropDuplicatesWithinWatermark(
            ["__digest"]
        )
    return keyed.dropDuplicates(["__digest"])
