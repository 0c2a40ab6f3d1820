"""Stream-static enrichment: join a stream against a slowly-changing
dimension table (north-star extension; the reference's only stream is
job progress, /root/reference sdk.py).

The static side is re-read PER MICRO-BATCH by Spark's stream-static
join semantics, so a dimension refreshed in place (overwrite of the
parquet path) is picked up without restarting the query — the standard
ingest-time enrichment shape (events + user dim, documents + source
metadata). The join itself is planned like any batch join: a small dim
broadcasts; AQE handles it per batch.

State: NONE — unlike stream-stream joins, stream-static joins buffer
nothing (each batch joins against the current static snapshot), so
this composes freely with downstream watermarked aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["enrich_stream"]


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join ``stream`` with static ``dim`` on ``on``.

    ``how`` is restricted to the shapes Structured Streaming supports
    for stream-static joins with unlimited semantics: ``inner`` and
    ``left`` (stream side preserved). ``broadcast_dim`` adds the
    explicit broadcast hint — correct for dimension tables; disable
    for a large static side and let AQE decide per batch.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static join supports 'inner' or 'left' (stream side), got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(d, keys, how)
