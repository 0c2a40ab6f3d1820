"""Streaming sketch maintenance: the Structured Streaming face of
functions/sketches.py (north-star extension; the reference —
/root/reference — has no streaming data plane, its only stream is job
progress, sdk.py).

A Count-Min sketch is a plain sum over (row, bucket) cells, so its
incremental maintenance IS a streaming groupBy aggregation: Spark keeps
the running counters as query state (bounded at depth*width rows —
constant, independent of key cardinality or stream length) and emits
the updated sketch per trigger. Because the cell addressing is shared
with the batch builder (``cms_cells``), the streaming state equals
``cms_counts`` of everything ingested so far — asserted in tests.

The same shape works for the HLL registers (max instead of sum); CMS is
the demonstrator because its update is the simplest associative case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.sketches import cms_cells

__all__ = ["streaming_cms", "streaming_hll"]


def streaming_cms(
    stream: DataFrame,
    key_column: str,
    *,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Incrementally maintained Count-Min counters over a stream.

    Run with ``outputMode("complete")`` (the sketch is tiny — at most
    depth*width rows — so re-emitting the whole state per trigger is
    cheaper than downstream merge logic) or ``update`` to emit only
    changed cells.

    Output: (row int, bucket int, cnt bigint) — identical to the batch
    ``cms_counts`` over the union of all ingested batches.
    """
    cells = stream.select(cms_cells(key_column, depth=depth, width=width, salt=salt))
    return cells.groupBy(
        F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def streaming_hll(
    stream: DataFrame,
    group_column: str,
    key_column: str,
    *,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Incrementally maintained HyperLogLog registers over a stream —
    the max-aggregate twin of :func:`streaming_cms`. State is bounded
    at (groups x 2^p) rows; because max is idempotent as well as
    associative, replayed or duplicated records cannot corrupt the
    registers (exactly-once not required). Run with
    ``outputMode("complete")`` and feed the sink through
    ``functions.sketches.hll_from_registers`` for the estimate.
    """
    from sutro_spark.functions.sketches import hll_registers

    return hll_registers(stream, group_column, key_column, p=p, salt=salt)
