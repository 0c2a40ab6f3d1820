"""Streaming duplicate-cluster maintenance: the label-table face of
operators/cluster.incremental_components, run per micro-batch over a
near-dup PAIRS stream (the output of streaming_jaccard_pairs) so the
cluster assignment is continuously current without ever re-reading
the accumulated pair set.

Snapshot layout under ``labels_dir``: each micro-batch writes the FULL
(node, component) table under ``__batch_id=N/`` via dynamic partition
overwrite — so a replayed batch replaces exactly its own snapshot
(at-least-once -> exactly-once-equivalent, the streaming/dedup.py
convention), and the current assignment is simply the highest
surviving partition. Batch N's input is the HIGHEST snapshot strictly
below N, never a union of snapshots: labels are states, not deltas.
Old snapshots are retention, not correctness — drop partitions below
any horizon you like.

Why this is the 100 TB shape: the pair set grows without bound
(every batch appends candidates), but the label table is one row per
clustered node, and re-clustering FROM LABELS converges in ~2
large-star/small-star rounds because the carried part is already
star-shaped. Cost per batch: O(|labels| + |batch pairs|), not
O(all pairs ever).

Equality contract (pytest-asserted): the final snapshot equals
connected_components over the union of every batch's pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.streaming.dedup import _write_batch_partition

__all__ = ["components_batch", "streaming_components", "read_labels"]

_LABEL_SCHEMA = "node long, component long"


def read_labels(spark, labels_dir: str, *, before_batch: int | None = None) -> DataFrame:
    """The current (node, component) snapshot: the highest
    ``__batch_id`` partition (strictly below ``before_batch`` when
    given — what a replayed batch must see, replay isolation). Empty
    frame when no snapshot exists yet. The max-id probe is a bounded
    1-row scalar over the partition column (partition-pruned scan);
    unlike dedup's ``_read_or_empty`` this reader KEEPS the partition
    column long enough to pick one snapshot — labels are states, so
    unioning partitions would mix stale assignments in."""
    import os

    found = False
    if os.path.isdir(labels_dir):
        for _root, _dirs, files in os.walk(labels_dir):
            if any(f.endswith(".parquet") for f in files):
                found = True
                break
    if not found:
        return spark.createDataFrame([], _LABEL_SCHEMA)
    snaps = spark.read.parquet(labels_dir)
    if before_batch is not None:
        snaps = snaps.where(F.col("__batch_id") < F.lit(int(before_batch)))
    latest = snaps.agg(F.max("__batch_id").alias("m")).first()["m"]
    if latest is None:
        return spark.createDataFrame([], _LABEL_SCHEMA)
    return snaps.where(F.col("__batch_id") == F.lit(latest)).select(
        F.col("node").cast("long"), F.col("component").cast("long")
    )


def components_batch(
    batch_pairs: DataFrame,
    batch_id: int,
    labels_dir: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> None:
    """One micro-batch: prior snapshot + this batch's pairs ->
    incremental CC -> write this batch's full snapshot. Exposed at
    module level so replay idempotency is directly testable: calling
    this twice with the same (batch_pairs, batch_id) leaves
    ``labels_dir`` byte-identical to calling it once."""
    from sutro_spark.operators.cluster import incremental_components

    spark = batch_pairs.sparkSession
    prior = read_labels(spark, labels_dir, before_batch=batch_id)
    labels = incremental_components(prior, batch_pairs, src, dst)
    _write_batch_partition(labels, labels_dir, batch_id)


def streaming_components(
    pairs_stream: DataFrame,
    labels_dir: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
):
    """foreachBatch writer maintaining the cluster label snapshot over
    a candidate-pairs stream. Returns a ``DataStreamWriter`` — caller
    picks trigger/checkpoint and ``.start()``s it."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        components_batch(batch_df, batch_id, labels_dir, src=src, dst=dst)

    return pairs_stream.writeStream.foreachBatch(process)
