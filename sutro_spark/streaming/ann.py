"""Streaming IVF-BQ index maintenance — the streaming twin of
operators/similarity.py ``ivf_bq_append`` (the
streaming_clusters/incremental_components discipline applied to the
ANN serving layout).

Vectors arrive as a stream; every micro-batch is routed against the
FROZEN coarse centroids and BQ thresholds (``ivf_bq_route`` — a
per-row function of (vector, params), so how the stream is sliced
into batches cannot change any output row: stream == batch by
construction, the parity test_streaming_ann.py pins it) and appended
to a parquet code table PARTITIONED BY cluster — the serving layout
whose scan-level pruning test_scale_layout.py proves via
PartitionFilters. Operator state is ZERO rows: the frozen params are
broadcast literals and the table is append-only; exactly-once comes
from the streaming checkpoint, not from re-reading the table (the
batch API's ``assert_new_ids`` id-guard is the caller's tool when
upstream uniqueness is in doubt — a per-batch guard scan would read
the whole table every trigger, the one thing an append must not do).

Staleness is monitored, not hidden: pair with
``ivf_routing_balance`` over the build snapshot vs newly-routed rows
— a 'major' band is the quantizer-rebuild trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sutro_spark.operators.similarity import ivf_bq_route


def streaming_ivf_append(
    vector_stream: DataFrame,
    codes_dir: str,
    centroids: list[tuple[int, list[int]]],
    thresholds: list[int],
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
):
    """foreachBatch writer folding a vector stream into the bucketed
    code table at frozen parameters. Returns a ``DataStreamWriter`` —
    caller picks trigger/checkpoint and ``.start()``s it."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        routed = ivf_bq_route(
            batch_df,
            centroids,
            thresholds,
            id_column=id_column,
            vector_column=vector_column,
        )
        (
            routed.write.mode("append")
            .partitionBy("cluster")
            .parquet(codes_dir)
        )

    return vector_stream.writeStream.foreachBatch(process)


def read_codes(spark, codes_dir: str) -> DataFrame:
    """The appended code table, (id, cluster, code_lo, code_hi) —
    ``cluster`` comes back from the partition directories, so a
    cluster-filtered read prunes at the scan."""
    return spark.read.parquet(codes_dir).select(
        "id", "cluster", "code_lo", "code_hi"
    )
