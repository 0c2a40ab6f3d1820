"""Streaming quality-scorer maintenance: the continuous-ingest face of
operators/quality.train_linear_scorer (north-star extension; the
reference — /root/reference — has no streaming data plane).

Online one-pass perceptron: each micro-batch is scored under the
CURRENT weights, misclassified documents contribute an integer
correction to their feature buckets, and the correction is APPENDED to
the model directory — current weights are the groupBy-sum of all
appended increments, so the model store is append-only (no
rewrite-while-read races; same discipline as streaming/dedup.py's
postings index) and mergeable by addition like the sketch state in
streaming/sketches.py. State is bounded at <= dim rows regardless of
stream length.

Semantics vs the batch trainer: train_linear_scorer is MULTI-EPOCH
full-batch (it revisits the corpus); this is single-pass online — each
doc influences the model once, under the weights at the START of its
micro-batch (the update within a batch is SYNCHRONOUS: all docs scored
against the same weights, corrections applied as one sum — the only
semantics a distributed groupBy can implement deterministically). The
pytest asserts stream == a sequential driver replay of the identical
per-batch update, which is the strongest equality a single-pass online
algorithm admits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def current_weights(spark, model_dir: str, *, dim: int = 1024) -> DataFrame:
    """(bucket, w) — the sum of all appended increments; empty model if
    nothing has been learned yet."""
    import os

    if os.path.isdir(model_dir) and any(
        f.endswith(".parquet") for f in os.listdir(model_dir)
    ):
        return (
            spark.read.schema("bucket long, dw long")
            .parquet(model_dir)
            .groupBy("bucket")
            .agg(F.sum("dw").alias("w"))
        )
    return spark.createDataFrame([], "bucket long, w long")


def streaming_scorer_update(
    stream: DataFrame,
    model_dir: str,
    label,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    dim: int = 1024,
):
    """Per-micro-batch online perceptron update against the persisted
    model. ``label`` is a column expression over the batch evaluating
    to +1/-1 (the teacher signal — curated-source membership etc.).

    Returns a ``DataStreamWriter``; caller starts it. Batch shape: one
    broadcast join of the <= dim-row weights + two combinable groupBys
    — identical to one epoch of the batch trainer, so per-trigger cost
    is O(batch tokens), never O(corpus).
    """
    from sutro_spark.operators.quality import hashed_token_features

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = current_weights(spark, model_dir, dim=dim)
        feats = hashed_token_features(
            batch_df, text_column, id_column, dim=dim
        )
        labels = batch_df.select(
            F.col(id_column).alias("id"), label.cast("long").alias("y")
        )
        s = (
            feats.join(F.broadcast(w), "bucket", "left")
            .groupBy("id")
            .agg(F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))).alias("s"))
        )
        err = (
            labels.join(s, "id")
            .select(
                "id",
                F.when((F.col("y") == 1) & (F.col("s") <= 0), F.lit(1))
                .when((F.col("y") == -1) & (F.col("s") > 0), F.lit(-1))
                .otherwise(F.lit(0))
                .alias("err"),
            )
            .where(F.col("err") != 0)
        )
        dw = (
            feats.join(err, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("err") * F.col("cnt")).alias("dw"))
        )
        dw.write.mode("append").parquet(model_dir)

    return stream.writeStream.foreachBatch(process)
