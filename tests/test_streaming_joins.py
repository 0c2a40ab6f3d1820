"""Stream-stream join: watermarked windowed join over the events table
must produce exactly the batch range-join result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sutro_spark.streaming.joins import windowed_stream_join
from sutro_spark.streaming.progress import event_timestamp


def _sides(spark, src):
    ev = src.withColumn("ts", event_timestamp(src)).where(F.col("user_id") < 8)
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    return signups, purchases


def test_stream_join_matches_batch(spark, sf_dir, tmp_path):
    import os

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    b_sign, b_purch = _sides(spark, batch)
    want = {
        (r["signup_id"], r["purchase_id"])
        for r in windowed_stream_join(
            b_sign, b_purch, on="user_id", left_ts="s_ts", right_ts="p_ts",
            window_seconds=4 * 3600,
        ).collect()
    }

    src_dir = str(tmp_path / "events")
    batch.write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    s_sign, s_purch = _sides(spark, stream)
    out = windowed_stream_join(
        s_sign, s_purch, on="user_id", left_ts="s_ts", right_ts="p_ts",
        window_seconds=4 * 3600, watermark="1 hour",
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["signup_id"], r["purchase_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == want
    assert len(want) > 0
