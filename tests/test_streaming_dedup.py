"""Streaming exact dedup (dropDuplicatesWithinWatermark) == batch distinct."""

from pyspark.sql import functions as F

from sutro_spark.streaming.dedup import content_digest, streaming_dedup
from sutro_spark.streaming.progress import event_timestamp


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    events = raw.withColumn("ts", event_timestamp(raw)).where(F.col("user_id") < 5)
    src = str(tmp_path / "events")
    # two copies of every event: the duplicate stream the op must collapse
    events.coalesce(1).write.mode("overwrite").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_dedup(stream, ["user_id", "event_id"], ts_column="ts")
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = spark.sql("select __digest from dedup_stream")
    batch = spark.read.parquet(src).withColumn(
        "__digest", content_digest(["user_id", "event_id"])
    )
    n_distinct = batch.select("__digest").distinct().count()
    assert got.count() == n_distinct  # every duplicate collapsed
    assert got.distinct().count() == n_distinct
    # and the kept digests are exactly the batch-distinct set
    kept = {r["__digest"] for r in got.collect()}
    expected = {r["__digest"] for r in batch.select("__digest").distinct().collect()}
    assert kept == expected


def test_streaming_dedup_unbounded_variant_no_ts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, text string"
    )
    out = streaming_dedup(df, ["text"])  # batch df: dropDuplicates path
    assert out.select("text").distinct().count() == out.count() == 2
