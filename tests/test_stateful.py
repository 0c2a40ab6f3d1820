"""Custom stateful streaming operator (applyInPandasWithState)."""

from pyspark.sql import functions as F

from sutro_spark.streaming.progress import event_timestamp
from sutro_spark.streaming.stateful import running_user_totals


def test_running_user_totals_matches_batch(spark, sf_dir, tmp_path):
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    events = raw.withColumn("ts", event_timestamp(raw)).where(F.col("user_id") < 5)
    src = str(tmp_path / "events")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    # few state-store partitions: each one costs per-batch setup and the
    # correctness check doesn't need 32 of them
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            running_user_totals(stream, evict_idle_ms=None)
            .writeStream.format("memory")
            .queryName("user_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        # the ProcessingTimeTimeout keeps the query alive past the data;
        # drain what's available and stop explicitly
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # last update per user == the batch aggregate
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in spark.sql("select * from user_totals").collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected
