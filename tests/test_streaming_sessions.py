"""Streaming session_window aggregation == identical batch aggregation,
and the session boundaries match the batch lag-based sessionize rule."""

from pyspark.sql import functions as F

from sutro_spark.streaming.progress import event_timestamp
from sutro_spark.streaming.sessions import session_stats


def _events(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("event_ts", event_timestamp(raw)).where(
        F.col("user_id") < 8
    )


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    events = _events(spark, sf_dir)
    src = str(tmp_path / "events")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    batch = session_stats(spark.read.parquet(src)).collect()

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            session_stats(stream, watermark="1 hour")
            .writeStream.format("memory")
            .queryName("sessions_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = spark.sql("select * from sessions_stream").collect()
    key = lambda r: (r["user_id"], r["session_start"])  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, batch), key=lambda t: (t[0], t[1])
    )
    assert len(batch) > 0
    by_key = {key(r): r for r in batch}
    assert len(by_key) == len(batch)  # (user, start) uniquely names a session


def test_session_counts_match_lag_rule(spark, sf_dir):
    # session_window's dynamic gap must reproduce the batch lag-based
    # ">30 min gap starts a new session" count per user.
    events = _events(spark, sf_dir)
    sess = (
        session_stats(events)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    from pyspark.sql import Window

    from sutro_spark.streaming.progress import epoch_seconds

    sec = epoch_seconds(events, "ts")
    w = Window.partitionBy("user_id").orderBy(sec.asc(), F.col("event_id").asc())
    lag_rule = (
        events.select(
            "user_id", sec.alias("sec"), F.lag(sec).over(w).alias("prev")
        )
        .withColumn(
            "new_s",
            F.when(F.col("prev").isNull() | (F.col("sec") - F.col("prev") > 1800), 1)
            .otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in sess.collect()}
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in lag_rule.collect()}
    assert got == want
