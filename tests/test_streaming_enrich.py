"""Stream-static enrichment == batch join; dim refresh picked up
without query restart."""

from pyspark.sql import functions as F

from sutro_spark.streaming.enrich import enrich_stream


def test_stream_static_enrich_equals_batch(spark, sf_dir, tmp_path):
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id") < 30)
        .select("event_id", "user_id", "event_type")
    )
    src = str(tmp_path / "ev")
    events.coalesce(2).write.parquet(src)
    dim = spark.createDataFrame(
        [(i, "tier%d" % (i % 3)) for i in range(30)], "user_id long, tier string"
    )

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.event_id, r.tier)
        for r in spark.sql("select event_id, tier from enriched").collect()
    }
    want = {
        (r.event_id, r.tier)
        for r in events.join(dim, "user_id", "left").select("event_id", "tier").collect()
    }
    assert got == want and len(got) == events.count()


def test_enrich_stream_rejects_unsupported_join(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError):
        enrich_stream(df, df, "user_id", how="right")
