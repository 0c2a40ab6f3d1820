"""Streaming mixture counts == batch counts over everything ingested."""

from pyspark.sql import functions as F

from sutro_spark.streaming.mixture import streaming_source_counts


def test_streaming_mixture_equals_batch(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "lang", "text"
    )
    src = str(tmp_path / "docs")
    a, b = docs.randomSplit([0.5, 0.5], seed=5)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_source_counts(stream)
            .writeStream.format("memory")
            .queryName("mix_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r.source, r.lang): (r.n_docs, r.n_tokens)
        for r in spark.sql("select * from mix_stream").collect()
    }
    batch = {
        (r.source, r.lang): (r.n_docs, r.n_tokens)
        for r in streaming_source_counts(spark.read.parquet(src)).collect()
    }
    assert got == batch and len(got) > 1
