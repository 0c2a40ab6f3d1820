"""Streaming CMS maintenance == batch sketch over everything ingested."""

from pyspark.sql import functions as F

from sutro_spark.functions.sketches import cms_counts
from sutro_spark.streaming.sketches import streaming_cms


def test_streaming_cms_equals_batch(spark, sf_dir, tmp_path):
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id") < 40)
        .select("user_id")
    )
    src = str(tmp_path / "ev")
    # two files → at least two streamed micro-batches under availableNow
    a, b = events.randomSplit([0.5, 0.5], seed=3)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_cms(stream, "user_id", depth=3, width=64)
            .writeStream.format("memory")
            .queryName("cms_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r.row, r.bucket): r.cnt
        for r in spark.sql("select * from cms_stream").collect()
    }
    batch = {
        (r.row, r.bucket): r.cnt
        for r in cms_counts(
            spark.read.parquet(src), "user_id", depth=3, width=64
        ).collect()
    }
    assert got == batch
    assert sum(got.values()) == 3 * spark.read.parquet(src).count()


def test_streaming_hll_equals_batch(spark, sf_dir, tmp_path):
    from sutro_spark.functions.sketches import hll_distinct, hll_from_registers
    from sutro_spark.streaming.sketches import streaming_hll

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    src = str(tmp_path / "ev")
    a, b = events.randomSplit([0.5, 0.5], seed=11)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_hll(stream, "event_type", "user_id")
            .writeStream.format("memory")
            .queryName("hll_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    stream_est = {
        r.grp: (r.n_zero, r.s_scaled, r.est_hll)
        for r in hll_from_registers(spark.sql("select * from hll_stream")).collect()
    }
    batch_est = {
        r.grp: (r.n_zero, r.s_scaled, r.est_hll)
        for r in hll_distinct(
            spark.read.parquet(src), "event_type", "user_id"
        ).collect()
    }
    assert stream_est == batch_est


def test_streaming_anisotropy_equals_batch(spark, sf_dir, tmp_path):
    """r10: the anisotropy state (dim+2 integers) maintained over
    micro-batches finishes to EXACTLY the batch diagnostic over the
    union of everything ingested."""
    from sutro_spark.operators.similarity import embedding_anisotropy
    from sutro_spark.streaming.sketches import (
        anisotropy_from_state,
        streaming_anisotropy,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    src = str(tmp_path / "emb")
    a, b = emb.randomSplit([0.5, 0.5], seed=7)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_anisotropy(stream)
            .writeStream.format("memory")
            .queryName("aniso_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = anisotropy_from_state(spark.sql("select * from aniso_stream")).collect()[0]
    want = embedding_anisotropy(spark.read.parquet(src)).collect()[0]
    assert got["n_vecs"] == want["n_vecs"]
    assert got["t_self"] == want["t_self"]
    assert got["s_norm2"] == want["s_norm2"]
    assert got["anisotropy"] == want["anisotropy"]
