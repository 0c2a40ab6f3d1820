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


def test_streaming_jaccard_pairs_equals_batch_replay(spark, tmp_path):
    """stream (persisted-postings foreachBatch) == sequential replay of
    operators/dedup.incremental_jaccard_pairs over the same batches."""
    import os

    from sutro_spark.operators.dedup import incremental_jaccard_pairs
    from sutro_spark.streaming.dedup import streaming_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog tonight again"
    alt = "completely different content about spark structured streaming"
    batches = [
        [(1, base), (2, alt)],
        [(3, base + " and then some"), (4, "unrelated text body here")],
        [(5, alt + " with a twist"), (6, base)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"b{i}"))
        part = next(
            p for p in os.listdir(tmp_path / f"b{i}") if p.endswith(".parquet")
        )
        dst = src / f"{i}.parquet"
        os.rename(tmp_path / f"b{i}" / part, dst)
        # FileStreamSource orders by modification time: force i-ascending
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_jaccard_pairs(
                stream, index_dir, pairs_dir, k=8, threshold=0.1
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r.corpus_id, r.new_id, round(r.jaccard, 9))
        for r in spark.read.parquet(pairs_dir).collect()
    }

    expected = set()
    for t in range(len(batches)):
        if t == 0:
            continue
        corpus = spark.createDataFrame(
            [r for b in batches[:t] for r in b], schema
        )
        new = spark.createDataFrame(batches[t], schema)
        for r in incremental_jaccard_pairs(corpus, new, k=8, threshold=0.1).collect():
            expected.add((r.corpus_id, r.new_id, round(r.jaccard, 9)))

    assert got == expected
    assert any(j > 0.5 for _, _, j in got)  # the planted near-dups surfaced


def test_streaming_jaccard_pairs_bucketed_equals_flat(spark, tmp_path):
    """The bucketed-index layout changes WHERE the postings live, not
    what the operator computes: same batches, identical pair output."""
    import os

    from sutro_spark.operators.dedup import incremental_jaccard_pairs
    from sutro_spark.streaming.dedup import streaming_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog tonight again"
    alt = "completely different content about spark structured streaming"
    batches = [
        [(1, base), (2, alt)],
        [(3, base + " and then some"), (4, "unrelated text body here")],
        [(5, alt + " with a twist"), (6, base)],
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"b{i}"))
        part = next(
            p for p in os.listdir(tmp_path / f"b{i}") if p.endswith(".parquet")
        )
        dst = src / f"{i}.parquet"
        os.rename(tmp_path / f"b{i}" / part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    pairs_dir = str(tmp_path / "pairs")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_jaccard_pairs(
                stream, str(tmp_path / "index"), pairs_dir, k=8, threshold=0.1,
                index_buckets=4, index_table_prefix="sjp_bucketed_test",
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.sql("DROP TABLE IF EXISTS sjp_bucketed_test_postings")
        spark.sql("DROP TABLE IF EXISTS sjp_bucketed_test_dfs")

    got = {
        (r.corpus_id, r.new_id, round(r.jaccard, 9))
        for r in spark.read.parquet(pairs_dir).collect()
    }
    expected = set()
    for t in range(1, len(batches)):
        corpus = spark.createDataFrame([r for b in batches[:t] for r in b], schema)
        new = spark.createDataFrame(batches[t], schema)
        for r in incremental_jaccard_pairs(corpus, new, k=8, threshold=0.1).collect():
            expected.add((r.corpus_id, r.new_id, round(r.jaccard, 9)))
    assert got == expected
    assert any(j > 0.5 for _, _, j in got)


def test_jaccard_batch_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-running a committed micro-batch leaves
    pairs and both index sinks byte-identical — the replayed probe
    reads only partitions below its own batch_id, so it never pairs a
    batch against its own earlier partial append."""
    from sutro_spark.streaming.dedup import jaccard_batch

    base = "the quick brown fox jumps over the lazy dog tonight again"
    alt = "completely different content about spark structured streaming"
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame([(1, base), (2, alt)], schema)
    b1 = spark.createDataFrame(
        [(3, base + " and then some"), (4, "unrelated text body here")], schema
    )
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")

    def snapshot():
        pairs = sorted(
            (r["corpus_id"], r["new_id"], round(r["jaccard"], 9))
            for r in spark.read.parquet(pairs_dir).collect()
        )
        postings = sorted(
            (r["shingle"], r["id"])
            for r in spark.read.parquet(f"{index_dir}/postings")
            .select("shingle", "id").collect()
        )
        dfs = sorted(
            (r["shingle"], r["df"])
            for r in spark.read.parquet(f"{index_dir}/dfs")
            .groupBy("shingle").agg(F.sum("df").alias("df")).collect()
        )
        return pairs, postings, dfs

    jaccard_batch(b0, 0, index_dir, pairs_dir, k=8, threshold=0.1)
    jaccard_batch(b1, 1, index_dir, pairs_dir, k=8, threshold=0.1)
    once = snapshot()
    assert once[0], "the planted near-dup must pair"
    jaccard_batch(b1, 1, index_dir, pairs_dir, k=8, threshold=0.1)  # retry
    assert snapshot() == once


def test_bucketed_index_probe_no_exchange_on_index_side(spark):
    """The 100-TB claim behind the bucketed layout: probing the
    accumulated postings index shuffles ONLY the small batch side —
    the index scan reads co-located buckets with no Exchange. Built by
    two appends (the steady-state layout after many micro-batches)."""
    from sutro_spark.streaming.dedup import _append_bucketed

    table = "bucket_probe_test_postings"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    rows1 = [(f"sh{i}", i) for i in range(200)]
    rows2 = [(f"sh{i}", 1000 + i) for i in range(200)]
    _append_bucketed(
        spark.createDataFrame(rows1, "shingle string, id long"), table, 4, "shingle"
    )
    _append_bucketed(
        spark.createDataFrame(rows2, "shingle string, id long"), table, 4, "shingle"
    )
    batch = spark.createDataFrame(
        [(f"sh{i}",) for i in range(0, 50)], "shingle string"
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "7",  # != bucket count on purpose
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = spark.table(table).join(batch, "shingle")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_shuffle = plan.count("Exchange") - plan.count("BroadcastExchange")
        # exactly ONE shuffle: the batch side aligning to the index's
        # 4 buckets; zero on the index side
        assert n_shuffle == 1, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 100  # 50 shingles x 2 postings each
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucket_parallelism_restored_when_batch_body_raises(spark, tmp_path):
    """A failure anywhere in the batch body (here: missing text column
    -> AnalysisException building the shingle plan) must still restore
    spark.sql.shuffle.partitions — the override may never leak into
    the session."""
    import pytest

    from sutro_spark.streaming.dedup import jaccard_batch

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    bad = spark.createDataFrame([(1, "a")], ["doc_id", "not_text"])
    with pytest.raises(Exception):
        jaccard_batch(
            bad, 0, str(tmp_path / "idx"), str(tmp_path / "pairs"),
            text_column="text", index_buckets=4,
            index_table_prefix="t_leak_check",
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_curation_parallelism_restored_when_batch_body_raises(spark, tmp_path):
    import pytest

    from sutro_spark.streaming.curation import curate_batch

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    bad = spark.createDataFrame(
        [(1, "a", "web", "en")], ["doc_id", "not_text", "source", "lang"]
    )
    with pytest.raises(Exception):
        curate_batch(
            bad, [0] * 4, str(tmp_path / "cidx"),
            text_column="text", index_buckets=4,
            index_table_prefix="t_leak_check_c",
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
