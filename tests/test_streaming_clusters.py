"""Streaming cluster maintenance: final label snapshot == from-scratch
connected components over every batch's pairs; replay idempotent."""

import os

from pyspark.sql import functions as F


def _write_batches(spark, tmp_path, batches, schema):
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
    return str(src)


BATCHES = [
    [(1, 2), (2, 3), (10, 11)],
    [(20, 21), (3, 4)],
    [(11, 20), (30, 31)],   # merges {10,11} with {20,21}
]


def test_streaming_components_equals_batch_cc(spark, tmp_path):
    from sutro_spark.operators.cluster import connected_components
    from sutro_spark.streaming.clusters import read_labels, streaming_components

    schema = "id_a long, id_b long"
    src = _write_batches(spark, tmp_path, BATCHES, schema)
    labels_dir = str(tmp_path / "labels")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_components(stream, labels_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    allp = spark.createDataFrame(
        [p for b in BATCHES for p in b], schema
    )
    want = {
        (r["node"], r["component"])
        for r in connected_components(allp).collect()
    }
    assert got == want
    # the cross-batch merge really happened: 20/21 root to 10
    assert (21, 10) in got


def test_components_batch_replay_idempotent(spark, tmp_path):
    from sutro_spark.streaming.clusters import components_batch, read_labels

    labels_dir = str(tmp_path / "labels")
    b0 = spark.createDataFrame(BATCHES[0], "id_a long, id_b long")
    b1 = spark.createDataFrame(BATCHES[1], "id_a long, id_b long")
    components_batch(b0, 0, labels_dir)
    components_batch(b1, 1, labels_dir)
    once = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    # re-deliver batch 1 (at-least-once): snapshot must not change —
    # the replay reads only snapshots < 1 and overwrites its own
    components_batch(b1, 1, labels_dir)
    again = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    assert once == again
    # replaying an OLD batch must not regress the current snapshot
    # (batch 0's rewrite lands in partition 0; latest is still 1)
    components_batch(b0, 0, labels_dir)
    assert {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    } == once


def test_composed_pairs_then_clusters_pipeline(spark, tmp_path):
    """The composed shape a real ingest runs: per micro-batch, near-dup
    pairs against the persisted index (jaccard_batch), then the label
    snapshot updated from those pairs (components_batch). Final labels
    must equal from-scratch CC over every pair the stream emitted."""
    from pyspark.sql import functions as F

    from sutro_spark.operators.cluster import connected_components
    from sutro_spark.streaming.clusters import components_batch, read_labels
    from sutro_spark.streaming.dedup import jaccard_batch

    docs = [
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "an entirely different document about spark plans")],
        [(3, "the quick brown fox jumps over the lazy dog today!"),
         (4, "yet another unrelated piece of text entirely")],
        [(5, "the quick brown fox jumps over the lazy dog")],
    ]
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "pairs")
    labels_dir = str(tmp_path / "labels")
    for bid, rows in enumerate(docs):
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        jaccard_batch(
            bdf, bid, index_dir, pairs_dir, threshold=0.3, max_df=None
        )
        # _read_or_empty: batch 0 writes an empty pairs partition
        # (no files), which a plain schema-inferring read rejects.
        # before_batch=bid+1 reads pairs-so-far — a superset of the
        # batch's own pairs; incremental_components is idempotent
        # over already-clustered edges, so the label result is
        # identical and the composition stays replay-safe
        from sutro_spark.streaming.dedup import _read_or_empty

        bpairs = (
            _read_or_empty(
                spark, pairs_dir,
                "corpus_id long, new_id long, jaccard double",
                before_batch=bid + 1,
            )
            .select(
                F.col("corpus_id").alias("id_a"),
                F.col("new_id").alias("id_b"),
            )
        )
        components_batch(bpairs, bid, labels_dir)

    got = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    from sutro_spark.streaming.dedup import _read_or_empty

    all_pairs = _read_or_empty(
        spark, pairs_dir, "corpus_id long, new_id long, jaccard double"
    ).select(
        F.col("corpus_id").alias("id_a"), F.col("new_id").alias("id_b")
    )
    want = {
        (r["node"], r["component"])
        for r in connected_components(all_pairs).collect()
    }
    assert got == want
    # docs 1, 3, 5 are near-dups across three different batches: one
    # cluster rooted at 1; unrelated docs never clustered
    assert (3, 1) in got and (5, 1) in got
    assert not any(n in (2, 4) for n, _ in got)
