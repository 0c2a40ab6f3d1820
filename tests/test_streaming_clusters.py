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


def test_delta_writes_are_batch_sized_and_compaction_folds(spark, tmp_path):
    """r10 (verdict #2): a batch that merges nothing new writes O(batch)
    rows, not the whole label table; a compaction batch writes the full
    table flagged __full; the fold reads back the same state either way."""
    from sutro_spark.streaming.clusters import (
        components_batch,
        prune_label_history,
        read_labels,
    )

    labels_dir = str(tmp_path / "labels")
    schema = "id_a long, id_b long"
    # batch 0 (full by construction): a 100-node chain -> 100 labels
    b0 = spark.createDataFrame([(i, i + 1) for i in range(100)], schema)
    components_batch(b0, 0, labels_dir, compact_every=4)
    # batch 1: pairs entirely INSIDE the existing cluster -> no label
    # changes -> empty delta partition (nothing to write)
    b1 = spark.createDataFrame([(0, 5), (7, 9)], schema)
    components_batch(b1, 1, labels_dir, compact_every=4)
    part1 = tmp_path / "labels" / "__batch_id=1"
    n1 = (
        spark.read.parquet(str(part1)).count() if part1.exists() else 0
    )
    assert n1 == 0, f"no-merge batch wrote {n1} labels"
    # batch 2: one new tiny component -> delta is just its nodes
    b2 = spark.createDataFrame([(500, 501)], schema)
    components_batch(b2, 2, labels_dir, compact_every=4)
    n2 = spark.read.parquet(str(tmp_path / "labels" / "__batch_id=2")).count()
    # labels are star edges (roots carry no row): one row for 501->500
    assert n2 == 1, f"delta should be 1 row, got {n2}"
    # batch 3: merge the tiny component into the chain -> delta covers
    # only the relabeled nodes (the 2 tiny ones), not the 100-chain
    b3 = spark.createDataFrame([(501, 3)], schema)
    components_batch(b3, 3, labels_dir, compact_every=4)
    n3 = spark.read.parquet(str(tmp_path / "labels" / "__batch_id=3")).count()
    assert 0 < n3 <= 4, f"merge delta should be tiny, got {n3}"
    state_before = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    # batch 4: compaction point (4 % 4 == 0) -> full rewrite
    b4 = spark.createDataFrame([(600, 601)], schema)
    components_batch(b4, 4, labels_dir, compact_every=4)
    snap4 = spark.read.parquet(str(tmp_path / "labels" / "__batch_id=4"))
    assert snap4.count() == len(state_before) + 1
    assert snap4.select("__full").distinct().collect()[0][0] is True
    # retention: everything below the full snapshot is prunable, and
    # the fold is unchanged afterwards
    state_full = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    # safety (r11, ADVICE): batch 4's full snapshot is the NEWEST
    # partition, i.e. exactly the batch that could still replay — an
    # unqualified prune must refuse (a replay of 4 would otherwise
    # read an empty history and overwrite the snapshot with only its
    # own pairs)
    assert prune_label_history(labels_dir) == 0
    replay_sees = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir, before_batch=4).collect()
    }
    assert replay_sees == state_before
    # with an explicit committed horizon the shadowed history goes:
    # batches 0, 2, 3 (batch 1's empty delta wrote no partition)
    pruned = prune_label_history(labels_dir, committed_batch=4)
    assert pruned == 3
    assert {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    } == state_full
    # batch 5 lands above the snapshot -> snapshot provably committed
    # -> unqualified prune is now allowed (nothing below 4 remains)
    b5 = spark.createDataFrame([(700, 701)], schema)
    components_batch(b5, 5, labels_dir, compact_every=4)
    assert prune_label_history(labels_dir) == 0
    assert {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    } == state_full | {(701, 700)}


def test_read_labels_tolerates_legacy_full_snapshot_layout(spark, tmp_path):
    """r11 (ADVICE): a labels_dir written by the pre-r10 format (full
    table every batch, no __full column) must fold, not fail — every
    legacy partition is treated as a full snapshot, so the newest one
    wins and an in-place upgrade keeps running."""
    from sutro_spark.streaming.clusters import (
        components_batch,
        prune_label_history,
        read_labels,
    )
    from sutro_spark.streaming.dedup import _write_batch_partition

    labels_dir = str(tmp_path / "labels")
    old0 = spark.createDataFrame([(2, 1), (3, 1)], "node long, component long")
    old1 = spark.createDataFrame(
        [(2, 1), (3, 1), (5, 4)], "node long, component long"
    )
    _write_batch_partition(old0, labels_dir, 0)
    _write_batch_partition(old1, labels_dir, 1)
    got = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    assert got == {(2, 1), (3, 1), (5, 4)}
    # legacy partitions count as full snapshots for retention too, but
    # the newest one is never a safe horizon without a committed mark
    assert prune_label_history(labels_dir) == 0
    assert prune_label_history(labels_dir, committed_batch=1) == 1
    # a post-upgrade delta batch folds on top of the legacy snapshot
    b2 = spark.createDataFrame([(5, 2)], "id_a long, id_b long")
    components_batch(b2, 2, labels_dir, compact_every=1000)
    got2 = {
        (r["node"], r["component"])
        for r in read_labels(spark, labels_dir).collect()
    }
    assert got2 == {(2, 1), (3, 1), (4, 1), (5, 1)}
