"""Streaming duplicate-cluster maintenance: the label-table face of
operators/cluster.incremental_components, run per micro-batch over a
near-dup PAIRS stream (the output of streaming_jaccard_pairs) so the
cluster assignment is continuously current without ever re-reading
the accumulated pair set.

Snapshot layout under ``labels_dir`` (r10 — delta writes): each
micro-batch writes under ``__batch_id=N/`` via dynamic partition
overwrite — so a replayed batch replaces exactly its own partition
(at-least-once -> exactly-once-equivalent, the streaming/dedup.py
convention). What a batch writes is ONLY the labels that CHANGED
against the prior state (anti-join on (node, component) — CC merges
touch few components per batch, so a quiet batch writes O(batch), not
O(corpus)), except every ``compact_every``-th batch, which writes the
FULL table flagged ``__full=true`` — the periodic compaction that
bounds the fold chain. The current assignment is the fold "latest
full snapshot, then later deltas, newest row per node wins" — one
bounded ``max_by`` groupBy in :func:`read_labels`.

Why this is the 100 TB shape: the pair set grows without bound
(every batch appends candidates) and the label table is one row per
corpus document — so writing the full table per trigger would be an
O(corpus) write per MINUTE. Deltas make the steady-state write
proportional to what actually merged; re-clustering FROM LABELS
converges in ~2 large-star/small-star rounds because the carried part
is already star-shaped. Cost per batch: O(|changed| + |batch pairs|)
written, O(|labels|) read (states must be read to merge — that part
is irreducible).

Equality contract (pytest-asserted): the final fold equals
connected_components over the union of every batch's pairs, and a
no-merge batch writes O(batch) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.streaming.dedup import _write_batch_partition

__all__ = [
    "components_batch",
    "prune_label_history",
    "read_labels",
    "streaming_components",
]

_LABEL_SCHEMA = "node long, component long"


def _has_parquet(labels_dir: str) -> bool:
    import os

    if not os.path.isdir(labels_dir):
        return False
    for _root, _dirs, files in os.walk(labels_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def read_labels(spark, labels_dir: str, *, before_batch: int | None = None) -> DataFrame:
    """The current (node, component) assignment: fold of the latest
    ``__full`` snapshot plus every later delta (strictly below
    ``before_batch`` when given — what a replayed batch must see,
    replay isolation), newest row per node winning. Empty frame when
    no snapshot exists yet.

    Partitions below the latest full snapshot are PRUNED from the
    scan (``__batch_id >= latest_full`` is a partition filter), so
    the fold reads O(|labels| + deltas since compaction), regardless
    of stream age. When no full snapshot exists below the horizon the
    fold runs over all visible deltas — still correct, because the
    first batch's "delta" against an empty prior is the full table.
    """
    if not _has_parquet(labels_dir):
        return spark.createDataFrame([], _LABEL_SCHEMA)
    # mergeSchema: a labels_dir written by the pre-delta layout has
    # partitions WITHOUT the __full column; a plain read would infer
    # the legacy schema from one such file and silently drop the flag
    # on the post-upgrade partitions. Footer-merge cost is bounded —
    # retention keeps only partitions at/above the last compaction.
    snaps = spark.read.option("mergeSchema", "true").parquet(labels_dir)
    if "__full" not in snaps.columns:
        # pure-legacy dir: every batch wrote the full table
        snaps = snaps.withColumn("__full", F.lit(True))
    else:
        # mixed dir: legacy rows surface as null __full -> full
        snaps = snaps.withColumn(
            "__full", F.coalesce(F.col("__full"), F.lit(True))
        )
    if before_batch is not None:
        snaps = snaps.where(F.col("__batch_id") < F.lit(int(before_batch)))
    base = snaps.agg(
        F.max(F.when(F.col("__full"), F.col("__batch_id"))).alias("f"),
        F.max("__batch_id").alias("m"),
    ).first()
    if base["m"] is None:
        return spark.createDataFrame([], _LABEL_SCHEMA)
    if base["f"] is not None:
        snaps = snaps.where(F.col("__batch_id") >= F.lit(int(base["f"])))
    return snaps.groupBy(F.col("node").cast("long").alias("node")).agg(
        F.max_by(F.col("component").cast("long"), F.col("__batch_id")).alias(
            "component"
        )
    )


def components_batch(
    batch_pairs: DataFrame,
    batch_id: int,
    labels_dir: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    compact_every: int = 16,
) -> None:
    """One micro-batch: prior state + this batch's pairs ->
    incremental CC -> write the CHANGED labels (or, every
    ``compact_every``-th batch, the full table as a compaction
    point). Exposed at module level so replay idempotency is directly
    testable: calling this twice with the same (batch_pairs,
    batch_id) leaves ``labels_dir`` semantically identical to calling
    it once (the delta is a deterministic function of prior state +
    batch, and the prior state read excludes the batch's own
    partition)."""
    from sutro_spark.operators.cluster import incremental_components

    if compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")
    spark = batch_pairs.sparkSession
    prior = read_labels(spark, labels_dir, before_batch=batch_id)
    labels = incremental_components(prior, batch_pairs, src, dst)
    full = int(batch_id) % compact_every == 0
    out = labels if full else labels.join(prior, ["node", "component"], "left_anti")
    _write_batch_partition(
        out.withColumn("__full", F.lit(full)), labels_dir, batch_id
    )


def prune_label_history(
    labels_dir: str, *, committed_batch: int | None = None
) -> int:
    """Retention: delete ``__batch_id=N`` partitions strictly below
    a COMMITTED full snapshot — they are shadowed by the compaction
    point and can never be read again by :func:`read_labels` without
    a ``before_batch`` horizon below it. Returns the number of
    partitions removed.

    Safety is enforced in code, not just documented: in foreachBatch,
    the MOST RECENT batch is exactly the one that can still replay,
    and a replay of batch N reads ``read_labels(before_batch=N)`` —
    so pruning below a full snapshot that IS the newest partition
    would hand that replay an empty history and let it overwrite the
    compaction point with only its own pairs, losing all accumulated
    state. The horizon is therefore the newest full snapshot that
    already has at least one LATER partition above it (that later
    write proves the compaction batch committed); pass
    ``committed_batch`` (e.g. from the sink's commit log) to prune up
    to the newest full snapshot ``<= committed_batch`` instead."""
    import os
    import re
    import shutil

    if not os.path.isdir(labels_dir):
        return 0
    parts: dict[int, str] = {}
    for name in os.listdir(labels_dir):
        m = re.fullmatch(r"__batch_id=(\d+)", name)
        if m:
            parts[int(m.group(1))] = os.path.join(labels_dir, name)
    # a partition is a full snapshot iff it was written with
    # __full=true; the flag is constant per partition, so one
    # footer-level peek per partition suffices
    import pyarrow.parquet as pq

    full_ids = []
    for bid, path in parts.items():
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not files:
            continue
        fpath = os.path.join(path, files[0])
        if "__full" not in pq.read_schema(fpath).names:
            full_ids.append(bid)  # legacy layout: every batch is full
            continue
        t = pq.read_table(fpath, columns=["__full"])
        if t.num_rows and t.column("__full")[0].as_py():
            full_ids.append(bid)
    if not full_ids:
        return 0
    if committed_batch is not None:
        safe = [b for b in full_ids if b <= int(committed_batch)]
    else:
        # a full snapshot is provably committed once any later batch
        # has written above it (foreachBatch replays only the newest)
        newest = max(parts)
        safe = [b for b in full_ids if b < newest]
    if not safe:
        return 0
    horizon = max(safe)
    pruned = 0
    for bid, path in parts.items():
        if bid < horizon:
            shutil.rmtree(path)
            pruned += 1
    return pruned


def streaming_components(
    pairs_stream: DataFrame,
    labels_dir: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    compact_every: int = 16,
):
    """foreachBatch writer maintaining the cluster label state over a
    candidate-pairs stream (delta writes + periodic compaction).
    Returns a ``DataStreamWriter`` — caller picks trigger/checkpoint
    and ``.start()``s it."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        components_batch(
            batch_df, batch_id, labels_dir, src=src, dst=dst,
            compact_every=compact_every,
        )

    return pairs_stream.writeStream.foreachBatch(process)
