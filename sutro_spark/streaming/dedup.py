"""Streaming exact dedup: the streaming face of
sutro_spark/operators/dedup.py's exact_dedup, for ingest-time
pipelines (keep the first arrival of each content digest, drop later
copies as they stream in).

State discipline is the whole design: ``dropDuplicatesWithinWatermark``
keys the dedup state by digest and EVICTS entries once the watermark
passes them — the query runs forever at constant memory, bounded by
(duplicate horizon × arrival rate), not corpus size. The no-timestamp
variant (plain ``dropDuplicates``) keeps every digest ever seen and is
only sane for bounded replays; production ingest should always have an
event time.

The digest is the same sha2-over-concatenated-columns key exact_dedup
shuffles on, so batch and stream agree on what "duplicate" means —
the unit test asserts stream output == batch distinct set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: separator matching operators/dedup.py's digest recipe
_SEP = "\x1f"


def content_digest(columns: list[str]) -> F.Column:
    """sha256 over the null-coalesced, unit-separator-joined columns."""
    return F.sha2(
        F.concat_ws(_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]),
        256,
    )


def streaming_dedup(
    stream: DataFrame,
    columns: list[str],
    *,
    ts_column: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival dedup on the content digest of ``columns``.

    With ``ts_column`` (a timestamp column): watermark +
    ``dropDuplicatesWithinWatermark`` — duplicates separated by more
    than the watermark horizon are NOT collapsed (they are different
    "occurrences" as far as bounded state can know); choose the horizon
    to cover your real duplicate window. Without it: unbounded-state
    ``dropDuplicates`` for bounded replays only.
    """
    keyed = stream.withColumn("__digest", content_digest(columns))
    if ts_column is not None:
        return keyed.withWatermark(ts_column, watermark).dropDuplicatesWithinWatermark(
            ["__digest"]
        )
    return keyed.dropDuplicates(["__digest"])


def _schema_columns(schema: str) -> list[str]:
    return [part.strip().split()[0] for part in schema.split(",")]


def _read_or_empty(
    spark, path: str, schema: str, *, before_batch: int | None = None
) -> DataFrame:
    """Read a flat or ``__batch_id=N/``-partitioned parquet dir, or an
    empty frame if nothing is there yet. ``schema`` lists the DATA
    columns only; a discovered ``__batch_id`` partition column is used
    for the ``before_batch`` pruning filter (replay isolation: a
    re-delivered micro-batch must not see its own earlier partial
    append) and then dropped, so callers see the same shape under
    either layout."""
    import os

    found = False
    if os.path.isdir(path):
        for _root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                found = True
                break
    if not found:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(path)
    if before_batch is not None and "__batch_id" in df.columns:
        df = df.where(F.col("__batch_id") < F.lit(int(before_batch)))
    return df.select(*_schema_columns(schema))


def probe_pairs(
    sh_n: DataFrame,
    postings: DataFrame,
    dfs: DataFrame,
    *,
    threshold: float,
    max_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Compare one batch's shingles (``sh_n``: shingle, id) against the
    persisted postings index; returns (pairs, df_new) where pairs =
    (corpus_id, new_id, jaccard >= threshold) and df_new is the batch's
    per-shingle df increment (the caller appends it). The shared probe
    core of :func:`streaming_jaccard_pairs` and the composed
    streaming/curation.py pipeline — the ``max_df`` cap is re-evaluated
    against the CURRENT total df (index + this batch), matching the
    batch operator's semantics on the corpus-so-far.

    The df rollup merges the persisted per-batch increments with this
    batch's via aggregate-then-FULL-OUTER-join rather than
    union-then-groupBy: a union would erase the dfs table's bucketed
    distribution and re-Exchange the accumulated index on ``shingle``
    every micro-batch, while the join (and the dfs-side pre-aggregate,
    both keyed on the bucket column) reads the bucketed layout
    co-located — only the small batch side shuffles (plan-shape
    pytest). Same result either way: per-shingle sum over index + batch
    with full key coverage."""
    df_new = sh_n.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    df_total = (
        dfs.groupBy("shingle")
        .agg(F.sum("df").alias("df_idx"))
        .join(df_new.withColumnRenamed("df", "df_batch"), "shingle", "full_outer")
        .select(
            "shingle",
            (
                F.coalesce("df_idx", F.lit(0)) + F.coalesce("df_batch", F.lit(0))
            ).alias("df"),
        )
    )
    valid = (
        df_total.where(F.col("df") <= max_df).select("shingle")
        if max_df is not None
        else df_total.select("shingle")
    )
    sh_nv = sh_n.join(valid, "shingle")
    matched = postings.join(sh_nv.select("shingle").distinct(), "shingle")
    inter = (
        matched.select(F.col("id").alias("corpus_id"), "shingle")
        .join(sh_nv.select(F.col("id").alias("new_id"), "shingle"), "shingle")
        .groupBy("corpus_id", "new_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    nc = (
        postings.join(
            inter.select(F.col("corpus_id").alias("id")).distinct(), "id"
        )
        .join(valid, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("nc"))
        .withColumnRenamed("id", "corpus_id")
    )
    nn = (
        sh_nv.groupBy("id")
        .agg(F.count(F.lit(1)).alias("nn"))
        .withColumnRenamed("id", "new_id")
    )
    pairs = (
        inter.join(nc, "corpus_id")
        .join(nn, "new_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("nc") + F.col("nn") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("corpus_id", "new_id", "jaccard")
    )
    return pairs, df_new


def _read_table_or_empty(
    spark, table: str, schema: str, *, before_batch: int | None = None
) -> DataFrame:
    """Managed-table twin of :func:`_read_or_empty`: same
    ``before_batch`` replay-isolation pruning (free — ``__batch_id`` is
    the table's partition column), same data-columns-only shape."""
    if spark.catalog.tableExists(table):
        df = spark.table(table)
        if before_batch is not None and "__batch_id" in df.columns:
            df = df.where(F.col("__batch_id") < F.lit(int(before_batch)))
        return df.select(*_schema_columns(schema))
    return spark.createDataFrame([], schema)


def _append_bucketed(
    df: DataFrame, table: str, buckets: int, key: str,
    *, batch_id: int | None = None,
) -> None:
    """Append to a managed parquet table bucketed (and sorted) by
    ``key`` — created on first use; later appends must (and do) carry
    the identical bucket spec, which Spark enforces.

    With ``batch_id`` the table is ALSO partitioned by ``__batch_id``
    and the write is a dynamic-mode partition OVERWRITE of that batch's
    partition: replaying a micro-batch replaces its own earlier
    (possibly partial) rows instead of double-appending. Bucketing is
    table-level, so scans still coalesce same-numbered bucket files
    across every batch partition — the co-located, no-Exchange probe
    property survives the partitioning (plan-shape pytest).
    ``insertInto`` matches positionally: ``df``'s column order must
    equal the table's data-column order (it does for every caller —
    they all build the frame the same way every batch)."""
    if batch_id is None:
        (
            df.write.mode("append")
            .bucketBy(buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(table)
        )
        return
    spark = df.sparkSession
    dfb = df.withColumn("__batch_id", F.lit(int(batch_id)))
    if not spark.catalog.tableExists(table):
        (
            dfb.write.partitionBy("__batch_id")
            .bucketBy(buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(table)
        )
        return
    _with_dynamic_overwrite(
        spark, lambda: dfb.write.insertInto(table, overwrite=True)
    )


class _bucket_parallelism:
    """Context manager enforcing the bucket-co-location contract: the
    probe query's shuffles run at the index's bucket count. Spark only
    reuses a bucketed layout when the join's partition count equals the
    bucket count — with a mismatched ``spark.sql.shuffle.partitions``,
    batch-side aggregates land at the session parallelism and the
    planner re-exchanges the ACCUMULATED INDEX to meet them (measured:
    'Bucketed: false (disabled by query planner)' + a full index
    shuffle), which is precisely the scale-killer the bucketed layout
    exists to remove. At production scale choose ``index_buckets`` as
    the target shuffle parallelism for the ingest job (thousands for a
    100 TB index), so this override IS the right parallelism, not a
    constraint."""

    def __init__(self, spark, buckets: int):
        self.spark = spark
        self.buckets = buckets

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.buckets))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def _with_dynamic_overwrite(spark, write_fn) -> None:
    """Run ``write_fn`` under partitionOverwriteMode=dynamic, restoring
    the previous mode after. Session-global conf: concurrent writers on
    the SAME SparkSession could observe the temporary mode — fine for
    foreachBatch (one driver thread per query), documented for anyone
    sharing a session across streams."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        write_fn()
    finally:
        spark.conf.set(key, prev)


def _write_batch_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent flat-dir append: rows land under
    ``__batch_id={batch_id}/`` via dynamic partition overwrite, so a
    replayed micro-batch replaces exactly its own earlier partition and
    every other batch's rows are untouched."""
    spark = df.sparkSession
    dfb = df.withColumn("__batch_id", F.lit(int(batch_id)))
    _with_dynamic_overwrite(
        spark,
        lambda: dfb.write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(path),
    )


def streaming_jaccard_pairs(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 8,
    threshold: float = 0.1,
    max_df: int | None = 100,
    index_buckets: int | None = None,
    index_table_prefix: str | None = None,
):
    """Streaming incremental near-dup: each micro-batch of documents is
    compared against the PERSISTED shingle-postings index (never against
    raw corpus text), emits (corpus_id, new_id, jaccard) pairs, then
    appends its own shingles to the index — the continuous-ingest face
    of operators/dedup.incremental_jaccard_pairs, and exactly equal to
    replaying that batch operator over the same micro-batch sequence
    (pytest-asserted).

    Index layout under ``index_dir`` (both append-only, so no
    rewrite-while-reading races):
      - ``postings/``  (shingle, id)        — the inverted index
      - ``dfs/``       (shingle, df)        — per-batch df increments;
                        current df = sum over appends
    Pair output appends to ``pairs_dir``.

    Per-batch cost is bounded by (new-batch shingles × matching
    postings) for the intersection, plus one scan of the postings of
    MATCHED corpus docs for their capped sizes. The ``max_df`` cap is
    re-evaluated against the CURRENT total df each batch (boilerplate
    shingles age out of pair generation as their df crosses the cap),
    matching the batch operator's semantics on the corpus-so-far.

    Scale layout: pass ``index_buckets`` (+ ``index_table_prefix``) to
    keep postings and dfs as managed parquet tables hash-bucketed by
    ``shingle`` instead of flat parquet dirs. Every per-batch join on
    ``shingle`` (the probe, the size lookup's valid filter, the df
    rollup) then reads the index co-located: ONLY the small batch side
    shuffles into the index's bucketing — the accumulated index (the
    100 TB side) is never exchanged, which the plan-shape pytest
    asserts. Appends carry the same bucket spec, so the layout
    survives indefinite ingest.

    Replay idempotency: foreachBatch is at-least-once, so every write
    is keyed by ``__batch_id`` — pair output and index appends land as
    a dynamic-mode OVERWRITE of that batch's partition, and the probe
    reads only index partitions with ``__batch_id`` strictly below the
    current batch (partition-pruned, so the filter costs nothing). A
    re-delivered micro-batch therefore replaces its own earlier
    (possibly partial) writes and recomputes against exactly the
    pre-batch index — byte-identical to the first delivery, instead of
    duplicated pairs and inflated dfs (see
    tests/test_streaming_dedup.py replay test).

    Returns a ``DataStreamWriter`` — caller picks trigger/checkpoint
    and ``.start()``s it.
    """
    if index_buckets is not None and not index_table_prefix:
        raise ValueError("index_buckets requires index_table_prefix")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        jaccard_batch(
            batch_df, batch_id, index_dir, pairs_dir,
            text_column=text_column, id_column=id_column, k=k,
            threshold=threshold, max_df=max_df,
            index_buckets=index_buckets,
            index_table_prefix=index_table_prefix,
        )

    return stream.writeStream.foreachBatch(process)


def jaccard_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 8,
    threshold: float = 0.1,
    max_df: int | None = 100,
    index_buckets: int | None = None,
    index_table_prefix: str | None = None,
) -> None:
    """One micro-batch of :func:`streaming_jaccard_pairs`, exposed at
    module level so the at-least-once replay contract is directly
    testable: calling this twice with the same ``(batch_df, batch_id)``
    leaves outputs and index byte-identical to calling it once."""
    from sutro_spark.operators.dedup import char_shingles

    spark = batch_df.sparkSession
    post_dir = f"{index_dir}/postings"
    dfs_dir = f"{index_dir}/dfs"
    post_table = f"{index_table_prefix}_postings" if index_table_prefix else None
    dfs_table = f"{index_table_prefix}_dfs" if index_table_prefix else None

    ctx = (
        _bucket_parallelism(spark, index_buckets)
        if index_buckets is not None
        else None
    )
    if ctx is not None:
        ctx.__enter__()
    # persist INSIDE the try: a failure here must still restore the
    # shuffle-partitions conf in finally, or the override leaks into
    # the whole session
    sh_n = None
    try:
        sh_n = char_shingles(batch_df, text_column, id_column, k).persist()
        if index_buckets is not None:
            postings = _read_table_or_empty(
                spark, post_table, "shingle string, id long",
                before_batch=batch_id,
            )
            dfs = _read_table_or_empty(
                spark, dfs_table, "shingle string, df long",
                before_batch=batch_id,
            )
        else:
            postings = _read_or_empty(
                spark, post_dir, "shingle string, id long",
                before_batch=batch_id,
            )
            dfs = _read_or_empty(
                spark, dfs_dir, "shingle string, df long",
                before_batch=batch_id,
            )
        pairs, df_new = probe_pairs(
            sh_n, postings, dfs, threshold=threshold, max_df=max_df
        )
        # pairs FIRST (reads the pre-batch index), then the index
        # appends — foreachBatch runs these actions sequentially
        _write_batch_partition(pairs, pairs_dir, batch_id)
        if index_buckets is not None:
            _append_bucketed(
                sh_n.select("shingle", "id"), post_table, index_buckets,
                "shingle", batch_id=batch_id,
            )
            _append_bucketed(
                df_new, dfs_table, index_buckets, "shingle",
                batch_id=batch_id,
            )
        else:
            _write_batch_partition(
                sh_n.select("shingle", "id"), post_dir, batch_id
            )
            _write_batch_partition(df_new, dfs_dir, batch_id)
    finally:
        if sh_n is not None:
            sh_n.unpersist()
        if ctx is not None:
            ctx.__exit__(None, None, None)
