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


def _read_or_empty(spark, path: str, schema: str) -> DataFrame:
    import os

    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


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
    batch operator's semantics on the corpus-so-far."""
    df_new = sh_n.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    df_total = (
        dfs.unionByName(df_new).groupBy("shingle").agg(F.sum("df").alias("df"))
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


def _read_table_or_empty(spark, table: str, schema: str) -> DataFrame:
    if spark.catalog.tableExists(table):
        return spark.table(table)
    return spark.createDataFrame([], schema)


def _append_bucketed(df: DataFrame, table: str, buckets: int, key: str) -> None:
    """Append to a managed parquet table bucketed (and sorted) by
    ``key`` — created on first use; later appends must (and do) carry
    the identical bucket spec, which Spark enforces."""
    (
        df.write.mode("append")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
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

    Returns a ``DataStreamWriter`` — caller picks trigger/checkpoint
    and ``.start()``s it.
    """
    from sutro_spark.operators.dedup import char_shingles

    post_dir = f"{index_dir}/postings"
    dfs_dir = f"{index_dir}/dfs"
    if index_buckets is not None and not index_table_prefix:
        raise ValueError("index_buckets requires index_table_prefix")
    post_table = f"{index_table_prefix}_postings" if index_table_prefix else None
    dfs_table = f"{index_table_prefix}_dfs" if index_table_prefix else None

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh_n = (
            char_shingles(batch_df, text_column, id_column, k)
            .persist()
        )
        try:
            if index_buckets is not None:
                postings = _read_table_or_empty(
                    spark, post_table, "shingle string, id long"
                )
                dfs = _read_table_or_empty(
                    spark, dfs_table, "shingle string, df long"
                )
            else:
                postings = _read_or_empty(
                    spark, post_dir, "shingle string, id long"
                )
                dfs = _read_or_empty(spark, dfs_dir, "shingle string, df long")
            pairs, df_new = probe_pairs(
                sh_n, postings, dfs, threshold=threshold, max_df=max_df
            )
            # pairs FIRST (reads the pre-batch index), then the index
            # appends — foreachBatch runs these actions sequentially
            pairs.write.mode("append").parquet(pairs_dir)
            if index_buckets is not None:
                _append_bucketed(
                    sh_n.select("shingle", "id"), post_table, index_buckets,
                    "shingle",
                )
                _append_bucketed(df_new, dfs_table, index_buckets, "shingle")
            else:
                sh_n.select("shingle", "id").write.mode("append").parquet(
                    post_dir
                )
                df_new.write.mode("append").parquet(dfs_dir)
        finally:
            sh_n.unpersist()

    return stream.writeStream.foreachBatch(process)
