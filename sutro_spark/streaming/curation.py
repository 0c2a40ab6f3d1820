"""Composed streaming curation: the pipeline that actually ships.

Each micro-batch runs the full curation gauntlet in ONE foreachBatch —
the per-stage streaming faces (dedup, quality, mixture) are each
stream==batch tested in isolation elsewhere; this composes them in the
order a 100 TB ingest pipeline runs them and asserts the COMPOSITION
equals its batch replay (tests/test_streaming_curation.py):

  1. Bloom decontamination flag — stateless in-scan projection against
     the broadcast-literal benchmark bitset (no join, no state; the
     exact shape of operators/decontaminate.bloom_contamination_flags).
  2. Near-dup probe — batch shingles vs the PERSISTED postings index
     (streaming/dedup.py machinery), then the batch's own shingles
     append. A doc "has a near dup" iff it pairs with any earlier
     corpus doc at >= the Jaccard threshold.
  3. Gopher quality keep flag — stateless per-doc rules
     (operators/quality.gopher_quality).
  4. Mixture counts — per-(source, lang) doc/token increments over the
     SURVIVORS (clean + keep + no near-dup), appended; current totals
     are the groupBy-sum of appends, the same additive-state discipline
     as streaming/quality.py's model store.

Cheap stateless gates run first so the stateful/expensive stage (the
postings probe) sees fewer docs — but note the near-dup INDEX ingests
every doc regardless of its own verdict (a contaminated doc still
counts as "seen" for future dup detection; dropping it from the index
would let its later copies through unflagged).

Scale layout: pass ``index_buckets`` (+ ``index_table_prefix``) and the
postings/dfs index lives as managed parquet tables hash-bucketed by
``shingle`` (streaming/dedup.py's layout) — the per-batch probe joins
read the accumulated index co-located, shuffling ONLY the small batch
side, instead of re-exchanging the full 100 TB index on ``shingle``
every micro-batch as the flat-parquet layout must.

Replay idempotency: foreachBatch is at-least-once, so every one of the
five writes (docs/pairs/mixture outputs, postings/dfs index) is keyed
by ``__batch_id`` and lands as a dynamic-mode partition OVERWRITE,
while index reads take only partitions strictly below the current
batch (partition-pruned). A re-delivered micro-batch thus replaces its
own earlier (possibly partial) writes and recomputes against exactly
the pre-batch index — no duplicated pairs, no inflated dfs skewing the
``max_df`` cap, no double-counted mixture totals
(tests/test_streaming_curation.py replay test).

Outputs under ``out_dir`` (each ``__batch_id``-partitioned):
  - ``docs/``     per-doc verdict (doc_id, maybe_contaminated, keep,
                  has_near_dup, survived)
  - ``pairs/``    (corpus_id, new_id, jaccard) near-dup pairs
  - ``mixture/``  per-batch (source, lang, n_docs, n_tokens) deltas
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.text import token_count
from sutro_spark.streaming.dedup import (
    _append_bucketed,
    _read_or_empty,
    _read_table_or_empty,
    _write_batch_partition,
    probe_pairs,
)


def curate_batch(
    batch_df: DataFrame,
    bloom_words: list[int],
    index_dir: str,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    source_column: str = "source",
    lang_column: str = "lang",
    k: int = 8,
    threshold: float = 0.1,
    max_df: int | None = 100,
    n: int = 13,
    bits_log2: int = 17,
    hashes: int = 3,
    quality_rules: dict | None = None,
    append_index: bool = True,
    index_buckets: int | None = None,
    index_table_prefix: str | None = None,
    batch_id: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run one batch through the gauntlet against the CURRENT persisted
    index; returns (docs, pairs, mixture_delta) and appends the batch's
    shingles/dfs to the index (unless ``append_index=False``).

    ``index_buckets``/``index_table_prefix`` select the bucketed
    managed-table index layout; ``batch_id`` keys the index append (and
    the pre-batch read cutoff) for idempotent at-least-once replay —
    both are threaded through by :func:`streaming_curation`, and
    ``batch_id=None`` keeps the legacy append-only flat layout for
    direct batch use.

    Shared between the stream (foreachBatch calls it per micro-batch)
    and nothing else — the batch-replay test deliberately rebuilds the
    expectation from the INDEPENDENT batch operators
    (bloom_contamination_flags + incremental_jaccard_pairs +
    gopher_quality + a plain groupBy), so stream==batch is a real
    equality, not the same code called twice.
    """
    from sutro_spark.operators.dedup import char_shingles
    from sutro_spark.operators.decontaminate import bloom_contamination_flags
    from sutro_spark.operators.quality import gopher_quality

    if index_buckets is not None and not index_table_prefix:
        raise ValueError("index_buckets requires index_table_prefix")
    spark = batch_df.sparkSession
    post_dir = f"{index_dir}/postings"
    dfs_dir = f"{index_dir}/dfs"
    post_table = f"{index_table_prefix}_postings" if index_table_prefix else None
    dfs_table = f"{index_table_prefix}_dfs" if index_table_prefix else None

    flagged = bloom_contamination_flags(
        batch_df, bloom_words,
        text_column=text_column, id_column=id_column,
        n=n, bits_log2=bits_log2, hashes=hashes,
    )
    quality = gopher_quality(
        batch_df, text_column, id_column, rules=quality_rules
    ).select(id_column, "keep")

    # bucket-co-location contract (see dedup._bucket_parallelism): the
    # batch's shuffles run at the index's bucket count, or the planner
    # re-exchanges the accumulated index instead
    from sutro_spark.streaming.dedup import _bucket_parallelism

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
        dup_ids = pairs.select(F.col("new_id").alias(id_column)).distinct()
        docs = (
            flagged.select(
                id_column,
                source_column,
                lang_column,
                token_count(F.col(text_column)).alias("__tokens"),
                F.col("__maybe_contaminated").alias("maybe_contaminated"),
            )
            .join(quality, id_column)
            .join(
                dup_ids.withColumn("has_near_dup", F.lit(1)), id_column, "left"
            )
            .withColumn("has_near_dup", F.coalesce("has_near_dup", F.lit(0)))
            .withColumn(
                "survived",
                (
                    (F.col("maybe_contaminated") == 0)
                    & (F.col("keep") == 1)
                    & (F.col("has_near_dup") == 0)
                ).cast("int"),
            )
        )
        mixture_delta = (
            docs.where(F.col("survived") == 1)
            .groupBy(
                F.col(source_column).alias("source"),
                F.col(lang_column).alias("lang"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("__tokens").alias("n_tokens"),
            )
        )
        docs_out = docs.select(
            id_column, "maybe_contaminated", "keep", "has_near_dup", "survived"
        )
        # materialize BEFORE the index append so every output reflects
        # the pre-batch index (foreachBatch runs these sequentially)
        docs_out = docs_out.transform(_barrier)
        pairs = pairs.transform(_barrier)
        mixture_delta = mixture_delta.transform(_barrier)
        if append_index:
            if index_buckets is not None:
                _append_bucketed(
                    sh_n.select("shingle", "id"), post_table, index_buckets,
                    "shingle", batch_id=batch_id,
                )
                _append_bucketed(
                    df_new, dfs_table, index_buckets, "shingle",
                    batch_id=batch_id,
                )
            elif batch_id is not None:
                _write_batch_partition(
                    sh_n.select("shingle", "id"), post_dir, batch_id
                )
                _write_batch_partition(df_new, dfs_dir, batch_id)
            else:
                sh_n.select("shingle", "id").write.mode("append").parquet(
                    post_dir
                )
                df_new.write.mode("append").parquet(dfs_dir)
        return docs_out, pairs, mixture_delta
    finally:
        if sh_n is not None:
            sh_n.unpersist()
        if ctx is not None:
            ctx.__exit__(None, None, None)


def curate_and_write(
    batch_df: DataFrame,
    batch_id: int,
    bloom_words: list[int],
    index_dir: str,
    out_dir: str,
    **kwargs,
) -> None:
    """One full micro-batch of :func:`streaming_curation` — compute the
    verdicts against the pre-batch index, overwrite this batch's output
    partitions, then overwrite this batch's index partitions. Exposed
    at module level so the at-least-once replay contract is directly
    testable: calling this twice with the same ``(batch_df, batch_id)``
    leaves all five sinks byte-identical to calling it once."""
    docs, pairs, mixture = curate_batch(
        batch_df, bloom_words, index_dir, batch_id=batch_id, **kwargs
    )
    _write_batch_partition(docs, f"{out_dir}/docs", batch_id)
    _write_batch_partition(pairs, f"{out_dir}/pairs", batch_id)
    _write_batch_partition(mixture, f"{out_dir}/mixture", batch_id)


def streaming_curation(
    stream: DataFrame,
    bloom_words: list[int],
    index_dir: str,
    out_dir: str,
    **kwargs,
):
    """The composed pipeline as a ``DataStreamWriter`` — caller picks
    trigger/checkpoint and ``.start()``s it. ``bloom_words`` is the
    driver-built benchmark bitset (decontaminate.bloom_bitset); the
    benchmark is fixed for the stream's lifetime, the corpus never is.
    Pass ``index_buckets``/``index_table_prefix`` for the bucketed
    index layout (see module docstring); every write is keyed by the
    foreachBatch ``batch_id`` for idempotent replay either way.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        curate_and_write(
            batch_df, batch_id, bloom_words, index_dir, out_dir, **kwargs
        )

    return stream.writeStream.foreachBatch(process)


def current_mixture(spark, out_dir: str) -> DataFrame:
    """(source, lang, n_docs, n_tokens) totals — groupBy-sum of the
    append-only per-batch deltas."""
    deltas = _read_or_empty(
        spark,
        f"{out_dir}/mixture",
        "source string, lang string, n_docs long, n_tokens long",
    )
    return deltas.groupBy("source", "lang").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
