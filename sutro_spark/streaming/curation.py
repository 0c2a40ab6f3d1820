"""Composed streaming curation: the pipeline that actually ships.

Each micro-batch runs the full curation gauntlet in ONE foreachBatch —
the per-stage streaming faces (dedup, quality, mixture) are each
stream==batch tested in isolation elsewhere; this composes them in the
order a 100 TB ingest pipeline runs them and asserts the COMPOSITION
equals its batch replay (tests/test_streaming_curation.py):

  1. Bloom decontamination flag — stateless in-scan projection against
     the broadcast-literal benchmark bitset (no join, no state; the
     exact shape of operators/decontaminate.bloom_contamination_flags).
  2. Near-dup probe — batch shingles vs the PERSISTED append-only
     postings index (streaming/dedup.py machinery), then the batch's
     own shingles append. A doc "has a near dup" iff it pairs with any
     earlier corpus doc at >= the Jaccard threshold.
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

Outputs under ``out_dir`` (all append-only):
  - ``docs/``     per-doc verdict (doc_id, maybe_contaminated, keep,
                  has_near_dup, survived)
  - ``pairs/``    (corpus_id, new_id, jaccard) near-dup pairs
  - ``mixture/``  per-batch (source, lang, n_docs, n_tokens) deltas
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.text import token_count
from sutro_spark.streaming.dedup import _read_or_empty, probe_pairs


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
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run one batch through the gauntlet against the CURRENT persisted
    index; returns (docs, pairs, mixture_delta) and appends the batch's
    shingles/dfs to the index (unless ``append_index=False``).

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

    spark = batch_df.sparkSession
    post_dir = f"{index_dir}/postings"
    dfs_dir = f"{index_dir}/dfs"

    flagged = bloom_contamination_flags(
        batch_df, bloom_words,
        text_column=text_column, id_column=id_column,
        n=n, bits_log2=bits_log2, hashes=hashes,
    )
    quality = gopher_quality(
        batch_df, text_column, id_column, rules=quality_rules
    ).select(id_column, "keep")

    sh_n = char_shingles(batch_df, text_column, id_column, k).persist()
    try:
        postings = _read_or_empty(spark, post_dir, "shingle string, id long")
        dfs = _read_or_empty(spark, dfs_dir, "shingle string, df long")
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
        docs_out = docs_out.localCheckpoint(eager=True)
        pairs = pairs.localCheckpoint(eager=True)
        mixture_delta = mixture_delta.localCheckpoint(eager=True)
        if append_index:
            sh_n.select("shingle", "id").write.mode("append").parquet(post_dir)
            df_new.write.mode("append").parquet(dfs_dir)
        return docs_out, pairs, mixture_delta
    finally:
        sh_n.unpersist()


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
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs, pairs, mixture = curate_batch(
            batch_df, bloom_words, index_dir, **kwargs
        )
        docs.write.mode("append").parquet(f"{out_dir}/docs")
        pairs.write.mode("append").parquet(f"{out_dir}/pairs")
        mixture.write.mode("append").parquet(f"{out_dir}/mixture")

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
