"""Streaming mixture monitoring: the Structured Streaming face of
operators/mixture.py — running per-(source, lang) document and token
counts over an ingest stream, so the mixture report (and any drift
alert built on it, cf. ``mixture_drift``) updates per trigger instead
of per batch-job.

State is one row per (source, lang) stratum — bounded by mixture
cardinality, not stream length — and the aggregation is the same
map-side-combinable sum shape as the batch report, so the streaming
state equals ``source_mix``'s counts over everything ingested
(asserted in tests; token share needs the corpus total, a consumer-side
division over the emitted counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.text import token_count

__all__ = ["streaming_source_counts"]


def streaming_source_counts(
    stream: DataFrame,
    source_column: str = "source",
    lang_column: str = "lang",
    text_column: str = "text",
) -> DataFrame:
    """Running (source, lang) → (n_docs, n_tokens) over a stream. Run
    with ``outputMode("complete")`` (strata count is tiny) or
    ``update`` for changed rows only."""
    return (
        stream.groupBy(
            F.col(source_column).alias("source"), F.col(lang_column).alias("lang")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_column))).alias("n_tokens"),
        )
    )
