"""Streaming distribution-drift monitor: the Structured Streaming
face of functions/stats.histogram_drift — running per-bin counts of a
numeric column over an ingest stream, binned against a FROZEN
reference histogram, so "has this batch's price/length/score
distribution wandered off the training reference?" updates per
trigger instead of per batch job.

Split mirrors the repo's sketch streaming (streaming/sketches.py,
hll_registers/hll_from_registers): the stream maintains only the
mergeable state (per-bin running counts — |bins| rows, bounded by the
bin count, never by stream length), and a batch finisher computes the
drift number from that state plus the reference counts. The finisher
applied to the stream's final state equals `histogram_drift(...,
range_on="old")` over everything ingested — asserted in
tests/test_streaming_drift.py.

The reference (lo, w, per-bin counts, n) is computed ONCE from the
static reference table and broadcast into the stream projection; bins
are therefore fixed before any new data exists, which is exactly the
monitor's semantics (the batch op's range_on="old" convention). New
values outside the reference range fall into out-of-range bin ids
(FLOOR-division semantics — above-range extends past bins-1, each
below-range width lands in its own negative bin, never merged with
bin 0) and count toward drift like any other mass difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "reference_histogram",
    "streaming_bin_counts",
    "drift_from_counts",
    "psi_from_counts",
]

# Floor-division binning. Spark's `div` truncates toward zero, so a
# below-range value in (lo - w, lo) would collapse into bin 0 (the
# reference's first bin) and deeper below-range values would land one
# bin high. Floor semantics give every below-range value its own
# negative bin id, matching the docstring contract (and DuckDB's `//`,
# which already floors — keeping the oracle comparable).
_FLOOR_BIN = (
    "CAST(CASE WHEN c >= lo THEN (c - lo) div w "
    "ELSE -(((lo - c) + w - 1) div w) END AS BIGINT)"
)


def _cents(df: DataFrame, value_column: str) -> DataFrame:
    return df.select(
        F.round(F.col(value_column) * 100).cast("long").alias("c")
    ).where(F.col("c").isNotNull())


def reference_histogram(
    reference: DataFrame, value_column: str, *, bins: int = 20
) -> tuple[DataFrame, DataFrame]:
    """(range, counts) of the frozen reference: ``range`` is one row
    (lo, w) with w = ceil(range/bins); ``counts`` is (bin, c_ref).
    Both are tiny and broadcastable; compute once, reuse across every
    micro-batch and the finisher."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    o = _cents(reference, value_column)
    rng = o.agg(F.min("c").alias("lo"), F.max("c").alias("hi")).select(
        "lo",
        F.expr(f"CAST((hi - lo + {bins}) div {bins} AS BIGINT)").alias("w"),
    )
    counts = (
        o.crossJoin(F.broadcast(rng))
        .select(F.expr(_FLOOR_BIN).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ref"))
    )
    return rng, counts


def streaming_bin_counts(
    stream: DataFrame, rng: DataFrame, value_column: str
) -> DataFrame:
    """Running per-bin counts of the stream under the frozen reference
    bins — state is |bins| rows regardless of stream length. Run with
    ``outputMode("complete")`` (the bin table is tiny)."""
    return (
        _cents(stream, value_column)
        .crossJoin(F.broadcast(rng))
        .select(F.expr(_FLOOR_BIN).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c_new"))
    )


def drift_from_counts(
    new_counts: DataFrame, ref_counts: DataFrame
) -> DataFrame:
    """Finish the drift number from per-bin counts (stream state or
    any saved histogram): the same exact-integer L1 arithmetic as
    histogram_drift — 1000 * L1 over the common n_old*n_new
    denominator. Output: one row (n_old, n_new, l1_scaled,
    drift_milli)."""
    totals = ref_counts.agg(
        F.coalesce(F.sum("c_ref"), F.lit(0)).cast("long").alias("n_old")
    ).crossJoin(
        new_counts.agg(
            F.coalesce(F.sum("c_new"), F.lit(0)).cast("long").alias("n_new")
        )
    )
    per_bin = (
        ref_counts.join(new_counts, "bin", "full_outer")
        .select(
            F.coalesce(F.col("c_ref"), F.lit(0)).alias("c_old"),
            F.coalesce(F.col("c_new"), F.lit(0)).alias("c_new"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("c_old") * F.col("n_new") - F.col("c_new") * F.col("n_old")
            ).alias("term")
        )
        .agg(F.sum("term").cast("long").alias("l1_scaled"))
    )
    return totals.crossJoin(per_bin).select(
        "n_old",
        "n_new",
        "l1_scaled",
        F.expr(
            "CAST(CASE WHEN n_old = 0 OR n_new = 0 THEN NULL "
            "ELSE (1000 * l1_scaled) div (n_old * n_new) END AS BIGINT)"
        ).alias("drift_milli"),
    )


def psi_from_counts(
    new_counts: DataFrame, ref_counts: DataFrame
) -> DataFrame:
    """PSI finisher over the SAME frozen-bin running state
    :func:`drift_from_counts` consumes — the streaming monitor now
    reports the industry Population Stability Index in the identical
    exact-integer band (stable/moderate/major) as the batch
    ``psi_drift`` [Q]: the per-bin counts are the mergeable state, and
    this finisher equals ``psi_drift(reference, ingested,
    range_on="old")`` over everything the stream has seen (asserted,
    including the out-of-range-mass rule, in
    tests/test_streaming_drift.py). All arithmetic (milli-log2
    surrogate, Laplace +1 over observed bins, nano thresholds) is
    documented on ``psi_drift``; this function only reshapes
    (bin, c_ref)/(bin, c_new) into that shared finisher.

    Output: one row (n_old, n_new, n_bins_observed, psi_nano,
    psi_log2, band)."""
    from sutro_spark.functions.stats import _psi_finish

    totals = ref_counts.agg(
        F.coalesce(F.sum("c_ref"), F.lit(0)).cast("long").alias("n_old")
    ).crossJoin(
        new_counts.agg(
            F.coalesce(F.sum("c_new"), F.lit(0)).cast("long").alias("n_new")
        )
    )
    per_bin = ref_counts.join(new_counts, "bin", "full_outer").select(
        F.coalesce(F.col("c_ref"), F.lit(0)).alias("c_old"),
        F.coalesce(F.col("c_new"), F.lit(0)).alias("c_new"),
    )
    return _psi_finish(per_bin, totals)
