"""Deterministic cardinality sketches: KMV (k-minimum-values) distinct
estimation.

Sketch-based distinct counting is the 100 TB answer to COUNT(DISTINCT)
— exact distinct needs a full shuffle of every key; a KMV sketch needs
only the k smallest hash values per group (constant state), merged
associatively. Spark's built-in `approx_count_distinct` (HLL++) does
this too but its binary sketch is engine-specific; this KMV uses the
repo's portable sha-based 32-bit hash so the ESTIMATE ITSELF is
reproducible bit-for-bit on any engine — which is what makes it
oracle-checkable (and auditable in production).

Estimator (Bar-Yossef et al. 2002, Beyer et al. SIGMOD 2007): with
h(x) uniform on [0, 2^32) and h_k the k-th smallest distinct hash,
    est = (k-1) * 2^32 / h_k
one double division of exact integers → identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.sampling import hash_bucket

__all__ = ["kmv_distinct"]


def kmv_distinct(
    df: DataFrame,
    group_column: str,
    key_column: str,
    *,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Plan: dedupe (group, hash) — ONE shuffle with map-side combine —
    then a bounded rank window keeps the k smallest hashes per group
    (WindowGroupLimit pushes the rank filter into the sort, so only k
    rows per group survive the exchange). Groups with fewer than k
    distinct keys report their exact count.

    Output: (group, n_le_k bigint — min(k, distinct), est_distinct
    double — the KMV estimate, exact when the group has < k keys).
    """
    h = hash_bucket(F.col(key_column), salt=salt, buckets=1 << 32)
    hashes = (
        df.select(F.col(group_column).alias("grp"), h.alias("h"))
        .groupBy("grp", "h")
        .agg(F.lit(1))
        .select("grp", "h")
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    topk = hashes.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return (
        topk.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_le_k"), F.max("h").alias("hk"))
        .select(
            "grp",
            "n_le_k",
            F.when(F.col("n_le_k") < k, F.col("n_le_k").cast("double"))
            .otherwise(
                (F.lit(float(k - 1)) * F.lit(float(1 << 32))) / F.col("hk")
            )
            .alias("est_distinct"),
        )
    )
