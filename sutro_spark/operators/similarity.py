"""Similarity search over an embedding column (north-star extension).

Two strategies:

- ``brute_force_topk`` — exact: broadcast the (small) query set against
  the corpus, cosine via zip_with/aggregate (JVM codegen, no Python),
  per-query top-k via window row_number. Per-row work is O(|queries|·d);
  the corpus is never shuffled — this is the right *baseline* even at
  100 TB when the query set is small.
- ``ivf_topk`` — approximate scale path: coarse-quantize the corpus
  into buckets by nearest centroid (one pass), search only the
  ``nprobe`` closest buckets per query. Turns full scans into
  partition-pruned scans when the corpus is written bucketed/partitioned
  by centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.vectors import cosine_rounded, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_id_column: str | None = None,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, sim, rank) — sim rounded to 6
    decimals, rank ties broken by neighbor id (deterministic across
    engines).
    """
    qid = query_id_column or id_column
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vector_column).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_column).alias("neighbor_id"), F.col(vector_column).alias("__cvec")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_rounded(F.col("__qvec"), F.col("__cvec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    centroid_id_column: str = "centroid_id",
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per corpus vector
    (centroids broadcast; one scan, no shuffle). At scale, persist the
    result partitioned by centroid_id to get partition pruning on probe.
    """
    c = centroids.select(
        F.col(centroid_id_column).alias("__cid"), F.col(vector_column).alias("__centv")
    )
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "__d", dot(F.col(vector_column), F.col("__centv"))
    )
    w = Window.partitionBy(id_column).orderBy(F.desc("__d"), F.asc("__cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__centv", "__d", "__rn")
        .withColumnRenamed("__cid", centroid_id_column)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid buckets
    per query. Same output shape as brute_force_topk."""
    assigned = assign_centroids(
        corpus, centroids, id_column=id_column, vector_column=vector_column
    )
    # nprobe nearest centroids per query
    qprobe = assign_probe = (
        queries.select(F.col(id_column).alias("query_id"), F.col(vector_column).alias("__qvec"))
        .crossJoin(
            F.broadcast(
                centroids.select(
                    F.col("centroid_id").alias("probe_cid"), F.col(vector_column).alias("__centv")
                )
            )
        )
        .withColumn("__d", dot(F.col("__qvec"), F.col("__centv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__d"), F.asc("probe_cid"))
    qprobe = (
        qprobe.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", F.col("probe_cid").alias("centroid_id"))
    )
    cand = qprobe.join(assigned, "centroid_id").where(
        F.col(id_column) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_column).alias("neighbor_id"),
        cosine_rounded(F.col("__qvec"), F.col(vector_column)).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_dedup_pairs(
    corpus: DataFrame,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >=
    threshold). All-pairs via self-crossJoin — correct baseline; at
    scale route through ivf buckets first (join on centroid_id) to
    prune the quadratic term."""
    a = corpus.select(F.col(id_column).alias("id_a"), F.col(vector_column).alias("__va"))
    b = corpus.select(F.col(id_column).alias("id_b"), F.col(vector_column).alias("__vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_rounded(F.col("__va"), F.col("__vb")).alias("sim"))
        .where(F.col("sim") >= threshold)
    )
