"""Similarity search over an embedding column (north-star extension).

Two strategies:

- ``brute_force_topk`` — exact: broadcast the (small) query set against
  the corpus, cosine via an unrolled codegen'd dot product (no Python,
  no interpreted higher-order functions). Per-row work is
  O(|queries|·d); the corpus is never shuffled — the right *baseline*
  even at 100 TB when the query set is small.
- ``ivf_topk`` — approximate scale path: coarse-quantize the corpus
  into buckets by nearest centroid (one pass), search only the
  ``nprobe`` closest buckets per query. Turns full scans into
  partition-pruned scans when the corpus is written bucketed/partitioned
  by centroid id.

Norms are precomputed per vector BEFORE any pair blow-up, so a corpus
of n vectors pays n norm computations, not n² (or n·|queries|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.vectors import dot, norm


def _infer_dim(df: DataFrame, vector_column: str) -> int:
    row = df.select(F.size(F.col(vector_column)).alias("d")).first()
    if row is None:
        raise ValueError("empty corpus: cannot infer embedding dimension")
    return int(row["d"])


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_id_column: str | None = None,
    k: int = 5,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, sim, rank) — sim rounded to 6
    decimals, rank ties broken by neighbor id (deterministic across
    engines).
    """
    dim = dim or _infer_dim(corpus, vector_column)
    qid = query_id_column or id_column
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vector_column).alias("__qvec"),
        norm(F.col(vector_column), dim).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_column).alias("neighbor_id"),
        F.col(vector_column).alias("__cvec"),
        norm(F.col(vector_column), dim).alias("__cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("__qvec"), F.col("__cvec"), dim) / (F.col("__qnorm") * F.col("__cnorm")),
            6,
        ).alias("sim"),
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
    dim: int | None = None,
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per corpus vector
    (centroids broadcast; one scan, no shuffle). At scale, persist the
    result partitioned by centroid_id to get partition pruning on probe.
    """
    dim = dim or _infer_dim(corpus, vector_column)
    c = centroids.select(
        F.col(centroid_id_column).alias("__cid"), F.col(vector_column).alias("__centv")
    )
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "__d", dot(F.col(vector_column), F.col("__centv"), dim)
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
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid buckets
    per query. Same output shape as brute_force_topk."""
    dim = dim or _infer_dim(corpus, vector_column)
    assigned = assign_centroids(
        corpus, centroids, id_column=id_column, vector_column=vector_column, dim=dim
    )
    qprobe = (
        queries.select(F.col(id_column).alias("query_id"), F.col(vector_column).alias("__qvec"))
        .crossJoin(
            F.broadcast(
                centroids.select(
                    F.col("centroid_id").alias("probe_cid"),
                    F.col(vector_column).alias("__centv"),
                )
            )
        )
        .withColumn("__d", dot(F.col("__qvec"), F.col("__centv"), dim))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__d"), F.asc("probe_cid"))
    qprobe = (
        qprobe.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", F.col("probe_cid").alias("centroid_id"))
    )
    cand = qprobe.join(assigned, "centroid_id").where(F.col(id_column) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_column).alias("neighbor_id"),
        F.round(
            dot(F.col("__qvec"), F.col(vector_column), dim)
            / (norm(F.col("__qvec"), dim) * norm(F.col(vector_column), dim)),
            6,
        ).alias("sim"),
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >=
    threshold). All-pairs via self-crossJoin with precomputed norms —
    correct baseline; at scale route through ivf buckets first (join on
    centroid_id) to prune the quadratic term."""
    dim = dim or _infer_dim(corpus, vector_column)
    v = corpus.select(
        F.col(id_column).alias("__vid"),
        F.col(vector_column).alias("__v"),
        norm(F.col(vector_column), dim).alias("__n"),
    )
    a = v.select(
        F.col("__vid").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na")
    )
    b = v.select(
        F.col("__vid").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("__va"), F.col("__vb"), dim) / (F.col("__na") * F.col("__nb")), 6
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
