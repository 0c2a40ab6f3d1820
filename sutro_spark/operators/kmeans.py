"""Quantized Lloyd k-means over embedding columns.

The clustering step behind SemDeDup-style curation and IVF index
builds (operators/similarity.py consumes the centroids). Not in the
reference SDK (it delegates embedding use to the caller); part of the
training-data surface the brief mandates.

Engine-exactness: float centroid means are shuffle-order-dependent, so
a naive float k-means is neither reproducible run-to-run nor
oracle-checkable. We quantize each float32 component to integer
milli-units (truncating cast + offset into non-negative range —
identical semantics in every engine), after which every Lloyd step —
squared-L2 distances, argmin assignment with (dist, cluster)
tie-break, centroid means by integer division — is exact int64
arithmetic: order-independent, engine-exact, reproducible at any
cluster size. Quantization error is bounded by 1/scale per component,
irrelevant for clustering. (int64 distance math is also
codegen-friendly — no fp reassociation barriers.)

Scale design: assignment is a broadcast cross join against k centroid
rows (k·|corpus| intermediate, aggregated straight back down — the
standard distributed Lloyd shape); the update is one
groupBy(cluster, pos) over k·dim cells, map-side combinable. Only the
k×dim centroid table (a few KB) ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QVEC = "qvec"


def quantize_embeddings(
    df: DataFrame,
    vector_column: str = "embedding",
    *,
    scale: int = 1000,
    offset: int = 1000,
    out: str = QVEC,
) -> DataFrame:
    """array<float> → array<bigint> in [0, 2·offset] milli-units.

    Truncating cast (toward zero) — the one float→int conversion with
    identical semantics across engines; components must lie in
    [-offset/scale, offset/scale].
    """
    return df.withColumn(
        out,
        F.transform(
            F.col(vector_column),
            lambda x: (x.cast("double") * scale).cast("long") + offset,
        ),
    )


def _dist2(qcol: str, ccol: str) -> F.Column:
    return F.aggregate(
        F.zip_with(qcol, ccol, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dist2_unrolled(qcol: str, ccol: str, dim: int) -> F.Column:
    """Same exact int64 squared-L2 as :func:`_dist2`, unrolled to a
    flat ``dim``-term expression. Higher-order-function lambdas are
    CodegenFallback (interpreted per element); the unrolled sum
    whole-stage-codegens. ``get()`` is 0-based and null-safe, so a
    shorter-than-``dim`` array yields NULL exactly like zip_with's
    null-padding does through the aggregate. Measured (r16): wins for
    short subvectors (PQ sub_dim=8: assign 1.02->0.71 s) but LOSES at
    dim=64 (kmeans argmin 0.74->0.91 s; exact_l2 0.46->0.57 s — the
    wide generated method costs more than interpretation saves), so
    full-dim callers keep :func:`_dist2`."""
    terms = " + ".join(
        f"(get({qcol}, {i}) - get({ccol}, {i}))"
        f" * (get({qcol}, {i}) - get({ccol}, {i}))"
        for i in range(dim)
    )
    return F.expr(terms)


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[int]]],
    id_column: str = "vec_id",
    qcol: str = QVEC,
) -> DataFrame:
    """Nearest-centroid assignment: (id, cluster, dist2).

    Broadcast cross join against the k-row centroid table, then an
    argmin per id via min(struct(dist2, cluster)) — deterministic
    tie-break, single map-side-combinable aggregation.
    """
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(int(c), [int(x) for x in v]) for c, v in centroids],
        "cluster bigint, cvec array<bigint>",
    )
    # argmin as min() of one packed long (dist2·M + cluster, M > max
    # cluster id): struct/min_by orderings force sort-based aggregation,
    # but min(long) runs as a HashAggregate with map-side partial
    # aggregation — the k-way blow-up collapses back to one row per id
    # BEFORE the shuffle, and nothing is sorted. Tie-break: equal dist2
    # → smallest cluster id, same as ordering (dist2, cluster).
    mult = max(c for c, _ in centroids) + 1
    packed = (
        df.select(id_column, qcol)
        .crossJoin(F.broadcast(cdf))
        .select(
            id_column,
            (_dist2(qcol, "cvec") * mult + F.col("cluster")).alias("key"),
        )
        .groupBy(id_column)
        .agg(F.min("key").alias("key"))
    )
    return packed.select(
        id_column,
        (F.col("key") % mult).alias("cluster"),
        F.expr(f"key div {mult}").alias("dist2"),
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    scale: int = 1000,
    offset: int = 1000,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Lloyd's algorithm, ``iters`` rounds, deterministic init (the k
    lowest-id vectors). Returns (assignments, centroids); empty
    clusters are dropped (standard Lloyd).

    Per round: one broadcast-assignment aggregation + one
    groupBy(cluster, pos) mean over k·dim cells; only the centroid
    table is collected.
    """
    from pyspark.sql import Window

    from sutro_spark.operators.dedup import spread

    # spread: a single-file corpus scan otherwise runs every
    # broadcast-assignment distance loop (k × dim per row, interpreted
    # HOFs) and every Lloyd-mean explode on ONE core; no-op at real
    # scan widths (r16 optimization round)
    q = quantize_embeddings(
        spread(df), vector_column, scale=scale, offset=offset
    ).select(id_column, QVEC)
    # r17 (guide §5 driver discipline): the deterministic init — the k
    # lowest-id vectors, cluster = ascending-id rank — is a BROADCAST
    # SUBPLAN of round 1 instead of a separate collect() job: one fewer
    # driver-synchronized job per kmeans call (every driver round-trip
    # is a barrier at any scale; the TakeOrdered scan it embeds replaces
    # the identical scan the init job used to pay). iters == 1 keeps the
    # collect — the centroid LIST is the return value there.
    centroids: list[tuple[int, list[int]]] | None = None
    for _ in range(iters - 1):
        # fused assignment+mean round: carry qvec through the argmin
        # aggregation (first() reads a value that is constant per id
        # group) instead of joining the assignment back against q —
        # one scan of q per round, not two (r16 optimization round)
        if centroids is None:
            # packed-key multiplier: init codes are 0..n-1 with n <= k,
            # so any mult > n-1 keeps key = dist2*mult + code ordered
            # lexicographically by (dist2, code); k is that bound
            # without knowing n driver-side
            mult = k
            cdf = (
                q.orderBy(id_column)
                .limit(k)
                .select(
                    (F.row_number().over(Window.orderBy(id_column)) - 1)
                    .cast("bigint")
                    .alias("cluster"),
                    F.col(QVEC).alias("cvec"),
                )
            )
        else:
            mult = max(c for c, _ in centroids) + 1
            cdf = q.sparkSession.createDataFrame(
                [(int(c), [int(x) for x in v]) for c, v in centroids],
                "cluster bigint, cvec array<bigint>",
            )
        ex = (
            q.crossJoin(F.broadcast(cdf))
            .select(
                id_column,
                QVEC,
                (_dist2(QVEC, "cvec") * mult + F.col("cluster")).alias("key"),
            )
            .groupBy(id_column)
            .agg(F.min("key").alias("key"), F.first(QVEC).alias(QVEC))
            .select((F.col("key") % mult).alias("cluster"), QVEC)
            .select("cluster", F.posexplode(QVEC).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("comp", F.expr("s div n"))  # all values >= 0
            .select("cluster", "pos", "comp")
            .collect()
        )
        # r16: assemble the k×dim component rows into centroid arrays
        # on the driver instead of a second groupBy(cluster) +
        # sort_array(collect_list) exchange — one less shuffle per
        # Lloyd round; the collect is the same bounded k×dim table the
        # round already returned, identical values in identical order
        by_c: dict = {}
        for r in ex:
            by_c.setdefault(r["cluster"], {})[r["pos"]] = r["comp"]
        centroids = [
            (c, [comps[p] for p in sorted(comps)])
            for c, comps in sorted(by_c.items())
        ]
    if centroids is None:  # iters == 1: the init IS the result
        init = q.orderBy(id_column).limit(k).collect()
        centroids = [(i, list(r[QVEC])) for i, r in enumerate(init)]
    assigned = assign_clusters(q, centroids, id_column)
    return assigned, centroids


def semdedup(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then flag near-duplicate pairs ONLY within a
    cluster — candidate generation by k-means instead of all-pairs.

    Returns (cluster, id_a, id_b, sim) with id_a < id_b and rounded
    cosine >= threshold; callers drop the higher id per pair. Cost is
    sum of per-cluster pair counts — with balanced clusters, corpus²/k
    instead of corpus², and each cluster's self-join is an equi-join on
    the cluster key (one shuffle, no broadcast of the corpus).
    """
    from sutro_spark.functions.vectors import raw_dot, to_double_array

    assigned, _ = kmeans(
        df, k=k, iters=iters, id_column=id_column, vector_column=vector_column
    )
    v = df.select(
        F.col(id_column), to_double_array(F.col(vector_column)).alias("v")
    ).withColumn("n", F.sqrt(raw_dot(F.col("v"), F.col("v"))))
    m = assigned.select(id_column, "cluster").join(v, id_column)
    a = m.select(
        "cluster",
        F.col(id_column).alias("id_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = m.select(
        "cluster",
        F.col(id_column).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(
                raw_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .where(F.col("sim") >= threshold)
        .select("cluster", "id_a", "id_b", "sim")
    )


def kmeans_summary(assigned: DataFrame) -> DataFrame:
    """(cluster, size, inertia) — all exact integers."""
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("size"), F.sum("dist2").alias("inertia")
    )
