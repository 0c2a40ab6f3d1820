"""Link-graph centrality: distributed PageRank in exact integer
arithmetic — the classic graph quality signal a web-scale curation
pipeline uses to weight crawled documents (a page linked by many
high-rank pages is likelier to be worth training on than an orphan).

The reference has no graph operator (SURVEY.md §2 ends at tabular and
SDK surfaces); this extends the curation suite the way CommonCrawl-
style corpora are actually filtered (harmonic/PageRank centrality is a
standard quality feature, cf. the C4/RefinedWeb lineage of pipelines).

Why integer arithmetic: the power-iteration update is a sum over
in-neighbors, and floating-point sums across shuffle partitions are
order-dependent — the same graph could hash to different results run
to run, which both breaks the DuckDB oracle gate and makes production
reruns non-reproducible. Every quantity here is a BIGINT: ranks are
scaled by ``scale``, the damping factor is the rational
``damping_num/damping_den`` (default 17/20 = 0.85), and each division
is an integer ``div`` — deterministic in any engine, aggregation-order
independent. Mass lost to integer truncation (< out-degree per node
per iteration) and to dangling nodes (no out-edges: their mass leaks,
the standard simplified formulation) is documented, not hidden — ranks
are a *ranking signal*, not a probability distribution.

Scale shape: the out-degree dim is joined onto the edge list ONCE
before the loop, so each power iteration is exactly one equi-join
(ranks ⋈ edges on src) plus one map-side-combinable groupBy(dst) sum
plus one broadcast-spine left join — two shuffles per iteration, both
on the node id. On a real cluster, bucket the edge table by ``src``
and the iteration joins co-locate with no per-iteration exchange on
the edges side (same layout argument as streaming/dedup's bucketed
postings index). Lineage is truncated with an eager localCheckpoint
every ``checkpoint_every`` iterations so deep iteration counts do not
grow the plan (same discipline as operators/cluster.py connected
components). The single driver-side action is one ``count()`` of the
node set (one long — bounded by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10**12,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Power-iteration PageRank over an (src, dst) edge list.

    Update rule (all BIGINT, ``div`` = integer division):

        contrib(v)   = rank(v) div outdeg(v)           per out-edge
        rank'(u)     = ((den-num) * scale) div (den * N)
                       + (num * sum_in_contribs(u)) div den

    with num/den the damping rational and N = |nodes|. Nodes with no
    in-edges keep the teleport term; nodes with no out-edges leak
    their damped mass (simplified PageRank — documented in the module
    docstring). Output: (node, rank_scaled bigint), one row per node
    appearing in the edge list on either side.

    Overflow bounds: damping_num * sum(contribs) <= num * scale total
    mass — with the defaults, 1.7e13, nowhere near BIGINT; scale can
    be raised to 1e15 before num*scale itself is at risk from a
    single mega-hub holding all mass.
    """
    if iterations < 1:
        raise ValueError("pagerank requires iterations >= 1")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")

    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("odeg"))
    # one-time join: every iteration reuses this (src, dst, odeg) edge
    # table — on a cluster, write it bucketed by src once instead.
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)

    n_nodes = nodes.count()  # single bounded driver action (one long)
    teleport = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)

    ranks = nodes.withColumn(
        "rank", F.lit(scale // n_nodes).cast("long")
    )
    for i in range(iterations):
        sums = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV odeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            F.expr(
                f"CAST({teleport} AS BIGINT)"
                f" + ({damping_num} * coalesce(m, CAST(0 AS BIGINT)))"
                f" DIV {damping_den}"
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("rank").alias("rank_scaled"))
