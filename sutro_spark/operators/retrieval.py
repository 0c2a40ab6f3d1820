"""Rank-list fusion for hybrid retrieval.

The reference exposes lexical relevance through its LLM-side rank/score
operators (reference: src/sutro/sdk.py rank/score surfaces); a
large-scale curation pipeline additionally needs the classic two-tower
retrieval composition: a lexical ranker (bm25_topk) and a semantic
ranker (brute_force_topk / ivfpq variants) fused into one ranking.
Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is
the standard engine-agnostic fusion: it needs only the RANKS of each
system's top-k list, so wildly different score scales (integer BM25
rationals vs float cosines) compose without calibration.

Scale shape: fusion never touches the corpus. Each input is a
top-``rank_cap`` list — O(queries x rank_cap) rows per system — so the
union + groupBy here shuffles kilobytes while the real cost stays in
the upstream retrievers. At 100 TB the fused ranking is the same size
as at 100 GB.
"""

from __future__ import annotations

from math import gcd
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "rrf_lcm"]


def rrf_lcm(k_const: int, rank_cap: int) -> int:
    """lcm(k_const+1 .. k_const+rank_cap): the scale that makes every
    reciprocal rank 1/(k_const+r) exactly integral as L div (k_const+r).
    """
    lcm = 1
    for d in range(k_const + 1, k_const + rank_cap + 1):
        lcm = lcm * d // gcd(lcm, d)
    return lcm


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    query_column: str = "query_id",
    id_column: str = "doc_id",
    rank_column: str = "rank",
    k_const: int = 60,
    rank_cap: int = 10,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of per-query ranked lists.

    Each input frame carries (query, id, rank) columns; rows with
    rank > ``rank_cap`` are ignored (a system's tail beyond the cap
    contributes nothing, mirroring the usual fixed-depth RRF). The
    fused score for a document is

        rrf = sum over systems of 1 / (k_const + rank)

    computed EXACTLY: scaled by L = lcm(k_const+1 .. k_const+rank_cap)
    every term L div (k_const+rank) is integral, so the sum is an
    exact BIGINT and the final ordering is engine-reproducible (the
    float form would hash-flake on cross-libm addition order; same
    discipline as rank_metrics' lcm(1..k) MRR scaling).

    Overflow guard: the largest possible fused score is
    n_systems * (L div (k_const+1)). With the default (60, 10),
    L = lcm(61..70) ~ 1.4e14 and each term <= 2.4e12 — safe to
    millions of systems. L itself grows multiplicatively in rank_cap,
    so a deep cap with many systems is rejected up front rather than
    silently wrapping in non-ANSI Spark.

    Output: (query, id, rrf_scaled, n_systems, rank) — rank over
    (rrf_scaled DESC, id ASC), top ``k`` per query. ``n_systems``
    counts how many input systems retrieved the document within the
    cap (the classic "retrieved by both" signal).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k_const < 1 or rank_cap < 1 or k < 1:
        raise ValueError("k_const, rank_cap and k must all be >= 1")
    lcm = rrf_lcm(k_const, rank_cap)
    if len(rankings) * (lcm // (k_const + 1)) >= 2**62:
        raise ValueError(
            f"rrf overflow: {len(rankings)} systems x lcm({k_const + 1}.."
            f"{k_const + rank_cap})={lcm} can exceed BIGINT; lower rank_cap"
        )
    slim = [
        r.select(
            F.col(query_column).cast("long").alias("__q"),
            F.col(id_column).cast("long").alias("__id"),
            F.col(rank_column).cast("long").alias("__r"),
        ).where(F.col(rank_column) <= rank_cap)
        for r in rankings
    ]
    unioned = slim[0]
    for s in slim[1:]:
        unioned = unioned.unionByName(s)
    fused = unioned.groupBy("__q", "__id").agg(
        F.sum(F.expr(f"CAST({lcm} AS BIGINT) div (__r + {k_const})"))
        .cast("long")
        .alias("rrf_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = Window.partitionBy("__q").orderBy(F.desc("rrf_scaled"), F.asc("__id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("__q").alias(query_column),
            F.col("__id").alias(id_column),
            "rrf_scaled",
            "n_systems",
            "rank",
        )
    )
