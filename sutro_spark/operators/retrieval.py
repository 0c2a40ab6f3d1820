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

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.session import release_local_checkpoint

__all__ = ["rrf_fuse", "rrf_lcm", "mmr_rerank", "hard_negatives"]


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


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    *,
    query_column: str = "query_id",
    id_column: str = "doc_id",
    rank_column: str = "rank",
    vector_id_column: str = "vec_id",
    vector_column: str = "embedding",
    k: int = 5,
    rank_cap: int = 10,
    lam: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Maximal-marginal-relevance diversification of per-query
    candidate lists (Carbonell & Goldstein, SIGIR 1998): greedily pick
    the candidate maximizing

        lam * relevance - (1 - lam) * max_sim_to_already_selected

    so near-duplicate hits stop crowding the top of a retrieval list —
    the rerank stage a curation pipeline runs AFTER rrf_fuse and
    BEFORE spending LLM context budget on the survivors.

    Exact-integer scoring (same discipline as rrf_fuse): relevance is
    the linear rank decay 1_000_000*(cap+1-rank) div cap (rank 1 ->
    1e6, rank cap -> ~1e6/cap, commensurate with cosine micro-units);
    redundancy is the candidate-pair cosine rounded to micro-units
    (round-6 doubles are cross-engine bit-stable — similarity_topk's
    proven parity — so scaling them to integers is too); the traded
    score lam_num*rel - (lam_den-lam_num)*red is a BIGINT, ties broken
    by id. lam=(num, den) as a rational: (1,2) is the classic 0.5.

    Scale shape: everything after the one vectors join is per-query
    O(rank_cap^2) — the pairwise-sim table and each greedy step touch
    only candidate lists, never the corpus. The k-step loop runs on a
    localCheckpointed frame of <= queries*rank_cap rows, so lineage
    stays flat and no step re-reads upstream retrievers.

    Output: (query, id, mmr_rank, relevance_scaled, score_scaled) —
    mmr_rank is the greedy pick order; score_scaled is the traded
    score at pick time (pick 1 has no selected set: redundancy 0).

    Candidates with no row in ``vectors`` are excluded before the
    greedy loop: their redundancy to anything is unknowable, so they
    never occupy a pick slot (rather than silently vanishing mid-loop
    and truncating a pick list below k).
    """
    if k < 1 or rank_cap < 1:
        raise ValueError("k and rank_cap must be >= 1")
    lam_num, lam_den = lam
    if not 0 < lam_num <= lam_den:
        raise ValueError("lam must be a rational in (0, 1] as (num, den)")
    cand = candidates.where(F.col(rank_column) <= rank_cap).select(
        F.col(query_column).cast("long").alias("__q"),
        F.col(id_column).cast("long").alias("__id"),
        F.expr(
            f"CAST((1000000 * ({rank_cap + 1} - CAST({rank_column} AS BIGINT)))"
            f" div {rank_cap} AS BIGINT)"
        ).alias("__rel"),
    )
    from sutro_spark.operators.similarity import _prepared, _sim

    v = _prepared(vectors, vector_id_column, vector_column, "v_")
    cv = cand.join(v, cand["__id"] == v["v_id"]).select("__q", "__id", "__rel", "v_v", "v_n")
    # r16: cv feeds both sim-table legs AND the pool — each reference
    # otherwise replays the candidates⋈vectors join (and the upstream
    # retriever lineage). Bounded: <= queries*rank_cap rows.
    if not cv.isStreaming:
        cv = cv.transform(_barrier)
    a = cv.select(
        F.col("__q"), F.col("__id").alias("__a"),
        F.col("v_v").alias("a_v"), F.col("v_n").alias("a_n"),
    )
    b = cv.select(
        F.col("__q"), F.col("__id").alias("__b"),
        F.col("v_v").alias("b_v"), F.col("v_n").alias("b_n"),
    )
    simt = (
        a.join(b, "__q")
        .where(F.col("__a") != F.col("__b"))
        .select(
            F.col("__q").alias("__sq"),
            "__a",
            "__b",
            F.round(_sim("a_", "b_") * 1_000_000, 0).cast("long").alias("__sim"),
        )
        .transform(_barrier)
    )
    # pool from cv, NOT cand: a candidate with no vector row has no
    # simt rows, so the per-step redundancy inner join would silently
    # drop it (truncating pick lists below k) if it survived to the
    # pool. Excluding it up front keeps simt complete over the pool
    # and makes the exclusion a documented contract instead of a
    # join artifact: MMR cannot score redundancy for a vectorless
    # candidate, so it never occupies a pick slot.
    pool = cv.select("__q", "__id", "__rel").transform(_barrier)
    # pool was cv's last reader (simt materialized above) — free it
    release_local_checkpoint(cv)
    w_pick = Window.partitionBy("__q").orderBy(
        F.desc("__score"), F.asc("__id")
    )
    selected = (
        pool.withColumn("__score", F.lit(lam_num) * F.col("__rel"))
        .withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .select("__q", "__id", F.lit(1).alias("mmr_rank"), "__rel", "__score")
        .transform(_barrier)
    )
    # remaining is checkpointed per step too: its lineage otherwise
    # chains every prior pick (which references every prior selected
    # checkpoint), so the plan would grow per step AND superseded
    # selected blocks could never be freed safely.
    remaining = pool.join(
        selected.select("__q", "__id"), ["__q", "__id"], "left_anti"
    ).transform(_barrier)
    prev_sel, prev_rem = selected, remaining
    for step in range(2, k + 1):
        red = (
            remaining.join(
                selected.select("__q", F.col("__id").alias("__sel")), "__q"
            )
            .join(
                simt,
                (F.col("__q") == F.col("__sq"))
                & (F.col("__id") == F.col("__a"))
                & (F.col("__sel") == F.col("__b")),
            )
            .groupBy("__q", "__id", "__rel")
            .agg(F.max("__sim").alias("__red"))
        )
        pick = (
            red.withColumn(
                "__score",
                F.lit(lam_num) * F.col("__rel")
                - F.lit(lam_den - lam_num) * F.col("__red"),
            )
            .withColumn("__rn", F.row_number().over(w_pick))
            .where(F.col("__rn") == 1)
            .select("__q", "__id", F.lit(step).alias("mmr_rank"), "__rel", "__score")
        )
        selected = selected.unionByName(pick).transform(_barrier)
        remaining = remaining.join(
            pick.select("__q", "__id"), ["__q", "__id"], "left_anti"
        ).transform(_barrier)
        # both step-`step` checkpoints are materialized; the previous
        # step's frames are unreachable — free their blocks
        release_local_checkpoint(prev_sel)
        release_local_checkpoint(prev_rem)
        prev_sel, prev_rem = selected, remaining
    # the returned frame derives only from the final selected
    # checkpoint; the working frames can all go
    release_local_checkpoint(remaining)
    release_local_checkpoint(simt)
    release_local_checkpoint(pool)
    return selected.select(
        F.col("__q").alias(query_column),
        F.col("__id").alias(id_column),
        F.col("mmr_rank").cast("long").alias("mmr_rank"),
        F.col("__rel").alias("relevance_scaled"),
        F.col("__score").alias("score_scaled"),
    )


def hard_negatives(
    neighbors: DataFrame,
    positives: DataFrame,
    *,
    query_column: str = "query_id",
    id_column: str = "doc_id",
    rank_column: str = "rank",
    n: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training
    (the in-batch-negatives upgrade used by DPR-style pipelines): from
    each anchor's nearest-neighbor list, keep the top-``n`` entries
    that are NOT labeled positives — the semantically-close,
    label-negative examples that carry most of the training signal.

    Inputs: ``neighbors`` = (query, id, rank) from any retriever
    (brute_force_topk, ivfpq variants, rrf_fuse's fused ranking);
    ``positives`` = (query, id) labeled positive pairs. An anchor
    whose whole list is positive yields no rows (nothing to mine).

    Plan shape: one left-anti join of two O(queries x k) lists, then a
    per-query row_number — no corpus access, no skew surface (every
    query contributes <= k rows to the shuffle). At 100 TB the cost
    lives in the upstream ANN, exactly where it should.

    Output: (query, id, orig_rank, neg_rank) — neg_rank renumbers the
    survivors 1..n in original rank order, so downstream samplers can
    take "the hardest m" without knowing how many positives were
    filtered out.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    nb = neighbors.select(
        F.col(query_column).cast("long").alias("__q"),
        F.col(id_column).cast("long").alias("__id"),
        F.col(rank_column).cast("long").alias("orig_rank"),
    )
    pos = positives.select(
        F.col(query_column).cast("long").alias("__q"),
        F.col(id_column).cast("long").alias("__id"),
    )
    w = Window.partitionBy("__q").orderBy(F.asc("orig_rank"), F.asc("__id"))
    return (
        nb.join(pos, ["__q", "__id"], "left_anti")
        .withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .where(F.col("neg_rank") <= n)
        .select(
            F.col("__q").alias(query_column),
            F.col("__id").alias(id_column),
            "orig_rank",
            "neg_rank",
        )
    )
