"""Reciprocal-rank fusion (operators/retrieval.py rrf_fuse)."""

import pytest

from sutro_spark.operators.retrieval import rrf_fuse, rrf_lcm


def _rankings(spark, rows_a, rows_b):
    cols = ["query_id", "doc_id", "rank"]
    return (
        spark.createDataFrame(rows_a, cols),
        spark.createDataFrame(rows_b, cols),
    )


def test_rrf_matches_hand_computed(spark):
    # query 1: doc 10 is rank 1 lexically and rank 2 semantically;
    # doc 20 only lexical rank 2; doc 30 only semantic rank 1.
    a, b = _rankings(
        spark,
        [(1, 10, 1), (1, 20, 2)],
        [(1, 30, 1), (1, 10, 2)],
    )
    out = {
        r["doc_id"]: (r["rrf_scaled"], r["n_systems"], r["rank"])
        for r in rrf_fuse([a, b], k_const=60, rank_cap=10, k=10).collect()
    }
    L = rrf_lcm(60, 10)
    assert out[10] == (L // 61 + L // 62, 2, 1)  # in both systems -> wins
    assert out[30] == (L // 61, 1, 2)
    assert out[20] == (L // 62, 1, 3)


def test_rrf_both_systems_beat_single(spark):
    # a doc at rank 5 in BOTH systems outranks a doc at rank 1 in one:
    # 2/(60+5) > 1/(60+1).
    a, b = _rankings(
        spark,
        [(7, 100, 5), (7, 200, 1)],
        [(7, 100, 5)],
    )
    top = (
        rrf_fuse([a, b], k_const=60, rank_cap=10, k=1)
        .collect()[0]
    )
    assert top["doc_id"] == 100 and top["n_systems"] == 2


def test_rrf_rank_cap_drops_tail(spark):
    a, b = _rankings(
        spark,
        [(1, 10, 1), (1, 99, 11)],  # rank 11 > cap: contributes nothing
        [(1, 99, 1)],
    )
    out = {
        r["doc_id"]: r["rrf_scaled"]
        for r in rrf_fuse([a, b], k_const=60, rank_cap=10, k=10).collect()
    }
    L = rrf_lcm(60, 10)
    assert out[99] == L // 61  # only the in-cap semantic hit counts


def test_rrf_validation():
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match=">= 1"):
        rrf_fuse([None], k_const=0)


def test_rrf_overflow_guard(spark):
    # a deep cap makes lcm astronomically large; the guard must reject
    # rather than silently wrap the BIGINT sum.
    a, _ = _rankings(spark, [(1, 10, 1)], [(1, 10, 1)])
    with pytest.raises(ValueError, match="overflow"):
        rrf_fuse([a], k_const=60, rank_cap=60)


def test_rrf_exactness_vs_float():
    # the lcm-scaled integer terms are EXACT reciprocals: for every
    # rank r in cap, L // (60+r) * (60+r) == L.
    L = rrf_lcm(60, 10)
    for r in range(1, 11):
        assert L % (60 + r) == 0


def test_mmr_defers_near_duplicate(spark):
    from sutro_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4)],
        ["query_id", "doc_id", "rank"],
    )
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.04, 0.0]),  # near-dup of doc 1
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    order = [
        r["doc_id"]
        for r in mmr_rerank(cand, vecs, k=4, rank_cap=4, lam=(1, 2))
        .orderBy("mmr_rank")
        .collect()
    ]
    # doc 2 is 2nd most relevant but nearly identical to the first
    # pick: MMR defers it behind the two orthogonal docs.
    assert order == [1, 3, 4, 2]


def test_mmr_pure_relevance_at_lam_one(spark):
    from sutro_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3)], ["query_id", "doc_id", "rank"]
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.14]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    # lam=(1,1): zero redundancy penalty -> original rank order.
    order = [
        r["doc_id"]
        for r in mmr_rerank(cand, vecs, k=3, rank_cap=3, lam=(1, 1))
        .orderBy("mmr_rank")
        .collect()
    ]
    assert order == [1, 2, 3]


def test_mmr_vectorless_candidate_excluded_not_truncating(spark):
    from sutro_spark.operators.retrieval import mmr_rerank

    # doc 2 (the would-be step-1 pick by relevance after doc 1? no —
    # doc 1 is rank 1 and HAS no vector) never joins a vector row:
    # it must be excluded up front, NOT picked at step 1 and then
    # poison the redundancy join into truncating the list below k.
    cand = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4)],
        ["query_id", "doc_id", "rank"],
    )
    vecs = spark.createDataFrame(
        [(2, [1.0, 0.0]), (3, [0.9, 0.44]), (4, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    rows = (
        mmr_rerank(cand, vecs, k=3, rank_cap=4, lam=(1, 2))
        .orderBy("mmr_rank")
        .collect()
    )
    # full k picks from the vectored candidates; doc 1 absent
    assert [r["doc_id"] for r in rows] == [2, 4, 3]
    assert [r["mmr_rank"] for r in rows] == [1, 2, 3]


def test_mmr_validation(spark):
    from sutro_spark.operators.retrieval import mmr_rerank

    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(None, None, lam=(0, 2))
    with pytest.raises(ValueError, match=">= 1"):
        mmr_rerank(None, None, k=0)


def test_hard_negatives_filters_and_renumbers(spark):
    from sutro_spark.operators.retrieval import hard_negatives

    nb = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (2, 20, 1)],
        ["query_id", "doc_id", "rank"],
    )
    pos = spark.createDataFrame([(1, 10), (1, 12)], ["query_id", "doc_id"])
    out = {
        (r["query_id"], r["doc_id"]): (r["orig_rank"], r["neg_rank"])
        for r in hard_negatives(nb, pos, n=5).collect()
    }
    # positives 10 and 12 filtered; survivors renumbered densely
    assert out == {(1, 11): (2, 1), (1, 13): (4, 2), (2, 20): (1, 1)}


def test_hard_negatives_all_positive_anchor_is_empty(spark):
    from sutro_spark.operators.retrieval import hard_negatives

    nb = spark.createDataFrame([(1, 10, 1)], ["query_id", "doc_id", "rank"])
    pos = spark.createDataFrame([(1, 10)], ["query_id", "doc_id"])
    assert hard_negatives(nb, pos, n=2).count() == 0
