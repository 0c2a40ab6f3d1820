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
