"""Mixture planning operators: token_budget_allocation, epoch_plan,
embedding_norm_stats, dup_size_histogram — analytic hand-computed
cases (the oracle parity is covered by the [Q] entries; these pin the
semantics to worked examples)."""

import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.mixture import token_budget_allocation
from sutro_spark.operators.packing import epoch_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


# A: 4 docs x 4 tokens = 16 avail, w = floor(sqrt(16)*1000) = 4000
# B: 1 doc  x 4 tokens =  4 avail, w = floor(sqrt(4)*1000)  = 2000
_AB = [("A", "a b c d")] * 4 + [("B", "a b c d")]


def test_budget_uncapped_proportional_to_temperature_weights(spark):
    out = {r.source: r for r in token_budget_allocation(
        _docs(spark, _AB), 12, max_epochs_milli=1000).collect()}
    # alloc1: A = floor(12 * 4000/6000) = 8, B = floor(12 * 2000/6000) = 4
    assert (out["A"].avail_tokens, out["A"].cap_tokens, out["A"].alloc_tokens) == (16, 16, 8)
    assert (out["B"].avail_tokens, out["B"].cap_tokens, out["B"].alloc_tokens) == (4, 4, 4)
    assert out["A"].epochs_milli == 500 and out["B"].epochs_milli == 1000


def test_budget_cap_binds_and_redistributes(spark):
    out = {r.source: r for r in token_budget_allocation(
        _docs(spark, _AB), 18, max_epochs_milli=1000).collect()}
    # alloc1: A = min(16, 12) = 12, B = min(4, 6) = 4 (capped);
    # leftover 2 flows entirely to A's headroom
    assert out["B"].alloc_tokens == out["B"].cap_tokens == 4
    assert out["A"].alloc_tokens == 14
    assert out["A"].epochs_milli == 875


def test_budget_beyond_cap_capacity_reports_shortfall(spark):
    out = token_budget_allocation(
        _docs(spark, _AB), 100, max_epochs_milli=1000).collect()
    # every source capped at 1 epoch; 80 budget tokens are unplaceable
    assert all(r.alloc_tokens == r.cap_tokens == r.avail_tokens for r in out)
    assert sum(r.alloc_tokens for r in out) == 20


def test_budget_validation(spark):
    df = _docs(spark, _AB)
    with pytest.raises(ValueError):
        token_budget_allocation(df, -1)
    with pytest.raises(ValueError):
        token_budget_allocation(df, 10, max_epochs_milli=0)


def test_epoch_plan_stride_interleave(spark):
    # A: 2 shards, w=6; B: 1 shard, w=3
    # vt(A,0)=1e9/12, vt(B,0)=1e9/6, vt(A,1)=3e9/12 -> A0, B0, A1
    m = spark.createDataFrame(
        [("A", 0, 3), ("A", 1, 3), ("B", 0, 3)],
        "source string, shard_id long, n_tokens long",
    )
    out = [(r.position, r.source, r.shard_id) for r in
           epoch_plan(m).orderBy("position").collect()]
    assert out == [(1, "A", 0), (2, "B", 0), (3, "A", 1)]


def test_epoch_plan_prefix_fairness(spark):
    # weights 3:1 over 40 equal shards -> any sizeable prefix holds
    # ~3x as many A shards as B shards (WFQ bound: within one stride)
    rows = [("A", i, 3) for i in range(30)] + [("B", i, 1) for i in range(10)]
    m = spark.createDataFrame(rows, "source string, shard_id long, n_tokens long")
    plan = [r.source for r in epoch_plan(m).orderBy("position").collect()]
    assert len(plan) == 40
    for prefix in (8, 16, 24, 40):
        a = plan[:prefix].count("A")
        assert abs(a - 0.75 * prefix) <= 1.5, (prefix, a)


def test_embedding_norm_stats_exact_quantized(spark):
    from sutro_spark.operators.similarity import embedding_norm_stats

    df = spark.createDataFrame(
        [(1, [0.001, -0.002]), (1, [0.003, 0.004]), (2, [0.0015, 0.0])],
        "label int, embedding array<float>",
    )
    out = {r.label: r for r in embedding_norm_stats(df).collect()}
    # label 1: q = [1,-2] and [3,4] -> n2 = 5, 25
    assert (out[1].n_vecs, out[1].min_norm2, out[1].max_norm2) == (2, 5, 25)
    assert out[1].mean_norm2 == 15.0
    # HALF-UP at the .5 boundary: 0.0015 * 1000 -> 2 (not 1)
    assert out[2].min_norm2 == 4


def test_dup_size_histogram_normalized(spark):
    from sutro_spark.operators.dedup import dup_size_histogram

    df = spark.createDataFrame(
        [(1, "a"), (2, "A  "), (3, "b"), (4, "c"), (5, "c")],
        "doc_id long, text string",
    )
    out = {r.cluster_size: (r.n_clusters, r.n_docs)
           for r in dup_size_histogram(df).collect()}
    assert out == {1: (1, 1), 2: (2, 4)}
