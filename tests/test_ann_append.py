"""Incremental IVF-BQ index maintenance (operators/similarity.py
ivf_bq_index / ivf_bq_route / ivf_bq_append / ivf_routing_balance).

The load-bearing claim is append == rebuild AT FROZEN PARAMETERS:
routing + encoding are per-row functions of (vector, centroids,
thresholds), so folding batches in incrementally — in any order, in
any number of batches — lands byte-identical to re-encoding the whole
corpus. The [Q] proves it cross-engine (Spark appends, the DuckDB
oracle rebuilds); these tests prove it within Spark plus the guard
and monitor semantics.
"""

import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.similarity import (
    ivf_bq_append,
    ivf_bq_index,
    ivf_bq_route,
    ivf_routing_balance,
)


def _ml(x: int) -> int:
    """Python twin of functions/stats.py _ml_sql (exact piecewise-
    linear milli-log2 of a positive int)."""
    e = x.bit_length() - 1
    p = 1 << e
    return 1000 * e + ((x - p) * 1000) // p


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def built(emb):
    base = emb.where(F.col("vec_id") % 4 != 0)
    index, cents, thr = ivf_bq_index(base, coarse_k=8, coarse_iters=2)
    return base, index, cents, thr


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_equals_rebuild_at_frozen_params(emb, built):
    base, index, cents, thr = built
    new = emb.where(F.col("vec_id") % 4 == 0)
    appended = ivf_bq_append(index, new, cents, thr)
    rebuilt = ivf_bq_route(emb, cents, thr)
    assert _rows(appended) == _rows(rebuilt)


def test_index_build_matches_route_of_base(emb, built):
    # the build's own code table is exactly the route of the build
    # corpus at the final frozen parameters (kmeans's returned
    # assignment IS nearest-final-centroid)
    base, index, cents, thr = built
    assert _rows(index) == _rows(ivf_bq_route(base, cents, thr))


def test_append_batch_order_independent(emb, built):
    base, index, cents, thr = built
    b1 = emb.where(F.col("vec_id") % 8 == 0)
    b2 = emb.where((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 != 0))
    one_way = ivf_bq_append(ivf_bq_append(index, b1, cents, thr), b2, cents, thr)
    other = ivf_bq_append(ivf_bq_append(index, b2, cents, thr), b1, cents, thr)
    assert _rows(one_way) == _rows(other)


def test_append_id_collision_raises(emb, built):
    base, index, cents, thr = built
    dup = emb.where(F.col("vec_id") == 1)  # 1 % 4 != 0 → already in index
    with pytest.raises(Exception, match="already in index"):
        ivf_bq_append(index, dup, cents, thr).collect()


def test_append_collision_unguarded_passes_through(emb, built):
    base, index, cents, thr = built
    dup = emb.where(F.col("vec_id") == 1)
    out = ivf_bq_append(index, dup, cents, thr, assert_new_ids=False)
    n_base = index.count()
    assert out.count() == n_base + 1
    assert out.where(F.col("id") == 1).count() == 2


def test_ivf_bq_topk_prebuilt_index_equals_inline(emb):
    # the serving call shape (build once via ivf_bq_index, query many)
    # must return exactly what the self-training call returns at the
    # same parameters
    from sutro_spark.operators.similarity import ivf_bq_topk

    queries = emb.where(F.col("vec_id") < 5)
    inline = ivf_bq_topk(
        emb, queries, k=3, coarse_k=8, coarse_iters=2, nprobe=2,
        rescore_multiple=4,
    )
    idx = ivf_bq_index(emb, coarse_k=8, coarse_iters=2)
    served = ivf_bq_topk(
        emb, queries, k=3, nprobe=2, rescore_multiple=4, index=idx
    )
    assert _rows(inline) == _rows(served)


def test_routing_balance_hand_check(spark):
    build = spark.createDataFrame(
        [(0,)] * 3 + [(1,)] * 1, "cluster bigint"
    )
    routed = spark.createDataFrame(
        [(0,)] * 1 + [(1,)] * 3, "cluster bigint"
    )
    got = {
        r["cluster"]: r
        for r in ivf_routing_balance(build, routed).collect()
    }
    assert set(got) == {0, 1}
    assert (got[0]["n_build"], got[0]["n_new"]) == (3, 1)
    assert got[0]["share_build_micro"] == 750_000
    assert got[0]["share_new_micro"] == 250_000
    assert got[0]["delta_share_micro"] == -500_000
    # Laplace-smoothed PSI term, replayed with the integer surrogate:
    # a=(3+1), b=(1+1), Na=(4+2), Nb=(4+2)
    t0 = ((1_000_000 * 4) // 6 - (1_000_000 * 2) // 6) * (
        _ml(4) - _ml(2) - _ml(6) + _ml(6)
    )
    t1 = ((1_000_000 * 2) // 6 - (1_000_000 * 4) // 6) * (
        _ml(2) - _ml(4) - _ml(6) + _ml(6)
    )
    assert got[0]["psi_term_nano"] == t0
    assert got[1]["psi_term_nano"] == t1
    assert got[0]["psi_nano"] == t0 + t1
    # 0.5 share swap across 2 buckets is a major shift
    assert got[0]["band"] == "major"


def test_routing_balance_matched_shares_stable(emb, built):
    base, index, cents, thr = built
    new = emb.where(F.col("vec_id") % 4 == 0)
    routed = ivf_bq_route(new, cents, thr)
    rep = ivf_routing_balance(index, routed).collect()
    # same corpus distribution → shares track the build → stable band
    assert all(r["band"] == "stable" for r in rep)
    # the verdict columns are constant across rows
    assert len({r["psi_nano"] for r in rep}) == 1


def test_routing_balance_unseen_bucket_surfaces(spark):
    # a bucket with build mass but zero routed mass (and vice versa)
    # must appear — observed-in-either universe, never dropped
    build = spark.createDataFrame([(0,), (0,), (2,)], "cluster bigint")
    routed = spark.createDataFrame([(0,), (1,)], "cluster bigint")
    got = {r["cluster"]: r for r in ivf_routing_balance(build, routed).collect()}
    assert set(got) == {0, 1, 2}
    assert got[1]["n_build"] == 0 and got[1]["n_new"] == 1
    assert got[2]["n_build"] == 1 and got[2]["n_new"] == 0
