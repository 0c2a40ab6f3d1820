"""The embedding-dedup size guard: small corpora take the exact
broadcast path; large corpora must route through the IVF-bucketed plan
WITHOUT any driver-side collect of the corpus."""

from __future__ import annotations

import pyspark.sql
import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.similarity import (
    brute_force_topk,
    bucketed_dedup_pairs,
    embedding_dedup_pairs,
    rh_lsh_dedup_pairs,
    rh_signs,
)


def _clustered(spark, n_per=6, n_clusters=3, dim=8):
    """n_clusters tight clusters: members of a cluster are near-identical
    (cosine ~1), cross-cluster vectors nearly orthogonal."""
    rows = []
    for c in range(n_clusters):
        base = [1.0 if i == c else 0.0 for i in range(dim)]
        for m in range(n_per):
            v = list(base)
            v[dim - 1] = 0.001 * m  # tiny perturbation, keeps sim > 0.999
            # interleave ids across clusters so the smallest n_clusters
            # ids — the deterministic IVF seeds — cover every cluster
            rows.append((m * 10 + c, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_exact_and_bucketed_agree_on_clustered_corpus(spark):
    df = _clustered(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(df, threshold=0.99, max_collect_rows=10_000).collect()
    }
    bucketed = {
        (r.id_a, r.id_b)
        for r in bucketed_dedup_pairs(df, threshold=0.99, num_centroids=3, nprobe=1).collect()
    }
    assert exact  # non-trivial: each cluster contributes C(n_per,2) pairs
    assert bucketed == exact


def test_large_corpus_never_collected(spark, monkeypatch):
    df = _clustered(spark)
    n = df.count()

    def forbidden_collect(self):
        raise AssertionError("driver-side collect() above max_collect_rows")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", forbidden_collect)
    out = embedding_dedup_pairs(df, threshold=0.99, max_collect_rows=n - 1)
    pdf = out.toPandas()  # toPandas does not route through DataFrame.collect
    monkeypatch.undo()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"id_a", "id_b", "sim"}
    assert (pdf["id_a"] < pdf["id_b"]).all()


def test_small_corpus_still_exact(spark):
    df = _clustered(spark, n_per=3, n_clusters=2)
    out = embedding_dedup_pairs(df, threshold=0.99).toPandas()
    # each cluster of 3 near-identical vectors → 3 pairs
    assert len(out) == 6
    assert (out["sim"] >= 0.99).all()


def test_rh_signs_deterministic_and_balanced():
    a = rh_signs(16, 64)
    assert a == rh_signs(16, 64)
    assert {s for plane in a for s in plane} == {-1, 1}
    # sha256-derived bits are ~balanced: no plane is constant
    assert all(-64 < sum(plane) < 64 for plane in a)
    # planes are distinct (a repeated plane wastes a band)
    assert len({tuple(p) for p in a}) == 16


def test_rh_lsh_full_recall_on_tight_clusters(spark):
    # near-identical vectors agree on EVERY sketch bit → recall is 1.0
    # for tight clusters regardless of banding
    df = _clustered(spark, dim=8)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(df, threshold=0.99, max_collect_rows=10_000).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in rh_lsh_dedup_pairs(df, dim=8, threshold=0.99).collect()
    }
    assert exact and lsh == exact


def test_rh_lsh_precision_is_exact(spark):
    # whatever candidates banding admits, the verify step keeps only
    # true >=threshold pairs — so the result is a SUBSET of exact pairs
    df = _clustered(spark, n_per=4, n_clusters=4, dim=8)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(df, threshold=0.5, max_collect_rows=10_000).collect()
    }
    lsh = {
        (r.id_a, r.id_b) for r in rh_lsh_dedup_pairs(df, dim=8, threshold=0.5).collect()
    }
    assert lsh <= exact


def test_sq_topk_quantized_matches_exact_neighbors(spark):
    from sutro_spark.operators.similarity import quantize_embeddings, sq_topk

    df = _clustered(spark, n_per=5, n_clusters=4, dim=8)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(df, df.where(F.col("vec_id") < 2), k=3).collect()
    }
    quant = {
        (r.query_id, r.rank): r.neighbor_id
        for r in sq_topk(df, df.where(F.col("vec_id") < 2), k=3).collect()
    }
    # int8 quantization preserves tight-cluster neighbor ORDER here
    assert quant == exact
    # rescore path: exact float sims over the candidate set
    rescored = sq_topk(
        df, df.where(F.col("vec_id") < 2), k=3, rescore_multiple=3
    ).collect()
    exact_sims = {
        (r.query_id, r.neighbor_id): r.sim
        for r in brute_force_topk(df, df.where(F.col("vec_id") < 2), k=9).collect()
    }
    for r in rescored:
        assert r.sim == exact_sims[(r.query_id, r.neighbor_id)]
    # quantization invariants: int8 range, exact integer squared norm
    q = quantize_embeddings(df).collect()
    for row in q:
        assert all(-127 <= x <= 127 for x in row.qv)
        assert row.qn2 == sum(x * x for x in row.qv)


def test_sq_topk_zero_vectors_never_match(spark):
    from sutro_spark.operators.similarity import sq_topk

    rows = [(0, [0.0] * 8), (1, [1.0] * 8), (2, [1.0] * 8), (3, [0.5] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sq_topk(df, df.where(F.col("vec_id") == 1), k=3).collect()
    sims = {r.neighbor_id: r.sim_q for r in out}
    assert sims[0] == 0.0  # zero vector: defined 0 similarity, no NaN/div0
    assert sims[2] == 1.0 and sims[3] == 1.0  # parallel → cosine 1 survives quant


def test_rh_lsh_hot_bucket_cap_bounds_candidates(spark):
    # a degenerate corpus: 60 identical vectors share EVERY band key
    # (one hot bucket per band). With max_bucket below the cluster size
    # the hot buckets are dropped before any id list is collected, so
    # zero candidate pairs reach the verify step; with the default cap
    # the 60·59/2 true pairs all survive. Distinct "normal" vectors
    # around it must be unaffected either way.
    rows = [(i, [1.0] * 8) for i in range(60)]
    rows += [(100 + i, [float(j == i) for j in range(8)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = rh_lsh_dedup_pairs(
        df, dim=8, threshold=0.99, max_bucket=10
    ).collect()
    hot_ids = {r.id_a for r in capped} | {r.id_b for r in capped}
    assert not (hot_ids & set(range(60)))  # hot cluster never pairs
    full = rh_lsh_dedup_pairs(df, dim=8, threshold=0.99).collect()
    assert sum(1 for r in full if r.id_a < 60 and r.id_b < 60) == 60 * 59 // 2


def test_rh_lsh_validates_banding():
    with pytest.raises(ValueError):
        rh_lsh_dedup_pairs(None, planes=16, bands=5)
    # narrow bands (tiny key alphabet) degenerate to all-pairs — rejected
    with pytest.raises(ValueError, match="band width"):
        rh_lsh_dedup_pairs(None, planes=16, bands=8)


def test_jl_project_matches_closed_form_and_preserves_distance(spark):
    import numpy as np

    from sutro_spark.operators.similarity import RH_SCALE, jl_project, jl_signs

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 64).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    )
    out = {
        r["id"]: np.array(r["projected"], dtype=np.int64)
        for r in jl_project(df, out_dim=16).collect()
    }
    # exact closed form: floor(v*scale) @ S.T — integer, no tolerance
    S = np.asarray(jl_signs(16, 64), dtype=np.int64)
    Q = np.floor(vecs * RH_SCALE).astype(np.int64)
    P = Q @ S.T
    for i in range(len(vecs)):
        assert (out[i] == P[i]).all()
    # JL lemma: squared distances preserved in expectation up to the
    # factor out_dim * scale^2; with r=16 the per-pair std is ~35%,
    # but the MEAN ratio over 39 pairs concentrates much tighter
    ratios = []
    for i in range(1, len(vecs)):
        d2_orig = float(((vecs[0] - vecs[i]) ** 2).sum())
        d2_proj = float(((P[0] - P[i]).astype(np.float64) ** 2).sum())
        ratios.append(d2_proj / (16 * RH_SCALE**2 * d2_orig))
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean


def test_jl_project_validation(spark):
    import pytest

    from sutro_spark.operators.similarity import jl_project

    with pytest.raises(ValueError, match="out_dim"):
        jl_project(None, out_dim=0)


def test_jl_project_empty_and_null_probe_guard(spark):
    """ADVICE r9: empty input / NULL first vector raise a named error
    instead of TypeError; explicit dim= skips the probe."""
    import pytest

    from sutro_spark.operators.similarity import jl_project

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty input or NULL first"):
        jl_project(empty, out_dim=2)
    nullv = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty input or NULL first"):
        jl_project(nullv, out_dim=2)
    # explicit dim: no probe job, empty in -> empty out
    assert jl_project(empty, out_dim=2, dim=4).count() == 0


def test_embedding_anisotropy_closed_form_and_degenerate(spark):
    """Closed form: for vectors {e1, e1, e2} at scale, pairwise dots
    sum = 2*scale^2 (the e1,e1 pair both orders), T = 3*scale^2 ->
    anisotropy = 2/(2*3) = 1/3. Identical vectors -> exactly 1.
    Orthogonal set -> 0. Degenerate (n<2, zero vectors) -> NULL."""
    from sutro_spark.operators.similarity import embedding_anisotropy

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_anisotropy(df).collect()[0]
    assert (r["n_vecs"], r["dim"]) == (3, 2)
    assert r["t_self"] == 3 * 1000 * 1000
    assert abs(r["anisotropy"] - 1.0 / 3.0) < 1e-12

    same = spark.createDataFrame(
        [(i, [0.6, 0.8]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    assert abs(embedding_anisotropy(same).collect()[0]["anisotropy"] - 1.0) < 1e-12

    ortho = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    assert embedding_anisotropy(ortho).collect()[0]["anisotropy"] == 0.0

    one = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert embedding_anisotropy(one).collect()[0]["anisotropy"] is None
    zero = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0])], "vec_id long, embedding array<double>"
    )
    assert embedding_anisotropy(zero).collect()[0]["anisotropy"] is None


def test_center_embeddings_exact_and_kills_mean(spark):
    """centered_d = n*q_d - S_d in (n*scale)-ths: exact integers,
    column sums exactly zero (the mean direction is gone), and cosines
    are preserved up to the positive n*scale factor."""
    from pyspark.sql import functions as F

    from sutro_spark.operators.similarity import center_embeddings

    rows = [(0, [1.0, 0.5]), (1, [2.0, 0.5]), (2, [3.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = center_embeddings(df)
    got = {r["vec_id"]: (list(r["centered"]), r["denom"]) for r in out.collect()}
    # S = (6000, 0); n = 3 -> centered = 3*q - S
    assert got[0] == ([3 * 1000 - 6000, 3 * 500 - 0], 3000)
    assert got[1] == ([3 * 2000 - 6000, 3 * 500 - 0], 3000)
    assert got[2] == ([3 * 3000 - 6000, 3 * -1000 - 0], 3000)
    sums = (
        out.select(F.posexplode("centered").alias("d", "c"))
        .groupBy("d")
        .agg(F.sum("c").alias("s"))
        .collect()
    )
    assert all(r["s"] == 0 for r in sums)


def test_pca_top_direction_recovers_dominant_axis(spark):
    """Vectors spread along (3,4): two rounds recover the unit
    direction (600, 800) in millis; the d=-1 row carries a positive
    magnitude; checkpoint hygiene leaves only the returned frames."""
    from sutro_spark.operators.similarity import pca_top_direction

    rows = []
    for i in range(200):
        t = (i % 7 - 3) / 3.0
        rows.append((i, [3.0 * t + 0.01 * (i % 5), 4.0 * t - 0.01 * (i % 3)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["d"]: r["v_milli"] for r in pca_top_direction(df, rounds=3).collect()}
    assert (out[0], out[1]) == (600, 800)
    assert out[-1] > 0
    import pytest

    with pytest.raises(ValueError, match="rounds"):
        pca_top_direction(df, rounds=0)


def test_pca_top_direction_is_deterministic_and_unit(spark):
    from sutro_spark.operators.similarity import pca_top_direction

    df = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 3) % 5), 1.0]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    a = sorted((r["d"], r["v_milli"]) for r in pca_top_direction(df).collect())
    b = sorted((r["d"], r["v_milli"]) for r in pca_top_direction(df).collect())
    assert a == b
    comp = [v for d, v in a if d >= 0]
    n2 = sum(x * x for x in comp)
    # quantized unit vector: ||v||^2 within rounding of scale^2
    assert abs(n2 - 1000 * 1000) < 3000


def test_remove_top_direction_exact_orthogonality(spark):
    """all-but-the-top composed end-to-end: residuals are EXACTLY
    orthogonal to the removed direction (r . v == 0, integer theorem),
    removal is idempotent up to scaling, and anisotropy collapses on
    the residuals for a corpus dominated by one direction."""
    from pyspark.sql import functions as F

    from sutro_spark.operators.similarity import (
        center_embeddings,
        pca_top_direction,
        remove_top_direction,
    )

    rows = []
    for i in range(120):
        t = (i % 9 - 4) / 4.0
        # dominant direction (3,4)/5 plus a small orthogonal wiggle
        w = (i % 5 - 2) / 40.0
        rows.append((i, [3.0 * t / 5.0 + 4.0 * w / 5.0, 4.0 * t / 5.0 - 3.0 * w / 5.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cen = center_embeddings(df)
    direction = pca_top_direction(df, rounds=3)
    res = remove_top_direction(cen, direction)
    v = {r["d"]: r["v_milli"] for r in direction.where("d >= 0").collect()}
    got = res.collect()
    assert len(got) == 120
    for r in got:
        dot = sum(x * v[d] for d, x in enumerate(r["residual"]))
        assert dot == 0, (r["vec_id"], dot)
        assert r["denom"] > 0
    # the residual variance is the small orthogonal wiggle only:
    # max |residual/denom| well below the dominant component's span
    mx = max(abs(x) / r["denom"] for r in got for x in r["residual"])
    assert mx < 0.12, mx


def test_remove_top_direction_orthogonality_property(spark):
    """Property: for ANY direction table and ANY centered integers,
    r . v == 0 exactly (hypothesis over random small cases)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sutro_spark.operators.similarity import remove_top_direction

    dim = 3

    @settings(max_examples=15, deadline=None)
    @given(
        vecs=st.lists(
            st.lists(
                st.integers(min_value=-50_000, max_value=50_000),
                min_size=dim, max_size=dim,
            ),
            min_size=1, max_size=6,
        ),
        direction=st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=dim, max_size=dim,
        ),
    )
    def check(vecs, direction):
        cen = spark.createDataFrame(
            [(i, v, 1000) for i, v in enumerate(vecs)],
            "vec_id long, centered array<bigint>, denom long",
        )
        dirn = spark.createDataFrame(
            [(d, v) for d, v in enumerate(direction)] + [(-1, 0)],
            "d int, v_milli long",
        )
        for r in remove_top_direction(cen, dirn).collect():
            dot = sum(x * direction[d] for d, x in enumerate(r["residual"]))
            assert dot == 0, (r["vec_id"], dot)

    check()


def test_empty_embedding_rows_survive_centering_and_removal(spark):
    """r11 (ADVICE): one empty embedding array must not fail the job.
    The old sequence(1, size(arr)) construction descended to [1, 0] on
    an empty array and element_at(.., 0) raised; the (x, i) transform
    form yields an empty output row instead."""
    from sutro_spark.operators.similarity import (
        center_embeddings,
        remove_top_direction,
    )
    from sutro_spark.streaming.sketches import _anisotropy_state_rows

    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (2, []), (3, [5.0, 7.0])],
        "doc_id long, embedding array<double>",
    )
    cent = {
        r["doc_id"]: r["centered"]
        for r in center_embeddings(df, "doc_id", "embedding").collect()
    }
    assert cent[2] == []
    # non-empty rows still centered exactly: 3 * 1000*x - col_sum
    assert cent[1] == [3 * 1000 - 6000, 3 * 3000 - 10000]
    direction = spark.createDataFrame(
        [(0, 1000), (1, 0)], "d long, v_milli long"
    )
    res = {
        r["doc_id"]: r["residual"]
        for r in remove_top_direction(
            df.select(
                "doc_id",
                F.expr(
                    "transform(embedding, x -> CAST(x * 1000 AS BIGINT))"
                ).alias("vec"),
                F.lit(1000).cast("long").alias("denom"),
            ),
            direction,
            id_column="doc_id",
            vector_column="vec",
        ).collect()
    }
    assert res[2] == []
    # streaming anisotropy state: the empty row contributes exactly the
    # count row and a zero self-dot row — no corruption, no failure
    state = (
        spark.createDataFrame([([],)], "embedding array<double>")
        .select(
            F.expr(
                "transform(embedding, x -> CAST(x * 1000 AS BIGINT))"
            ).alias("__q")
        )
        .select(F.explode(_anisotropy_state_rows()).alias("r"))
        .select("r.d", "r.x")
        .collect()
    )
    assert {(r["d"], r["x"]) for r in state} == {(-1, 1), (-2, 0)}


def test_anisotropy_sharded_matches_single_shard_and_pools_exactly(spark):
    """r11 (VERDICT #7): the shard-and-average escape hatch. With
    n_shards=1 the pooled estimator IS the exact diagnostic; with many
    shards on an all-identical corpus the estimate is exactly 1 (every
    within-shard pair dots to the norm); on a mixed corpus the pooled
    integers must equal the per-shard hand computation."""
    import math

    from sutro_spark.operators.similarity import (
        embedding_anisotropy,
        embedding_anisotropy_sharded,
    )

    rows = [(i, [1.0, 0.0]) if i % 3 else (i, [0.0, 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    g = embedding_anisotropy(df).collect()[0]
    s1 = embedding_anisotropy_sharded(df, n_shards=1).collect()[0]
    assert (s1["n_vecs"], s1["dim"], s1["t_self"]) == (
        g["n_vecs"], g["dim"], g["t_self"],
    )
    # n_shards=1: pair_dot_sum == ||S||^2 - T and the estimator equals
    # the exact value (same rational, one extra exact product each side)
    assert s1["pair_dot_sum"] == g["s_norm2"] - g["t_self"]
    assert s1["n_pairs"] == g["n_vecs"] * (g["n_vecs"] - 1)
    assert math.isclose(s1["anisotropy"], g["anisotropy"], rel_tol=1e-12)

    same = spark.createDataFrame(
        [(i, [0.6, 0.8]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    r = embedding_anisotropy_sharded(same, n_shards=8).collect()[0]
    assert r["anisotropy"] == 1.0

    # pooled integers == sum over the per-shard exact states, computed
    # independently by slicing the corpus with the same hash sharding
    K = 4
    r4 = embedding_anisotropy_sharded(df, n_shards=K).collect()[0]
    pair_dot = n_pairs = 0
    for k in range(K):
        part = df.where(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(K)) == k)
        gk = embedding_anisotropy(part).collect()[0]
        pair_dot += gk["s_norm2"] - gk["t_self"]
        n_pairs += gk["n_vecs"] * (gk["n_vecs"] - 1)
    assert r4["pair_dot_sum"] == pair_dot
    assert r4["n_pairs"] == n_pairs
    assert math.isclose(
        r4["anisotropy"],
        (pair_dot * r4["n_vecs"]) / (n_pairs * r4["t_self"]),
        rel_tol=1e-12,
    )
    # estimator quality: within-shard pairs are random pairs, so the
    # sharded estimate sits near the exact value on this mixed corpus
    assert abs(r4["anisotropy"] - g["anisotropy"]) < 0.15

    with pytest.raises(ValueError):
        embedding_anisotropy_sharded(df, n_shards=0)


def test_anisotropy_sharded_finish_survives_int64_product_overflow(spark):
    """r12 ADVICE: the finishing ratio must cast each factor to DOUBLE
    BEFORE multiplying — n_pairs * t_self and pair_dot_sum * n_vecs
    overflow int64 well below the shard-state bound. 100 identical
    vectors at component 2000.0 give n_pairs * t_self ~ 2.5e20 (> 2^63
    — the old BIGINT product wrapped and returned a silently wrong
    anisotropy); the true anisotropy of an all-identical corpus is
    exactly 1."""
    import math

    from sutro_spark.operators.similarity import embedding_anisotropy_sharded

    df = spark.createDataFrame(
        [(i, [2000.0] * 64) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    r = embedding_anisotropy_sharded(df, n_shards=1).collect()[0]
    # the integer state itself stays exact (it is within bounds)...
    assert r["t_self"] == 100 * 64 * (2000 * 1000) ** 2
    assert r["n_pairs"] == 100 * 99
    assert r["pair_dot_sum"] == 100 * 99 * 64 * (2000 * 1000) ** 2
    # ...and the products each exceed int64, so only the double-cast
    # finish gets the ratio right
    assert r["n_pairs"] * r["t_self"] > 2**63
    assert math.isclose(r["anisotropy"], 1.0, rel_tol=1e-12)
