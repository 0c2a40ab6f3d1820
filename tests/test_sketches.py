"""KMV distinct sketch and per-group weighted sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from sutro_spark.functions.sketches import kmv_distinct
from sutro_spark.functions.sampling import weighted_topk_per_group


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([("g", i % 10) for i in range(100)], "grp string, k bigint")
    row = kmv_distinct(df, "grp", "k", k=64).collect()[0]
    assert row["n_le_k"] == 10 and row["est_distinct"] == 10.0


def test_kmv_estimate_above_k(spark):
    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "grp string, k bigint")
    row = kmv_distinct(df, "grp", "k", k=128).collect()[0]
    assert row["n_le_k"] == 128
    # KMV with k=128 has ~1/sqrt(128) ≈ 9% relative std error; 3σ bound
    assert abs(row["est_distinct"] - n) / n < 0.27


def test_kmv_merge_invariance(spark):
    # the estimate only depends on the distinct key set, not on row
    # counts or partitioning — duplicating every row changes nothing
    df = spark.createDataFrame([("g", i) for i in range(1000)], "grp string, k bigint")
    doubled = df.unionAll(df).repartition(7)
    a = kmv_distinct(df, "grp", "k", k=64).collect()[0]["est_distinct"]
    b = kmv_distinct(doubled, "grp", "k", k=64).collect()[0]["est_distinct"]
    assert a == b


def test_weighted_group_quota(spark):
    rows = [(g * 100 + i, f"s{g}", 1 + (i % 3)) for g in range(3) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w bigint")
    out = weighted_topk_per_group(df, "source", "doc_id", "w", 4)
    got = out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {r["source"]: r["n"] for r in got} == {"s0": 4, "s1": 4, "s2": 4}
    ranks = {r["sample_rank"] for r in out.where(F.col("source") == "s0").collect()}
    assert ranks == {1, 2, 3, 4}


def test_hll_estimate_accuracy(spark):
    from sutro_spark.functions.sketches import hll_distinct

    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "grp string, k bigint")
    row = hll_distinct(df, "grp", "k").collect()[0]
    # m=64 → ~1.04/sqrt(64) ≈ 13% relative std error; allow 3σ
    assert abs(row["est_hll"] - n) / n < 0.4
    assert row["n_zero"] == 0  # 5000 keys over 64 registers: all hit


def test_hll_duplicate_and_partition_invariance(spark):
    from sutro_spark.functions.sketches import hll_distinct

    df = spark.createDataFrame([("g", i) for i in range(800)], "grp string, k bigint")
    a = hll_distinct(df, "grp", "k").collect()[0]
    b = hll_distinct(df.unionAll(df).repartition(13), "grp", "k").collect()[0]
    assert a["s_scaled"] == b["s_scaled"] and a["est_hll"] == b["est_hll"]


def test_hll_empty_registers_counted(spark):
    from sutro_spark.functions.sketches import hll_distinct

    # 3 distinct keys can fill at most 3 of 64 registers; empty ones
    # must still contribute 2^27 to the scaled harmonic sum
    df = spark.createDataFrame([("g", i) for i in range(3)], "grp string, k bigint")
    row = hll_distinct(df, "grp", "k").collect()[0]
    assert row["n_zero"] >= 61
    assert row["s_scaled"] >= 61 * (1 << 27)


def test_hll_p_validation(spark):
    import pytest as _pytest

    from sutro_spark.functions.sketches import hll_distinct

    df = spark.createDataFrame([("g", 1)], "grp string, k bigint")
    with _pytest.raises(ValueError):
        hll_distinct(df, "grp", "k", p=2)


def test_cms_overestimate_and_exact_small(spark):
    from sutro_spark.functions.sketches import cms_counts, cms_estimate

    rows = [("u%d" % (i % 20),) for i in range(400)] + [("hot",)] * 100
    df = spark.createDataFrame(rows, "k string")
    sk = cms_counts(df, "k")
    cands = df.groupBy("k").count().withColumnRenamed("count", "true_n")
    est = {r.key: r.est_count for r in cms_estimate(sk, cands, "k").collect()}
    true = {r.k: r.true_n for r in cands.collect()}
    for k, t in true.items():
        assert est[k] >= t  # CMS never under-estimates
    assert est["hot"] >= 100


def test_cms_merge_additivity(spark):
    from sutro_spark.functions.sketches import cms_counts

    df = spark.createDataFrame([("k%d" % (i % 7),) for i in range(210)], "k string")
    a, b = df.randomSplit([0.5, 0.5], seed=7)
    whole = {(r.row, r.bucket): r.cnt for r in cms_counts(df, "k").collect()}
    merged: dict = {}
    for part in (a, b):
        for r in cms_counts(part, "k").collect():
            merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.cnt
    assert merged == whole


def test_cms_validation(spark):
    import pytest as _pytest

    from sutro_spark.functions.sketches import cms_counts

    df = spark.createDataFrame([("x",)], "k string")
    with _pytest.raises(ValueError):
        cms_counts(df, "k", depth=0)


def test_sketches_ignore_null_keys(spark):
    from sutro_spark.functions.sketches import (
        cms_counts,
        hll_distinct,
        kmv_distinct,
    )

    clean = spark.createDataFrame([("g", i) for i in range(50)], "grp string, k bigint")
    dirty = clean.unionAll(
        spark.createDataFrame([("g", None)] * 7, "grp string, k bigint")
    )
    h1 = hll_distinct(clean, "grp", "k").collect()[0]
    h2 = hll_distinct(dirty, "grp", "k").collect()[0]
    assert (h1.n_zero, h1.s_scaled, h1.est_hll) == (h2.n_zero, h2.s_scaled, h2.est_hll)
    k1 = kmv_distinct(clean, "grp", "k").collect()[0]
    k2 = kmv_distinct(dirty, "grp", "k").collect()[0]
    assert (k1.n_le_k, k1.est_distinct) == (k2.n_le_k, k2.est_distinct)
    c1 = {(r.row, r.bucket): r.cnt for r in cms_counts(clean.select(F.col("k").cast("string").alias("k")), "k").collect()}
    c2 = {(r.row, r.bucket): r.cnt for r in cms_counts(dirty.select(F.col("k").cast("string").alias("k")), "k").collect()}
    assert c1 == c2


def test_kmv_join_estimate_accuracy(spark, sf_dir):
    from sutro_spark.functions.sketches import kmv_join_estimate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = kmv_join_estimate(
        li, o, "l_orderkey", "o_orderkey", k=128, exact=True
    ).first()
    assert row["exact_join_rows"] == li.count()  # every lineitem matches
    # sketch estimate within 15% of truth at k=128
    assert abs(row["est_join_rows"] - row["exact_join_rows"]) <= (
        0.15 * row["exact_join_rows"]
    )


def test_kmv_join_estimate_disjoint_keys(spark):
    from sutro_spark.functions.sketches import kmv_join_estimate

    a = spark.range(0, 500).selectExpr("id AS k")
    b = spark.range(10_000, 10_500).selectExpr("id AS k")
    row = kmv_join_estimate(a, b, "k", exact=True).first()
    assert row["exact_join_rows"] == 0
    # sub-k sides carry complete sketches: the overlap estimate is exact
    assert row["k_int"] == 0 and row["est_join_rows"] == 0


def test_kmv_join_estimate_validation(spark):
    import pytest

    from sutro_spark.functions.sketches import kmv_join_estimate

    with pytest.raises(ValueError, match=">= 2"):
        kmv_join_estimate(None, None, "k", k=1)


def test_kmv_merge_is_lossless(spark, sf_dir):
    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import (
        kmv_distinct,
        kmv_from_partials,
        kmv_partials,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = {
        r["grp"]: (r["n_le_k"], r["est_distinct"])
        for r in kmv_distinct(ev, "event_type", "user_id", k=32).collect()
    }
    daily = kmv_partials(
        ev.select(
            F.concat(
                F.col("event_type"), F.lit("|"), F.to_date("ts").cast("string")
            ).alias("gd"),
            "user_id",
        ),
        "gd",
        "user_id",
        k=32,
    )
    merged = {
        r["grp"]: (r["n_le_k"], r["est_distinct"])
        for r in kmv_from_partials(
            daily.select(F.split("grp", r"\|")[0].alias("grp"), "h"), k=32
        ).collect()
    }
    # merge is LOSSLESS: per-day partials merged == direct, exactly
    assert merged == direct


def test_kmv_set_estimates_exact_below_k(spark):
    from sutro_spark.functions.sketches import kmv_set_estimates

    # both sides < k distinct: every estimate is EXACT
    left = spark.createDataFrame([(i,) for i in range(30)], ["id"])
    right = spark.createDataFrame([(i,) for i in range(20, 50)], ["id"])
    r = kmv_set_estimates(left, right, "id", k=64).first()
    assert (r["n_left_le_k"], r["n_right_le_k"]) == (30, 30)
    assert r["est_left"] == 30.0 and r["est_right"] == 30.0
    assert r["est_union"] == 50.0
    assert r["est_intersection"] == 10.0
    assert r["est_left_only"] == 20.0 and r["est_right_only"] == 20.0


def test_kmv_set_estimates_sketched_accuracy(spark):
    from sutro_spark.functions.sketches import kmv_set_estimates

    # 2000 vs 2000 with 1000 shared, k=256: KMV error ~1/sqrt(k-2) ~ 6%;
    # inclusion-exclusion roughly doubles it — accept 25% on overlap
    left = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    right = spark.createDataFrame([(i,) for i in range(1000, 3000)], ["id"])
    r = kmv_set_estimates(left, right, "id", k=256).first()
    assert abs(r["est_left"] - 2000) / 2000 < 0.15
    assert abs(r["est_union"] - 3000) / 3000 < 0.15
    assert abs(r["est_intersection"] - 1000) / 1000 < 0.25
    # disjoint sets clamp at zero, never negative
    lo = spark.createDataFrame([(i,) for i in range(500)], ["id"])
    hi = spark.createDataFrame([(i,) for i in range(10_000, 10_500)], ["id"])
    d = kmv_set_estimates(lo, hi, "id", k=64).first()
    assert d["est_intersection"] >= 0.0


def test_kmv_set_estimates_validation(spark):
    import pytest

    from sutro_spark.functions.sketches import kmv_set_estimates

    with pytest.raises(ValueError, match="k must be"):
        kmv_set_estimates(None, None, "id", k=1)


def test_hll_set_estimates_accuracy_and_clamp(spark):
    from sutro_spark.functions.sketches import hll_set_estimates

    # 2000 vs 2000 sharing 1000; p=6 (m=64) -> ~13% std error per
    # estimate; inclusion-exclusion compounds it — generous bounds,
    # deterministic values (sha-derived registers, no RNG)
    left = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    right = spark.createDataFrame([(i,) for i in range(1000, 3000)], ["id"])
    r = hll_set_estimates(left, right, "id").first()
    assert abs(r["est_left"] - 2000) / 2000 < 0.35
    assert abs(r["est_union"] - 3000) / 3000 < 0.35
    assert 0 < r["est_intersection"] < 2500
    # identical sides: intersection ~ each side, differences clamp ~0
    same = hll_set_estimates(left, left, "id").first()
    assert same["est_left_only"] == 0.0 and same["est_right_only"] == 0.0
    assert same["est_intersection"] == same["est_left"]
    # disjoint sides never go negative
    lo = spark.createDataFrame([(i,) for i in range(300)], ["id"])
    hi = spark.createDataFrame([(i,) for i in range(9000, 9300)], ["id"])
    d = hll_set_estimates(lo, hi, "id").first()
    assert d["est_intersection"] >= 0.0


def test_hll_corrected_small_range_beats_raw(spark):
    """r10 (verdict #7): linear counting from n_zero recovers accuracy
    in the small-cardinality regime where raw HLL at p=6 is biased
    high; large-range rows pass through unchanged."""
    from sutro_spark.functions.sketches import hll_corrected, hll_distinct

    for n in (10, 25, 50):
        df = spark.createDataFrame(
            [("g", f"key{i}") for i in range(n)], ["grp", "k"]
        )
        row = hll_corrected(hll_distinct(df, "grp", "k")).collect()[0]
        raw_err = abs(row["est_hll"] - n) / n
        cor_err = abs(row["est_corrected"] - n) / n
        assert cor_err <= raw_err, (n, row["est_hll"], row["est_corrected"])
        assert cor_err < 0.15, (n, row["est_corrected"])
    # large range (no empty registers / est above 2.5m): passthrough
    big = spark.createDataFrame(
        [("g", f"key{i}") for i in range(5000)], ["grp", "k"]
    )
    row = hll_corrected(hll_distinct(big, "grp", "k")).collect()[0]
    assert row["est_corrected"] == row["est_hll"]


def test_kmv_set_estimates_plan_topk_is_distributed(spark):
    """r10 (verdict #8, corrected): InferWindowGroupLimit does NOT
    fire on an un-partitioned window (probed this round — the r9
    assumption was wrong), so the global top-k must plan as
    TakeOrderedAndProject (per-partition top-k merged on the driver),
    never as a single-partition Window sort over all distinct hashes."""
    from sutro_spark.functions.sketches import kmv_set_estimates

    left = spark.range(0, 2000).select(
        (F.col("id") % 700).cast("string").alias("k")
    )
    right = spark.range(0, 2000).select(
        ((F.col("id") % 600) + 400).cast("string").alias("k")
    )
    out = kmv_set_estimates(left, right, "k", k=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]


# --- mergeable Misra-Gries (Agarwal et al., PODS 2012) -------------------


def _mg_df(spark):
    # exact power-law stream: key = lowest set bit of the row id
    rows = [(i, i & -i if i else 0) for i in range(1, 513)]
    return spark.createDataFrame(rows, "rid long, key long")


def test_mg_underestimates_within_bound(spark):
    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import mg_heavy_hitters

    df = _mg_df(spark)
    k = 3
    out = {r["key"]: r["est"] for r in mg_heavy_hitters(
        df, "key", "rid", k=k, buckets=4).collect()}
    exact = {str(r["key"]): r["c"] for r in df.groupBy("key")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    assert len(out) <= k
    for key, est in out.items():
        assert est <= exact[key]  # never overestimates
    worst = max(exact[key] - out.get(key, 0) for key in exact)
    assert worst <= n // (k + 1)  # mergeability bound, any fold order


def test_mg_bucket_summaries_bounded_and_positive(spark):
    from sutro_spark.functions.sketches import mg_bucket_summaries

    s = mg_bucket_summaries(_mg_df(spark), "key", "rid", k=2, buckets=4)
    rows = s.collect()
    per_bucket = {}
    for r in rows:
        assert r["est"] > 0
        per_bucket.setdefault(r["bucket"], 0)
        per_bucket[r["bucket"]] += 1
    assert all(v <= 2 for v in per_bucket.values())


def test_mg_merge_matches_direct_truncation(spark):
    # merging a summary with an EMPTY summary must be a pure
    # re-truncation (idempotent at <= k keys: nothing changes)
    from sutro_spark.functions.sketches import mg_merge

    left = spark.createDataFrame(
        [("a", 10), ("b", 5), ("c", 2)], "key string, est long"
    )
    empty = spark.createDataFrame([], "key string, est long")
    out = {r["key"]: r["est"] for r in mg_merge(left, empty, k=3).collect()}
    assert out == {"a": 10, "b": 5, "c": 2}
    # at k=2 the 3rd-largest (2) becomes the threshold
    out2 = {r["key"]: r["est"] for r in mg_merge(left, empty, k=2).collect()}
    assert out2 == {"a": 8, "b": 3}


def test_mg_validates_k(spark):
    import pytest as _pytest

    from sutro_spark.functions.sketches import mg_bucket_summaries

    with _pytest.raises(ValueError):
        mg_bucket_summaries(_mg_df(spark), "key", "rid", k=0, buckets=2)


# --- q-digest (Shrivastava et al. 2004) -----------------------------------


def _qd_exact_err(vals, rows):
    errs = []
    for r in rows:
        true_rank = sum(1 for v in vals if v <= r["value"])
        errs.append(abs(true_rank - r["target_rank"]))
    return max(errs)


def test_qdigest_bound_and_count_preservation(spark):
    import random

    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    rng = random.Random(11)
    # skewed: heavy mass at low values plus a long tail
    vals = [rng.randint(0, 60) for _ in range(3000)] + [
        rng.randint(0, 1023) for _ in range(1000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    bits, k = 10, 32
    dig = qdigest_build(df, "x", bits=bits, k=k)
    nodes = dig.collect()
    assert sum(r["cnt"] for r in nodes) == len(vals)  # mass conserved
    assert len(nodes) <= 3 * k  # the q-digest size theorem
    rows = qdigest_quantiles(dig, bits=bits).collect()
    assert _qd_exact_err(vals, rows) <= bits * len(vals) // k


def test_qdigest_merge_mass_and_bound(spark):
    import random

    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_merge,
        qdigest_quantiles,
    )

    rng = random.Random(13)
    vals = [rng.randint(0, 255) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    bits, k = 8, 16
    d1 = qdigest_build(df.where(F.col("x") % 2 == 0), "x", bits=bits, k=k)
    d2 = qdigest_build(df.where(F.col("x") % 2 == 1), "x", bits=bits, k=k)
    m = qdigest_merge(d1, d2, bits=bits, k=k)
    assert sum(r["cnt"] for r in m.collect()) == len(vals)
    # merged error: each input's bits*n_i/k plus the recompression's
    # bits*n/k — bounded by 2 * bits * n / k
    rows = qdigest_quantiles(m, bits=bits).collect()
    assert _qd_exact_err(vals, rows) <= 2 * bits * len(vals) // k


def test_qdigest_small_input_is_exact_histogram(spark):
    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    # n < k -> thr 0 -> no compression: the digest IS the exact
    # histogram and every quantile is exact
    df = spark.createDataFrame([(v,) for v in [1, 5, 9, 13]], "x long")
    dig = qdigest_build(df, "x", bits=6, k=16)
    assert {(r["id"] - 64, r["cnt"]) for r in dig.collect()} == {
        (1, 1), (5, 1), (9, 1), (13, 1),
    }
    rows = {r["q_milli"]: r["value"] for r in qdigest_quantiles(dig, bits=6).collect()}
    assert rows[500] == 5 and rows[990] == 13


def test_qdigest_validates_and_guards(spark):
    import pytest as _pytest

    from sutro_spark.functions.sketches import qdigest_build

    df = spark.createDataFrame([(1,)], "x long")
    with _pytest.raises(ValueError):
        qdigest_build(df, "x", bits=0)
    with _pytest.raises(ValueError):
        qdigest_build(df, "x", bits=31)
    with _pytest.raises(ValueError):
        qdigest_build(df, "x", k=0)
    # out-of-range values raise loudly instead of folding into a leaf
    bad = spark.createDataFrame([(70,), (1,)], "x long")
    with _pytest.raises(Exception, match="outside \\[0, 2\\^6\\)"):
        qdigest_build(bad, "x", bits=6).collect()


def test_qdigest_quantiles_validate_q_milli(spark):
    # r13 advice: q > 1000 used to vanish silently (target_rank beyond
    # n, crossing join never matches) and q <= 0 degenerated to the
    # minimum — both now fail loudly, grouped extractor included
    import pytest as _pytest

    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_quantiles,
        qdigest_quantiles_grouped,
    )

    df = spark.createDataFrame([(v,) for v in range(20)], "x long")
    dig = qdigest_build(df, "x", bits=6, k=8)
    for bad in ((1001,), (0,), (-5,), (500, 2000), ()):
        with _pytest.raises(ValueError):
            qdigest_quantiles(dig, bits=6, q_milli=bad)
        with _pytest.raises(ValueError):
            qdigest_quantiles_grouped(dig, bits=6, q_milli=bad)
    # 1000 is a legal target (rank n -> the maximum)
    rows = {
        r["q_milli"]: r["value"]
        for r in qdigest_quantiles(dig, bits=6, q_milli=(1000,)).collect()
    }
    assert rows[1000] == 19


def test_qdigest_level_skip_bit_identical(spark):
    # the start-depth skip elides only EMPTY levels: compressing an
    # already-compressed digest (nodes at shallow depths) with the
    # computed start depth must equal forcing the loop from the full
    # leaf depth — the skipped deep levels are provably no-ops. (The
    # [Q] oracles, which unroll ALL 20 levels, prove the build+break
    # path the same way every selfcheck.)
    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import (
        _qdigest_compress,
        _qdigest_start_depth,
        qdigest_build,
        qdigest_merge,
    )

    # narrow range, per-leaf counts well under floor(n/k): every leaf
    # pair merges at least one level up, so the compressed digest has
    # NO depth-12 node and the computed start depth drops below bits
    vals = [v % 37 for v in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    dig = qdigest_build(df, "x", bits=12, k=16).localCheckpoint()
    sd = _qdigest_start_depth(dig, bits=12)
    assert sd < 12  # compressed nodes sit above the leaf level
    thr = len(vals) // 8
    skipped = _qdigest_compress(dig, bits=12, thr=thr)  # computed sd
    forced = _qdigest_compress(dig, bits=12, thr=thr, start_depth=12)
    assert {(r["id"], r["cnt"]) for r in skipped.collect()} == {
        (r["id"], r["cnt"]) for r in forced.collect()
    }
    # merge path exercises the scalar start-depth probe end-to-end
    merged = qdigest_merge(dig, dig, bits=12, k=16)
    assert merged.agg(F.sum("cnt")).first()[0] == 2 * len(vals)
    # empty input: start depth 0, compress is the identity
    empty = dig.where(F.lit(False)).localCheckpoint()
    assert _qdigest_start_depth(empty, bits=12) == 0
    assert _qdigest_compress(empty, bits=12, thr=5).count() == 0


def test_qdigest_grouped_equals_per_group_global(spark):
    # the grouped build with column thresholds must produce EXACTLY
    # the digest the global build produces on each group's slice —
    # same algebra, per-group floor(n_g/k)
    import random

    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_build_grouped,
        qdigest_quantiles,
        qdigest_quantiles_grouped,
    )

    rng = random.Random(17)
    rows = [("a", rng.randint(0, 255)) for _ in range(900)] + [
        ("b", rng.randint(0, 31)) for _ in range(600)
    ] + [("c", 7)]  # group c: n < k -> exact leaf histogram
    df = spark.createDataFrame(rows, "grp string, x long")
    bits, k = 8, 16
    grouped = {
        (r["grp"], r["id"]): r["cnt"]
        for r in qdigest_build_grouped(df, "grp", "x", bits=bits, k=k).collect()
    }
    for g in ("a", "b", "c"):
        solo = {
            (g, r["id"]): r["cnt"]
            for r in qdigest_build(
                df.where(F.col("grp") == g), "x", bits=bits, k=k
            ).collect()
        }
        assert solo == {kk: v for kk, v in grouped.items() if kk[0] == g}, g
    # grouped quantiles agree with the global extractor per slice
    gq = {
        (r["grp"], r["q_milli"]): (r["value"], r["target_rank"], r["n"])
        for r in qdigest_quantiles_grouped(
            qdigest_build_grouped(df, "grp", "x", bits=bits, k=k), bits=bits
        ).collect()
    }
    for g in ("a", "c"):
        solo = {
            (g, r["q_milli"]): (r["value"], r["target_rank"], r["n"])
            for r in qdigest_quantiles(
                qdigest_build(df.where(F.col("grp") == g), "x", bits=bits, k=k),
                bits=bits,
            ).collect()
        }
        assert solo == {kk: v for kk, v in gq.items() if kk[0] == g}, g


def test_qdigest_vs_spark_percentile_approx(spark):
    # cross-implementation honesty: q-digest's reported quantile and
    # Spark's built-in percentile_approx (GK-based) must bracket each
    # other within the digest's bits*n/k rank envelope on the same
    # data — two independent approximators agreeing is the cheap
    # sanity a user runs before trusting either at scale
    import random

    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    rng = random.Random(23)
    vals = [rng.randint(0, 1023) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    bits, k = 10, 32
    dig = qdigest_build(df, "x", bits=bits, k=k)
    qd = {
        r["q_milli"]: r["value"]
        for r in qdigest_quantiles(dig, bits=bits).collect()
    }
    pa = df.agg(
        F.percentile_approx("x", [0.25, 0.5, 0.75, 0.9, 0.99], 10000).alias("p")
    ).first()["p"]
    sv = sorted(vals)
    bound = bits * len(vals) // k
    for qm, ref in zip((250, 500, 750, 900, 990), pa):
        # compare by RANK, not value (plateaus make value gaps meaningless)
        r_qd = sum(1 for v in vals if v <= qd[qm])
        r_pa = sum(1 for v in vals if v <= ref)
        assert abs(r_qd - r_pa) <= bound + len(vals) // 100, (qm, r_qd, r_pa)


def test_qdigest_empty_input_yields_empty_results(spark):
    # empty input: empty digest, empty quantile table — no NULL
    # arithmetic crashes anywhere in the chain
    from sutro_spark.functions.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    empty = spark.createDataFrame([], "x long")
    dig = qdigest_build(empty, "x", bits=8, k=16)
    assert dig.count() == 0
    assert qdigest_quantiles(dig, bits=8).count() == 0
