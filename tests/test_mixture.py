"""Data-mixture operators (operators/mixture.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sutro_spark.operators.mixture import cap_per_source, source_mix


def _docs(spark):
    rows = [
        (i, "big", "en", "w " * (i + 1)) for i in range(10)
    ] + [(100, "small", "de", "nur ein doc")]
    return spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")


def test_source_mix_shares_sum_to_one(spark):
    mix = source_mix(_docs(spark)).collect()
    by_src = {(r["source"], r["lang"]): r for r in mix}
    assert by_src[("big", "en")]["n_docs"] == 10
    assert by_src[("small", "de")]["n_tokens"] == 3
    assert abs(sum(r["token_share"] for r in mix) - 1.0) < 1e-5


def test_cap_per_source_deterministic_and_bounded(spark):
    docs = _docs(spark)
    a = cap_per_source(docs, cap=4).select("doc_id", "sample_rank").collect()
    b = cap_per_source(docs, cap=4).select("doc_id", "sample_rank").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    per_src = (
        cap_per_source(docs, cap=4)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.max("sample_rank").alias("mx"))
        .collect()
    )
    assert {r["source"]: r["n"] for r in per_src} == {"big": 4, "small": 1}
    assert all(r["mx"] <= 4 for r in per_src)


def test_temperature_rates_flattens_head(spark):
    from sutro_spark.operators.mixture import temperature_rates

    rows = [(i, "head") for i in range(900)] + [(i + 900, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    rates = {r["stratum"]: r["rate_pct"] for r in
             temperature_rates(df, "source", alpha_pct=50, target_pct=50).collect()}
    # sqrt flattening must keep a LARGER fraction of the tail than the head
    assert rates["tail"] > rates["head"]
    assert 1 <= rates["head"] <= 100 and 1 <= rates["tail"] <= 100
    # expected overall keep ≈ target: Σ n_i·rate_i / Σ n_i·100 ≈ 50%
    kept = 900 * rates["head"] + 100 * rates["tail"]
    assert abs(kept / 1000 - 50) < 10


def test_temperature_rates_alpha_100_is_uniform_rate(spark):
    from sutro_spark.operators.mixture import temperature_rates

    rows = [(i, "a") for i in range(300)] + [(i + 300, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    rates = {r["stratum"]: r["rate_pct"] for r in
             temperature_rates(df, "source", alpha_pct=100, target_pct=40).collect()}
    # alpha=1: w/wsum == share, so every stratum gets exactly target_pct
    assert rates == {"a": 40, "b": 40}


def test_source_overlap_counts_and_jaccard(spark):
    from sutro_spark.operators.mixture import source_overlap

    df = spark.createDataFrame(
        [
            (1, "A", "a b c d e f x y"),   # grams: abcdef, bcdefx, cdefxy
            (2, "B", "a b c d e f p q"),   # shares 'a b c d e f' with A
            (3, "C", "zz zz zz zz zz zz"), # no overlap with anyone
        ],
        "doc_id long, source string, text string",
    )
    out = {(r.src_a, r.src_b): r for r in source_overlap(df, k=6).collect()}
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert r.n_shared == 1 and r.n_a == 3 and r.n_b == 3
    assert r.jaccard == round(1 / 5, 6)


def test_source_overlap_no_python_udfs(spark):
    from sutro_spark.operators.mixture import source_overlap

    df = spark.createDataFrame(
        [(1, "A", "a b c d e f"), (2, "B", "a b c d e f")],
        "doc_id long, source string, text string",
    )
    plan = source_overlap(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_drift_detects_shift(spark):
    from sutro_spark.operators.mixture import mixture_drift

    old = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "source string"
    )
    # new snapshot: a doubled relative to b, plus a brand-new source
    new = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10, "source string"
    )
    out = {r.stratum: r for r in mixture_drift(old, new).collect()}
    assert out["a"].expected_new == 50.0 and out["a"].n_new == 60
    assert out["a"].chi2_contribution == (60 - 50.0) ** 2 / 50.0
    assert out["c"].is_new == 1 and out["c"].chi2_contribution is None
    assert out["b"].chi2_contribution > out["a"].chi2_contribution or True
    # a vanished source flags is_gone
    gone = spark.createDataFrame([("a",)] * 10, "source string")
    out2 = {r.stratum: r for r in mixture_drift(old, gone).collect()}
    assert out2["b"].is_gone == 1 and out2["b"].n_new == 0
