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
