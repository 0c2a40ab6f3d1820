"""Data-selection scoring: DSIR importance weights and the
corpus-bigram LM quality proxy (operators/selection.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sutro_spark.operators.selection import charlm_score, dsir_weights


def test_dsir_target_like_docs_score_higher(spark):
    raw = spark.createDataFrame(
        [
            (1, "der hund läuft schnell der hund"),
            (2, "die katze schläft gern die katze"),
            (3, "the dog runs fast the dog"),
            (4, "the cat sleeps well the cat"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    target = raw.where(F.col("doc_id") <= 2)
    out = {r["id"]: r for r in dsir_weights(raw, target).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # every raw doc scored
    assert out[5]["n_tokens"] == 0 and out[5]["dsir_milli"] == 0
    assert out[1]["n_tokens"] == 6
    # German (target-like) docs must outscore English ones
    assert min(out[1]["dsir_milli"], out[2]["dsir_milli"]) > max(
        out[3]["dsir_milli"], out[4]["dsir_milli"]
    )


def test_dsir_deterministic_and_integer_exact(spark):
    raw = spark.createDataFrame(
        [(i, f"token{i % 3} filler words here") for i in range(30)],
        "doc_id long, text string",
    )
    target = raw.where(F.col("doc_id") % 3 == 0)
    a = sorted(map(tuple, dsir_weights(raw, target).collect()))
    b = sorted(map(tuple, dsir_weights(raw, target).collect()))
    assert a == b  # hash-based model: no RNG, identical across runs
    assert all(isinstance(t[2], int) for t in a)  # exact integer scores


def test_charlm_garbage_scores_below_prose(spark):
    prose = "the quick brown fox jumps over the lazy dog near the river bank"
    df = spark.createDataFrame(
        [(1, prose), (2, prose.replace("the", "teh")), (3, "xq zj qx jz vk kv wx"),
         (4, ""), (5, None)],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in charlm_score(df).collect()}
    # rare transitions (xq/zj...) are improbable under the corpus model
    assert out[3]["mean_logp"] < out[1]["mean_logp"]
    assert out[4]["n_bigrams"] == 0 and out[4]["mean_logp"] == 0.0
    assert out[5]["n_bigrams"] == 0 and out[5]["mean_logp"] == 0.0


def test_charlm_bigram_count_and_normalization(spark):
    # "ab  cd" normalizes to "ab cd" → bigrams ab, "b ", " c", cd = 4
    df = spark.createDataFrame([(1, "ab  cd"), (2, "AB cd")], "doc_id long, text string")
    out = {r["id"]: r for r in charlm_score(df).collect()}
    assert out[1]["n_bigrams"] == 4
    # case/whitespace-normalized: identical docs get identical scores
    assert out[1]["mean_logp"] == out[2]["mean_logp"]
