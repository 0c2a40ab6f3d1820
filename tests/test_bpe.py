"""Distributed BPE merge induction (operators/bpe.py)."""

import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.bpe import bpe_merges


def _corpus(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_classic_sennrich_example(spark):
    # 'lo' dominates: l-o and o-w tie at 6, lexicographic picks (l,o);
    # round 2 then merges (lo, w)
    df = _corpus(spark, "low lower lowest low low", "newer newest new low")
    out = {r.round: r for r in bpe_merges(df, rounds=2).collect()}
    assert (out[1].lhs, out[1].rhs, out[1].weight) == ("l", "o", 6)
    assert (out[2].lhs, out[2].rhs, out[2].weight) == ("lo", "w", 6)


def test_weighting_by_word_frequency(spark):
    # 'aa' appears 3 times as a word → pair (a,a) weight 3 beats (b,c)
    df = _corpus(spark, "aa aa aa bc")
    out = bpe_merges(df, rounds=1).collect()[0]
    assert (out.lhs, out.rhs, out.weight) == ("a", "a", 3)


def test_greedy_nonoverlapping_merge(spark):
    # 'aaaa' with pair (a,a): greedy left-to-right → (aa)(aa), so round
    # 2's top pair is (aa, aa), not (a, aa)
    df = _corpus(spark, "aaaa aaaa")
    out = {r.round: r for r in bpe_merges(df, rounds=2).collect()}
    assert (out[1].lhs, out[1].rhs) == ("a", "a")
    assert (out[2].lhs, out[2].rhs) == ("aa", "aa")


def test_odd_run_leaves_singleton(spark):
    # 'aaa' → greedy gives (aa)(a); round 2 merges (aa, a)
    df = _corpus(spark, "aaa aaa")
    out = {r.round: r for r in bpe_merges(df, rounds=2).collect()}
    assert (out[1].lhs, out[1].rhs) == ("a", "a")
    assert (out[2].lhs, out[2].rhs) == ("aa", "a")


def test_merged_symbol_participates_in_later_rounds(spark):
    df = _corpus(spark, "abc abc abc")
    out = {r.round: r for r in bpe_merges(df, rounds=2).collect()}
    assert (out[1].lhs, out[1].rhs) == ("a", "b")
    assert (out[2].lhs, out[2].rhs) == ("ab", "c")


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        bpe_merges(_corpus(spark, "x"), rounds=0)


def test_no_python_udfs_in_plan(spark):
    df = _corpus(spark, "low lower low")
    plan = bpe_merges(df, rounds=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_segment_applies_merges(spark):
    from sutro_spark.operators.bpe import bpe_segment

    df = _corpus(spark, "low lower lowest low low", "newer newest new low")
    seg = {r.w: r.subwords for r in bpe_segment(df, rounds=2).collect()}
    # after merges (l,o) then (lo,w): 'low' is one token, 'lower' = low+e+r
    assert seg["low"] == ["low"]
    assert seg["lower"] == ["low", "e", "r"]
    assert seg["new"] == ["n", "e", "w"]


def test_vocab_top_and_tiebreak(spark):
    from sutro_spark.operators.bpe import bpe_vocab

    df = _corpus(spark, "ab ab ab cd")
    out = bpe_vocab(df, rounds=1, top=3).collect()
    # merge (a,b): subword 'ab' occurs 3 times; 'c'/'d' once each,
    # lexicographic tie-break puts 'c' before 'd'
    assert (out[0].subword, out[0].occurrences, out[0].n_words) == ("ab", 3, 1)
    assert [r.subword for r in out[1:]] == ["c", "d"]


def test_exhausted_vocabulary_survives_extra_rounds(spark):
    from sutro_spark.operators.bpe import bpe_merges, bpe_segment

    # 'ab' fully merges after 1 round; rounds=3 must not annihilate
    # the vocabulary (regression: empty argmax × cross join → 0 rows)
    df = _corpus(spark, "ab ab")
    seg = bpe_segment(df, rounds=3).collect()
    assert len(seg) == 1 and seg[0].subwords == ["ab"]
    merges = bpe_merges(df, rounds=3).collect()
    assert [(m.round, m.lhs, m.rhs) for m in merges] == [(1, "a", "b")]
