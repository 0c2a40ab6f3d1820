"""Exact duplicate-passage detection/removal (operators/passages.py).

Hand-computable micro-corpora: the semantics under test are the
ExactSubstr rules — a k-token window is duplicated iff its exact token
sequence occurs anywhere else in the corpus; coverage is the union of
duplicated-window intervals; strip keeps exactly one canonical
(min (doc_id, pos)) occurrence corpus-wide.
"""

import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.passages import (
    dup_passage_stats,
    passage_occurrences,
    strip_dup_passages,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_no_duplicates_no_flags(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "e f g h")])
    out = dup_passage_stats(df, k=3).orderBy("doc_id").collect()
    assert [r.n_windows for r in out] == [2, 2]
    assert [r.n_dup_windows for r in out] == [0, 0]
    assert [r.dup_tokens for r in out] == [0, 0]


def test_cross_doc_duplicate_detected_and_covered(spark):
    # "x y z" appears in both docs → one dup window each, covering 3 tokens
    df = _docs(spark, [(1, "x y z a b"), (2, "c x y z d")])
    out = {r.doc_id: r for r in dup_passage_stats(df, k=3).collect()}
    assert out[1].n_dup_windows == 1 and out[1].dup_tokens == 3
    assert out[2].n_dup_windows == 1 and out[2].dup_tokens == 3
    assert out[1].dup_ratio == pytest.approx(3 / 5)


def test_overlapping_windows_interval_union(spark):
    # doc 2 repeats doc 1's full 4 tokens: with k=3 doc 2 has 2 dup
    # windows at pos 0,1 — union covers 4 tokens, not 6
    df = _docs(spark, [(1, "p q r s"), (2, "p q r s")])
    out = {r.doc_id: r for r in dup_passage_stats(df, k=3).collect()}
    assert out[2].n_dup_windows == 2
    assert out[2].dup_tokens == 4


def test_short_and_null_docs_survive(spark):
    df = _docs(spark, [(1, "a b"), (2, None), (3, "")])
    out = {r.doc_id: r for r in dup_passage_stats(df, k=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_windows == 0 and out[2].n_tokens == 0 and out[3].n_tokens == 0
    strip = {r.doc_id: r for r in strip_dup_passages(df, k=3).collect()}
    assert strip[1].clean_text == "a b" and strip[2].clean_text == ""


def test_strip_keeps_exactly_one_canonical_copy(spark):
    # identical docs: doc 1 (min doc_id) keeps its text, doc 2 stripped bare
    df = _docs(spark, [(1, "m n o p"), (2, "m n o p")])
    out = {r.doc_id: r for r in strip_dup_passages(df, k=4).collect()}
    assert out[1].clean_text == "m n o p" and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 4


def test_strip_preserves_unduplicated_remainder_in_order(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "z a b c y")])
    # only "a b c" (k=3) is shared; doc 2 loses positions 1-3, keeps z/y
    out = {r.doc_id: r for r in strip_dup_passages(df, k=3).collect()}
    assert out[1].clean_text == "a b c d e"
    assert out[2].clean_text == "z y" and out[2].n_removed == 3


def test_within_doc_repeat_is_duplicate(spark):
    # the same 3-gram twice inside ONE doc: second occurrence stripped
    df = _docs(spark, [(1, "u v w x u v w")])
    stats = dup_passage_stats(df, k=3).collect()[0]
    assert stats.n_dup_windows == 2
    out = strip_dup_passages(df, k=3).collect()[0]
    assert out.clean_text == "u v w x"


def test_occurrences_shape_and_digest_determinism(spark):
    df = _docs(spark, [(1, "a b c d")])
    occ = passage_occurrences(df, k=3).orderBy("pos").collect()
    assert [r.pos for r in occ] == [0, 1]
    assert all(len(r.dig) == 16 for r in occ)
    occ2 = passage_occurrences(df, k=3).orderBy("pos").collect()
    assert [r.dig for r in occ] == [r.dig for r in occ2]


def test_k_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        passage_occurrences(df, k=1)


def test_no_python_udfs_in_plan(spark):
    # scale guard: the whole pipeline must stay JVM-side
    df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    for frame in (dup_passage_stats(df, k=3), strip_dup_passages(df, k=3)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
