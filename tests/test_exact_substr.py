"""Exact ExactSubstr dedup (suffix-array semantics): spans must equal
the brute-force enumeration of duplicated length-L windows, merged into
maximal intervals — on fixtures and on Hypothesis-generated corpora."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sutro_spark.operators.exact_substr import (
    exact_substr_positions,
    exact_substr_spans,
    strip_exact_substr,
)


def _brute_spans(docs: dict[int, str], L: int, min_count: int = 2):
    """Reference implementation: hash nothing, enumerate every length-L
    window, count occurrences globally, merge covered intervals."""
    c = Counter()
    for t in docs.values():
        for i in range(len(t) - L + 1):
            c[t[i : i + L]] += 1
    spans = set()
    for did, t in docs.items():
        ps = [
            i + 1
            for i in range(len(t) - L + 1)
            if c[t[i : i + L]] >= min_count
        ]
        start = end = None
        for p in ps:
            if start is None:
                start, end = p, p + L
            elif p <= end:  # overlap or touch: p <= prev_start + L
                end = p + L
            else:
                spans.add((did, start, end))
                start, end = p, p + L
        if start is not None:
            spans.add((did, start, end))
    return spans


SHARED = "the quick brown fox jumps over the lazy sleeping dog tonight"
DOCS = {
    1: f"AAAA unique prefix one {SHARED} unique suffix one ZZZZ",
    2: f"BBBB different lead-in {SHARED} and a different tail here",
    3: "totally unique document with no repeats at all whatsoever xyz",
    4: "short",
}


def _df(spark, docs):
    return spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )


def test_spans_match_brute_force_on_fixture(spark):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substr_spans(_df(spark, DOCS), min_length=20).collect()
    }
    assert got == _brute_spans(DOCS, 20)
    # the shared sentence is found in both docs, nothing in 3/4
    assert {d for d, _, _ in got} == {1, 2}


def test_within_doc_overlapping_self_repeat_counts(spark):
    # "ab" * 30: window at i and i+2 are identical — the suffix-array
    # convention counts overlapping self-occurrences, so the whole
    # document is one duplicated span even with a unique head/tail
    docs = {1: "HEAD-" + "ab" * 30 + "-TAIL", 2: "nothing in common here at all"}
    L = 10
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substr_spans(_df(spark, docs), min_length=L).collect()
    }
    assert got == _brute_spans(docs, L)
    assert len(got) == 1 and next(iter(got))[0] == 1


def test_min_count_raises_the_bar(spark):
    docs = {
        1: f"one copy here {SHARED} end one",
        2: f"two copy here {SHARED} end two",
        3: f"three copy xx {SHARED} end three",
    }
    # at min_count=4 the three-way shared sentence is NOT duplicated
    assert (
        exact_substr_spans(_df(spark, docs), min_length=20, min_count=4).count()
        == 0
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substr_spans(
            _df(spark, docs), min_length=20, min_count=3
        ).collect()
    }
    assert got == _brute_spans(docs, 20, min_count=3)
    assert len(got) == 3


def test_short_and_null_docs_are_safe(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "tiny")], "doc_id long, text string"
    )
    assert exact_substr_spans(df, min_length=10).count() == 0
    st_rows = {
        r["doc_id"]: r for r in strip_exact_substr(df, min_length=10).collect()
    }
    assert st_rows[1]["clean_text"] == "" and st_rows[1]["n_removed"] == 0
    assert st_rows[3]["clean_text"] == "tiny"


def test_strip_cuts_every_occurrence_and_preserves_rest(spark):
    got = {
        r["doc_id"]: r
        for r in strip_exact_substr(_df(spark, DOCS), min_length=20).collect()
    }
    spans = _brute_spans(DOCS, 20)
    for did, text in DOCS.items():
        mine = sorted((s, e) for d, s, e in spans if d == did)
        kept, cur = [], 1
        for s, e in mine:
            kept.append(text[cur - 1 : s - 1])
            cur = e
        kept.append(text[cur - 1 :])
        assert got[did]["clean_text"] == "".join(kept)
        assert got[did]["n_removed"] == sum(e - s for s, e in mine)
        assert got[did]["n_chars"] == len(text)


def test_param_validation(spark):
    df = _df(spark, {1: "abc"})
    with pytest.raises(ValueError):
        exact_substr_spans(df, min_length=1)
    with pytest.raises(ValueError):
        exact_substr_spans(df, min_count=1)


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=5
    ),
    L=st.integers(min_value=2, max_value=6),
)
def test_spans_equal_brute_force_property(spark, texts, L):
    """Tiny alphabet => dense accidental repeats, including overlapping
    self-repeats and cross-doc repeats at every boundary shape."""
    docs = {i: t for i, t in enumerate(texts)}
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substr_spans(
            spark.createDataFrame(
                list(docs.items()), "doc_id long, text string"
            ),
            min_length=L,
        ).collect()
    }
    assert got == _brute_spans(docs, L)


def _brute_contaminated(docs, ref, L):
    refwins = set()
    for t in ref.values():
        for i in range(len(t) - L + 1):
            refwins.add(t[i : i + L])
    spans = set()
    for did, t in docs.items():
        ps = [
            i + 1
            for i in range(len(t) - L + 1)
            if t[i : i + L] in refwins
        ]
        start = end = None
        for p in ps:
            if start is None:
                start, end = p, p + L
            elif p <= end:
                end = p + L
            else:
                spans.add((did, start, end))
                start, end = p, p + L
        if start is not None:
            spans.add((did, start, end))
    return spans


BENCH = "Question: what color is the sky on a clear day? Answer: blue."


def test_contaminated_spans_marks_only_benchmark_overlap(spark):
    from sutro_spark.operators.exact_substr import (
        contaminated_spans,
        strip_contaminated_spans,
    )

    docs = {
        1: f"Intro text written by a human. {BENCH} And an original outro.",
        2: "Fully original document with zero overlap with any benchmark.",
        3: BENCH,  # verbatim benchmark copy -> fully contaminated
    }
    ref = {100: BENCH, 101: "another benchmark item entirely unrelated"}
    L = 30
    df = _df(spark, docs)
    rf = _df(spark, ref)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in contaminated_spans(df, rf, min_length=L).collect()
    }
    assert got == _brute_contaminated(docs, ref, L)
    assert {d for d, _, _ in got} == {1, 3}
    # doc 3 is one wall-to-wall span
    d3 = next((s, e) for d, s, e in got if d == 3)
    assert d3 == (1, len(BENCH) + 1)
    st = {
        r["doc_id"]: r
        for r in strip_contaminated_spans(df, rf, min_length=L).collect()
    }
    assert st[3]["clean_text"] == "" and st[3]["n_removed"] == len(BENCH)
    assert st[2]["clean_text"] == docs[2] and st[2]["n_removed"] == 0
    # doc 1 keeps its original head and tail
    assert st[1]["clean_text"].startswith("Intro text")
    assert st[1]["clean_text"].endswith("outro.")
    assert BENCH[5:-5] not in st[1]["clean_text"]


@settings(max_examples=10, deadline=None)
@given(
    dtexts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=4
    ),
    rtexts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=3
    ),
    L=st.integers(min_value=2, max_value=5),
)
def test_contaminated_spans_equal_brute_force_property(
    spark, dtexts, rtexts, L
):
    from sutro_spark.operators.exact_substr import contaminated_spans

    docs = {i: t for i, t in enumerate(dtexts)}
    ref = {i: t for i, t in enumerate(rtexts)}
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in contaminated_spans(
            _df(spark, docs), _df(spark, ref), min_length=L
        ).collect()
    }
    assert got == _brute_contaminated(docs, ref, L)


def test_fixpoint_strip_leaves_no_duplicated_spans(spark):
    """One pass can create NEW length-L repeats at cut edges; the
    fixpoint must end with zero duplicated spans. Construct the edge
    case deliberately: cutting X from 'aX b' and 'aX c'-style docs
    splices 'a' against what follows, manufacturing a fresh repeat."""
    from sutro_spark.operators.exact_substr import (
        exact_substr_spans,
        strip_exact_substr_fixpoint,
    )

    L = 8
    mid1 = "PAYLOAD-DUPLICATED-BYTES-1234567890"
    # both docs: identical head, the shared mid, identical tail — after
    # the mid (and head/tail repeats) are cut, the splice of remnants
    # can still repeat across docs; fixpoint must clean all of it
    docs = {
        1: f"commonhead {mid1} commontail-one-xyzzy",
        2: f"commonhead {mid1} commontail-two-qwerty",
        3: "an entirely distinct document with no repeats whatsoever",
    }
    out = strip_exact_substr_fixpoint(
        _df(spark, docs), min_length=L, max_iters=6
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # accounting: original lengths carried, removal totals consistent
    for did, t in docs.items():
        assert rows[did]["n_chars"] == len(t)
        assert rows[did]["n_removed"] == len(t) - len(rows[did]["clean_text"])
    assert rows[3]["n_removed"] == 0
    # the fixpoint property itself: NO duplicated span survives
    clean = spark.createDataFrame(
        [(d, r["clean_text"]) for d, r in rows.items()],
        "doc_id long, text string",
    )
    assert exact_substr_spans(clean, min_length=L).count() == 0
    assert rows[1]["n_passes"] >= 1


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=25), min_size=1, max_size=4
    ),
    L=st.integers(min_value=3, max_value=5),
)
def test_fixpoint_strip_property_no_spans_remain(spark, texts, L):
    """Dense-repeat alphabet: multi-pass convergence is the norm, and
    the fixpoint contract (no duplicated span in the result) must hold
    for every generated corpus."""
    from sutro_spark.operators.exact_substr import (
        exact_substr_spans,
        strip_exact_substr_fixpoint,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = strip_exact_substr_fixpoint(df, min_length=L, max_iters=8)
    clean = out.select("doc_id", F.col("clean_text").alias("text"))
    assert exact_substr_spans(clean, min_length=L).count() == 0


def test_contaminated_fixpoint_catches_cut_edge_recontamination(spark):
    """r12 (VERDICT #6): cutting a contaminated span splices the bytes
    around it — if the BENCHMARK also contains that spliced string, one
    pass leaves live contamination. Engineered here: the doc carries a
    ref payload between 'alpha' and 'omega!!', and the ref ALSO holds
    'alphaomega', so pass 1's cut manufactures a fresh >=8-char match
    that only pass 2 removes."""
    from sutro_spark.operators.exact_substr import (
        contaminated_spans,
        strip_contaminated_spans,
        strip_contaminated_spans_fixpoint,
    )

    L = 8
    payload = "SECRET-BENCHMARK-PAYLOAD-0123456789"
    docs = {1: f"alpha{payload}omega!!", 2: "wholly clean document text"}
    ref = {1: f"xx {payload} xx", 2: "yy alphaomega yy"}
    ddf, rdf = _df(spark, docs), _df(spark, ref)

    # single pass leaves the spliced match behind...
    once = {
        r["doc_id"]: r["clean_text"]
        for r in strip_contaminated_spans(ddf, rdf, min_length=L).collect()
    }
    assert once[1] == "alphaomega!!"
    assert (
        contaminated_spans(
            _df(spark, {1: once[1]}), rdf, min_length=L
        ).count() > 0
    )

    # ...the fixpoint does not
    rows = {
        r["doc_id"]: r
        for r in strip_contaminated_spans_fixpoint(
            ddf, rdf, min_length=L, max_iters=6
        ).collect()
    }
    assert rows[1]["clean_text"] == "!!"
    assert rows[1]["n_passes"] >= 2
    assert rows[1]["n_chars"] == len(docs[1])
    assert rows[1]["n_removed"] == len(docs[1]) - 2
    assert rows[2]["clean_text"] == docs[2] and rows[2]["n_removed"] == 0
    clean = spark.createDataFrame(
        [(d, r["clean_text"]) for d, r in rows.items()],
        "doc_id long, text string",
    )
    assert contaminated_spans(clean, rdf, min_length=L).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        strip_contaminated_spans_fixpoint(ddf, rdf, max_iters=0)


@settings(max_examples=6, deadline=None)
@given(
    dtexts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=25), min_size=1, max_size=3
    ),
    rtexts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=25), min_size=1, max_size=2
    ),
    L=st.integers(min_value=3, max_value=5),
)
def test_contaminated_fixpoint_property_no_matches_remain(
    spark, dtexts, rtexts, L
):
    """Dense-repeat alphabet: the absolute decontamination contract —
    NO length->=L verbatim ref substring survives the fixpoint — must
    hold for every generated corpus/ref pair."""
    from sutro_spark.operators.exact_substr import (
        contaminated_spans,
        strip_contaminated_spans_fixpoint,
    )

    ddf = spark.createDataFrame(
        list(enumerate(dtexts)), "doc_id long, text string"
    )
    rdf = spark.createDataFrame(
        list(enumerate(rtexts)), "doc_id long, text string"
    )
    out = strip_contaminated_spans_fixpoint(ddf, rdf, min_length=L, max_iters=8)
    clean = out.select("doc_id", F.col("clean_text").alias("text"))
    assert contaminated_spans(clean, rdf, min_length=L).count() == 0
