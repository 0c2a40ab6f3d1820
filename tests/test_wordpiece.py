"""WordPiece greedy longest-match segmentation (operators/wordpiece)."""

from collections import Counter

from pyspark.sql import functions as F

from sutro_spark.operators.wordpiece import (
    wordpiece_segment,
    wordpiece_subwords,
    wordpiece_vocab,
)


def _python_model(texts, max_piece_len=4, top=24):
    """Pure-Python replay of the whole pipeline: frequency vocab
    (full cuts only, ties -> smaller piece) + greedy walk."""
    words = Counter()
    for t in texts:
        words.update(w for w in t.split() if w)
    pieces = Counter()
    for w, wt in words.items():
        for p in range(len(w)):
            for l in range(2, max_piece_len + 1):
                if p + l <= len(w):
                    pieces[w[p : p + l]] += wt
    multi = sorted(pieces.items(), key=lambda t: (-t[1], t[0]))[:top]
    vocab = {p for p, _ in multi} | {c for w in words for c in w}

    def walk(w):
        out, pos = [], 0
        while pos < len(w):
            for l in range(min(max_piece_len, len(w) - pos), 0, -1):
                if w[pos : pos + l] in vocab:
                    out.append(w[pos : pos + l])
                    pos += l
                    break
            else:
                out.append(w[pos])
                pos += 1
        return "|".join(out)

    return words, {w: walk(w) for w in words}


def test_segmentation_matches_python_model(spark):
    texts = ["hash join hash scan", "scan the hash table", "joinable"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["w"]: (r["weight"], r["pieces"], r["n_pieces"])
        for r in wordpiece_segment(df, top=4).collect()
    }
    words, segs = _python_model(texts, top=4)
    assert set(got) == set(words)
    for w in words:
        assert got[w] == (words[w], segs[w], segs[w].count("|") + 1)


def test_vocab_full_cuts_only_no_double_count(spark):
    # word "abc" (x1): cuts are ab, bc, abc — the truncated (p=2, l=3)
    # cut must NOT double-count "bc"
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    occ = {
        r["piece"]: r["occurrences"]
        for r in wordpiece_vocab(df, top=10).where(~F.col("is_char")).collect()
    }
    assert occ == {"ab": 1, "bc": 1, "abc": 1}


def test_greedy_prefers_longest_match(spark):
    # vocab induced from "abcd abcd ab cd": "abcd" outranks "ab"/"cd";
    # greedy takes the whole word in one piece
    df = spark.createDataFrame(
        [(1, "abcd abcd ab cd")], "doc_id long, text string"
    )
    got = {r["w"]: r["pieces"] for r in wordpiece_segment(df, top=8).collect()}
    assert got["abcd"] == "abcd"
    assert got["ab"] == "ab"


def test_subwords_report_is_deterministic_topk(spark, documents):
    rep = wordpiece_subwords(documents, top=64, report_top=5).collect()
    assert len(rep) == 5
    occs = [r["occurrences"] for r in rep]
    assert occs == sorted(occs, reverse=True)


def test_vocab_validates_params(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        wordpiece_vocab(df, max_piece_len=1)
    with _pytest.raises(ValueError):
        wordpiece_vocab(df, top=0)


def test_pipe_in_word_true_piece_count(spark):
    """A word CONTAINING the '|' display delimiter (whitespace
    tokenization lets it through) must report the TRUE piece count:
    n_pieces comes from the UDF's piece array, never from re-splitting
    the '|'-joined display string (which would count phantom empties
    around an emitted '|' piece) — ADVICE r12."""
    df = spark.createDataFrame(
        [(0, "x|y x|y qq qq qq")], "doc_id long, text string"
    )
    # top=1 -> only 'qq' makes the multi-piece vocab; 'x|y' walks to
    # single chars x, |, y
    rows = {r["w"]: r for r in wordpiece_segment(df, top=1).collect()}
    assert rows["x|y"]["n_pieces"] == 3
    assert rows["x|y"]["pieces"] == "x|||y"  # display join, ambiguous by design
    assert rows["qq"]["n_pieces"] == 1
    subs = {
        r["subword"]: (r["n_words"], r["occurrences"])
        for r in wordpiece_subwords(df, top=1).collect()
    }
    # the '|' piece is a real subword of x|y (weight 2), not a split artifact
    assert subs["|"] == (1, 2)
    assert subs["qq"] == (1, 3)
