"""WordPiece-style greedy subword segmentation.

The OTHER production tokenizer family next to BPE (operators/bpe.py):
BERT's WordPiece segments a word by repeatedly taking the LONGEST
vocabulary piece that prefixes the remaining text (greedy
longest-match-first — Devlin et al. 2019; the algorithm itself dates
to Schuster & Nakajima 2012). Segmentation under a FROZEN vocabulary
is the famous, deterministic part and what this module implements
exactly; vocabulary induction here is the simple frequency rule (all
substrings up to ``max_piece_len`` ranked by weighted corpus
occurrences, plus every single character as the completeness
fallback) — the likelihood-trained induction is what
``operators/bpe.py`` covers via learned merges. Two deliberate
divergences from HuggingFace's tokenizer, both stated: no ``##``
continuation marking (pieces are position-independent), and a
character not covered by the vocabulary is emitted as itself rather
than collapsing the whole word to ``[UNK]`` (single chars from the
induction corpus are always in vocab, so this only fires on
cross-corpus apply).

Scale shape: everything runs on the DISTINCT-WORD vocabulary --
corpus size stops mattering after the first tokenize+count shuffle
(the bpe.py discipline). The greedy walk is inherently sequential per
word, so it runs in ONE Arrow-batched pandas UDF over distinct words
with the piece vocabulary broadcast as a Python set (the
_arrow_subword_counts precedent: an iterative per-word loop Catalyst
cannot express without a plan per iteration); the DuckDB oracle
replays the same walk as a recursive CTE over a precomputed
longest-match step table, so segmentation parity is bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.text import tokens

__all__ = ["wordpiece_vocab", "wordpiece_segment", "wordpiece_subwords"]


def _word_counts(df: DataFrame, text_column: str) -> DataFrame:
    """(w, weight) — distinct words with corpus occurrence counts; one
    map-side-combinable shuffle, the only corpus-sized stage."""
    return (
        df.select(F.explode(tokens(F.col(text_column))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def wordpiece_vocab(
    df: DataFrame,
    text_column: str = "text",
    *,
    max_piece_len: int = 4,
    top: int = 24,
) -> DataFrame:
    """Frequency-induced piece vocabulary: the ``top`` substrings of
    length 2..``max_piece_len`` by weighted corpus occurrences (count
    of occurrences across all word positions, weighted by word
    frequency; ties -> lexicographically smaller piece), UNION all
    single characters (weighted likewise) — the completeness fallback
    that guarantees every induction-corpus word segments.

    Output: (piece, occurrences bigint, is_char boolean).
    """
    return _vocab_from_wc(
        _word_counts(df, text_column), max_piece_len=max_piece_len, top=top
    )


def _vocab_from_wc(
    wc: DataFrame, *, max_piece_len: int, top: int
) -> DataFrame:
    """:func:`wordpiece_vocab` over an ALREADY-BUILT (w, weight) table.

    r16 optimization round: callers that also segment (wordpiece
    `_segment_arrays`, unigram `_induce`) build the distinct-word table
    once, localCheckpoint it, and derive BOTH the vocabulary and the
    segmentation from the materialized table — previously each
    reference replayed the corpus tokenize+count shuffle (3 full
    corpus scans per unigram query, 2 per wordpiece query)."""
    if max_piece_len < 2:
        raise ValueError(f"max_piece_len must be >= 2, got {max_piece_len}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    # full-length cuts only: substring() silently truncates at the word
    # end, and a truncated (p, l) cut equals the shorter cut at the
    # same p — counting it would double-count every word-final piece
    pieces = wc.select(
        "weight",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)), p ->"
                f" filter(transform(sequence(2, {max_piece_len}),"
                " l -> CASE WHEN p + l - 1 <= length(w)"
                " THEN substring(w, p, l) END),"
                " x -> x IS NOT NULL)))"
            )
        ).alias("piece"),
    )
    multi = (
        pieces.groupBy("piece")
        .agg(F.sum("weight").cast("long").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("piece"))
        .limit(top)
        .select("piece", "occurrences", F.lit(False).alias("is_char"))
    )
    chars = (
        wc.select(
            "weight",
            F.explode(
                F.expr("transform(sequence(1, length(w)), p -> substring(w, p, 1))")
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("weight").cast("long").alias("occurrences"))
        .select("piece", "occurrences", F.lit(True).alias("is_char"))
    )
    return multi.unionByName(chars)


def wordpiece_segment(
    df: DataFrame,
    text_column: str = "text",
    *,
    max_piece_len: int = 4,
    top: int = 24,
) -> DataFrame:
    """Greedy longest-match-first segmentation of the distinct-word
    vocabulary under :func:`wordpiece_vocab`.

    The piece table is collected to the driver (bounded: top + alphabet
    rows — the kmeans-centroid class of bounded collect) and broadcast
    into one Arrow-batched pandas UDF; each word walks left to right
    taking the longest piece (<= max_piece_len chars) present in the
    vocabulary, falling back to the single character itself.

    Output: (w, weight, pieces string — '|'-joined, n_pieces bigint).
    """
    arr = _segment_arrays(
        df, text_column, max_piece_len=max_piece_len, top=top
    )
    return arr.select(
        "w",
        "weight",
        # the ARRAY is ground truth; the '|' join is display only —
        # n_pieces comes from the array, never from re-splitting the
        # joined string (a word containing '|' would inflate it)
        F.array_join("__pieces", "|").alias("pieces"),
        F.size("__pieces").cast("long").alias("n_pieces"),
    )


def _segment_arrays(
    df: DataFrame,
    text_column: str,
    *,
    max_piece_len: int,
    top: int,
) -> DataFrame:
    """(w, weight, __pieces array<string>) — the greedy walk's true
    piece sequence, shared by segment (joined display) and subwords
    (explode); one Arrow UDF either way."""
    # one corpus scan: materialize the distinct-word table, derive the
    # vocabulary AND the segmentation from it (see _vocab_from_wc)
    wc = _word_counts(df, text_column)
    if not wc.isStreaming:
        wc = wc.transform(_barrier)
    vocab = _vocab_from_wc(wc, max_piece_len=max_piece_len, top=top)
    piece_set = {r["piece"] for r in vocab.select("piece").collect()}

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def seg(words: pd.Series) -> pd.Series:
        def walk(w: str) -> list:
            out, pos = [], 0
            while pos < len(w):
                for l in range(min(max_piece_len, len(w) - pos), 0, -1):
                    cand = w[pos : pos + l]
                    if cand in piece_set:
                        out.append(cand)
                        pos += l
                        break
                else:
                    out.append(w[pos])
                    pos += 1
            return out

        return words.map(walk)

    return wc.select("w", "weight", seg(F.col("w")).alias("__pieces"))


def wordpiece_subwords(
    df: DataFrame,
    text_column: str = "text",
    *,
    max_piece_len: int = 4,
    top: int = 24,
    report_top: int = 20,
) -> DataFrame:
    """Subword usage report after segmentation: the ``report_top``
    pieces by weighted occurrences in the SEGMENTED corpus (ties ->
    lexicographically smaller), the bpe_vocab-shaped evidence that the
    greedy walk actually reuses the induced pieces.

    Output: (subword, n_words bigint, occurrences bigint).
    """
    seg = _segment_arrays(
        df, text_column, max_piece_len=max_piece_len, top=top
    )
    return (
        seg.select("w", "weight", F.explode("__pieces").alias("subword"))
        .groupBy("subword")
        .agg(
            F.count_distinct("w").alias("n_words"),
            F.sum("weight").cast("long").alias("occurrences"),
        )
        .orderBy(F.desc("occurrences"), F.asc("subword"))
        .limit(report_top)
    )
