"""Distributed BPE merge induction (tokenizer vocabulary learning).

North-star extension (the reference — /root/reference — has no
tokenizer surface; its SDK defers tokenization to the service side,
reference sdk.py). Learns the first ``rounds`` byte-pair-encoding
merges over a corpus the way Sennrich et al. (ACL 2016) defines them:
count adjacent symbol pairs weighted by word frequency, merge the most
frequent pair everywhere (greedy left-to-right, non-overlapping),
repeat.

Spark-first shape — the classic single-machine trainer keeps a heap of
pair counts; the distributed equivalent:

1. ONE pass over the corpus aggregates words → (word, weight): all
   further rounds run over the *distinct vocabulary* weighted by
   frequency, so corpus size stops mattering after the first shuffle
   (the standard BPE trick, here it is also the 100 TB trick).
2. Per round: adjacent pairs explode from each word's symbol sequence
   (linear in word length), a map-side-combinable sum shuffles on the
   pair, and the argmax pair is a 1-ROW BROADCAST cross join (orderBy
   + limit(1) = TakeOrdered — no driver collect), tie-broken
   deterministically (max count, then lexicographic pair).
3. The merge applies as a plain string replace over a control-char
   wrapped symbol encoding: symbols render as \\x01sym\\x02 so the
   pattern \\x01a\\x02\\x01b\\x02 can only match at true symbol
   boundaries, and engine ``replace`` (left-to-right, non-overlapping
   in both Spark and DuckDB) gives exactly BPE's greedy merge
   semantics — overlapping runs like 'aaa' merge to ('aa','a').

Rounds unroll into one lineage (the ``kmeans.py`` pattern), so the
whole training plan is a single Catalyst DAG with no Python in the
hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.text import tokens

__all__ = ["bpe_merges", "bpe_segment", "bpe_vocab"]

_L = "\x01"
_R = "\x02"


def _wrapped_chars(col) -> F.Column:
    """word → '\\x01c1\\x02\\x01c2\\x02...' (one wrapped symbol per char)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: col.substr(i, F.lit(1)),
    )
    return F.concat_ws(
        "", F.transform(chars, lambda s: F.concat(F.lit(_L), s, F.lit(_R)))
    )


def _symbols(ws) -> F.Column:
    """wrapped string → array of symbols (strip outer markers, split on
    the \\x02\\x01 boundary). Accepts a column name or Column."""
    c = F.col(ws) if isinstance(ws, str) else ws
    inner = c.substr(F.lit(2), F.length(c) - 2)
    return F.split(inner, f"{_R}{_L}")


def _train(df: DataFrame, text_column: str, rounds: int):
    """Shared trainer: returns (list of per-round 1-row merge DFs, the
    final segmented vocabulary DF (w, weight, ws))."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    words = (
        df.select(F.explode(tokens(F.coalesce(F.col(text_column), F.lit("")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    cur = words.select("w", "weight", _wrapped_chars(F.col("w")).alias("ws"))
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            cur.select("weight", _symbols("ws").alias("syms"))
            .where(F.size("syms") >= 2)
            .select(
                "weight",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2),"
                        " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("weight").alias("cnt"))
        )
        # sentinel row (cnt=-1, empty symbols): when a round finds NO
        # pairs (vocabulary fully merged before `rounds` is exhausted),
        # limit(1) alone would yield an EMPTY frame and the cross join
        # below would annihilate the whole vocabulary. The sentinel
        # keeps `top` at exactly one row; its replace pattern
        # \x01\x02\x01\x02 cannot match (symbols are non-empty) and
        # sentinel rounds are filtered out of the merge list.
        sentinel = pairs.sparkSession.createDataFrame(
            [("", "", -1)], "l string, r string, cnt long"
        )
        top = (
            pairs.unionByName(sentinel)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .select(
                F.col("l").alias("ml"),
                F.col("r").alias("mr"),
                F.col("cnt").alias("mcnt"),
            )
        )
        merges.append(
            top.where(F.col("mcnt") >= 0).select(
                F.lit(r).cast("long").alias("round"),
                F.col("ml").alias("lhs"),
                F.col("mr").alias("rhs"),
                F.col("mcnt").cast("long").alias("weight"),
            )
        )
        cur = cur.crossJoin(F.broadcast(top)).select(
            "w",
            "weight",
            F.replace(
                F.col("ws"),
                F.concat(F.lit(_L), F.col("ml"), F.lit(_R), F.lit(_L), F.col("mr"), F.lit(_R)),
                F.concat(F.lit(_L), F.col("ml"), F.col("mr"), F.lit(_R)),
            ).alias("ws"),
        )
    return merges, cur


def bpe_merges(
    df: DataFrame,
    *,
    text_column: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """Learn the first ``rounds`` BPE merges over ``text_column``.

    Output: (round bigint, lhs string, rhs string, weight bigint) — one
    row per learned merge, ``weight`` = corpus frequency of the pair at
    the time it was merged (weighted by word occurrence count).
    """
    merges, _ = _train(df, text_column, rounds)
    return reduce(lambda a, b: a.unionAll(b), merges)


def bpe_segment(
    df: DataFrame,
    *,
    text_column: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """Train ``rounds`` merges, then return the segmented vocabulary:
    (w, weight, subwords array<string>) — the APPLY step of BPE, per
    distinct word (join back on the word to tokenize a corpus; the
    vocabulary is many orders smaller than the corpus, so the apply
    step broadcasts at any realistic scale)."""
    _, cur = _train(df, text_column, rounds)
    return cur.select("w", "weight", _symbols("ws").alias("subwords"))


def bpe_vocab(
    df: DataFrame,
    *,
    text_column: str = "text",
    rounds: int = 3,
    top: int = 20,
) -> DataFrame:
    """Subword vocabulary report after ``rounds`` merges: the ``top``
    subwords by corpus frequency (weighted by word count), ties broken
    lexicographically. Output: (subword, n_words bigint — distinct
    words containing it, occurrences bigint)."""
    seg = bpe_segment(df, text_column=text_column, rounds=rounds)
    return (
        seg.select("w", "weight", F.explode("subwords").alias("subword"))
        .groupBy("subword")
        .agg(
            F.count_distinct(F.col("w")).alias("n_words"),
            F.sum("weight").cast("long").alias("occurrences"),
        )
        .orderBy(F.desc("occurrences"), F.asc("subword"))
        .limit(top)
    )
