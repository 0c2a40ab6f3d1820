"""Exact duplicate-passage detection and removal (ExactSubstr-style).

North-star extension beyond the reference surface (the reference —
/root/reference — has no corpus-dedup operators at all; its data plane
stops at per-row transforms, see reference sdk.py). This implements the
*exact substring* flavor of training-data dedup popularized by
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022): find token windows of length ``k`` that occur more than once
across the corpus, report per-document duplicated-passage coverage, and
strip repeated occurrences while designating one canonical keeper
occurrence per window. Caveat inherent to window-hash ExactSubstr
approximations: when OVERLAPPING windows are independently duplicated,
positions removed for a neighboring window can erode tokens inside a
keeper's span — the keeper designation guarantees at-most-one *retained
designation* per digest, not that an intact verbatim copy always
survives (the suffix-array formulation has the same edge at span
boundaries).

For the paper's EXACT result — maximal duplicated character spans with
no fixed window grid and no keeper heuristic — use
:mod:`sutro_spark.operators.exact_substr` (r11): it proves equality
with the suffix-array formulation and byte-verifies every hash
candidate. This module remains the TOKEN-granular variant with the
keeper policy (keep one canonical copy) that exact_substr deliberately
does not offer.

Spark-first shape (the suffix-array of the paper is a single-machine
structure; the distributed equivalent is a window-hash posting list):

1. tokenize (pure Catalyst, ``functions.text.tokens``) and emit one row
   per k-token window — linear in corpus tokens, no Python;
2. group windows by a portable sha256-derived digest — ONE shuffle with
   map-side combine; per digest keep ``count`` and the canonical keeper
   ``min(struct(doc_id, pos))`` (total order ⇒ deterministic on any
   engine, and an associative agg — no rank window over hot digests);
3. join occurrences back on the digest; an occurrence is *duplicated*
   when its digest count > 1 and *removed* when it is not the keeper.

Per-doc coverage uses interval union via a lag window (windows at pos p
cover [p, p+k)), NOT a k-times position explode — the per-doc sort is
bounded by document length. The strip path does explode removed windows
into positions, but only for the duplicated occurrences, and documents
reassemble order-preservingly with the same sort_array(collect_list)
pattern as ``dedup.dedup_lines_global``.

At 100 TB: no all-pairs anything — cost is O(corpus tokens) rows
through two digest/doc shuffles. Ultra-frequent windows (boilerplate)
concentrate a digest's *aggregation* but the agg is map-side
combinable (count + min-struct), so hot digests cost one combiner row
per map task, not a hot reducer sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.text import tokens

__all__ = ["passage_occurrences", "dup_passage_stats", "strip_dup_passages"]


def passage_occurrences(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """One row per k-token window occurrence:
    (doc_id, n_tokens, pos, dig) — ``dig`` is the first 16 hex chars of
    sha256 of the space-joined window (portable across engines).
    Documents shorter than ``k`` tokens emit a single row with NULL
    pos/dig so downstream aggregates still see every document."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from sutro_spark.operators.dedup import spread

    # spread: the per-window sha2 digest otherwise runs on ONE core for
    # a single-file scan (no-op at real scan widths) — r16
    base = spread(df).select(
        F.col(id_column).alias("doc_id"),
        # coalesce: split(NULL) is NULL and size(NULL) is -1, which would
        # silently drop null-text docs from the stats
        tokens(F.coalesce(F.col(text_column), F.lit(""))).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    # sequence(0, n) is inclusive and runs DESCENDING when n < 0, so the
    # short-doc case must be guarded with an explicit empty array.
    # r16: explode the POSITION sequence and digest in the projection
    # above it instead of a transform() lambda — HOF lambdas are
    # CodegenFallback (interpreted per window) while explode + slice +
    # sha2 whole-stage-codegens; identical (pos, dig) rows, and the
    # explode_outer NULL guard keeps the short-doc NULL row (the dig
    # expression must stay inside the when(): concat_ws treats a NULL
    # array as empty and would hash '' instead of staying NULL).
    seq = F.when(
        F.col("n_tokens") >= k, F.expr(f"sequence(0, size(toks) - {k})")
    ).otherwise(F.array().cast("array<int>"))
    return base.select(
        "doc_id", "n_tokens", "toks", F.explode_outer(seq).alias("pos")
    ).select(
        "doc_id",
        "n_tokens",
        "pos",
        F.when(
            F.col("pos").isNotNull(),
            F.expr(
                "substring(sha2(concat_ws(' ',"
                f" slice(toks, pos + 1, {k})), 256), 1, 16)"
            ),
        ).alias("dig"),
    )


def _flagged(occ: DataFrame) -> DataFrame:
    """Join each occurrence with its digest's corpus-wide count and
    canonical keeper. Both aggregates are associative (map-side
    combine); the join shuffles on the digest only."""
    per_dig = (
        occ.where(F.col("dig").isNotNull())
        .groupBy("dig")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("keeper"),
        )
    )
    return (
        occ.join(per_dig, "dig", "left")
        .select(
            "doc_id",
            "n_tokens",
            "pos",
            "dig",
            (F.col("n_occ") > 1).alias("is_dup"),
            (
                (F.col("n_occ") > 1)
                & ~(
                    (F.col("keeper.doc_id") == F.col("doc_id"))
                    & (F.col("keeper.pos") == F.col("pos"))
                )
            ).alias("is_removed"),
        )
    )


def dup_passage_stats(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document duplicated-passage profile.

    Output: (doc_id, n_tokens, n_windows, n_dup_windows, dup_tokens,
    dup_ratio) where ``dup_tokens`` is the exact size of the union of
    [pos, pos+k) intervals over duplicated windows (lag-window interval
    union — consecutive overlapping windows contribute ``pos - prev``,
    gaps contribute ``k``) and ``dup_ratio = dup_tokens / n_tokens``
    rounded to 6 decimals.
    """
    occ = _flagged(passage_occurrences(df, text_column=text_column, id_column=id_column, k=k))
    # The interval union must lag over the previous DUP window, not the
    # previous window of any kind — pre-filter dup rows before the lag.
    dup_occ = occ.where(F.col("is_dup"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    union_contrib = F.least(
        F.lit(k),
        F.coalesce(F.col("pos") - F.lag("pos").over(wd), F.lit(k)),
    )
    per_doc_dup = dup_occ.select(
        "doc_id", union_contrib.alias("c")
    ).groupBy("doc_id").agg(F.sum("c").alias("dup_tokens"))
    per_doc = occ.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.col("pos")).alias("n_windows"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup_windows"),
    )
    return (
        per_doc.join(per_doc_dup, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                    F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                    / F.col("n_tokens")
                ),
                6,
            ).alias("dup_ratio"),
        )
    )


def strip_dup_passages(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Remove every duplicated k-token window occurrence except the
    corpus-wide canonical copy (min (doc_id, pos)); rebuild each
    document from its surviving tokens in order.

    Output: (doc_id, n_tokens, n_kept, n_removed, clean_text). A fully
    stripped document keeps its row with clean_text = ''.

    Plan: removed windows explode to their k covered positions
    (k× blowup on DUPLICATED rows only), distinct per (doc, position),
    then a left_anti join removes those token positions and documents
    reassemble via sort_array(collect_list(struct(pos, tok))) — the
    order-preserving pattern shared with dedup_lines_global. All
    shuffles key on doc_id or (doc_id, position); nothing is all-pairs.
    """
    occ = _flagged(passage_occurrences(df, text_column=text_column, id_column=id_column, k=k))
    removed_pos = (
        occ.where(F.col("is_removed"))
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p"))
        .distinct()
    )
    tok_pos = df.select(
        F.col(id_column).alias("doc_id"),
        F.posexplode_outer(
            tokens(F.coalesce(F.col(text_column), F.lit("")))
        ).alias("p", "tok"),
    )
    kept = tok_pos.where(F.col("p").isNotNull()).join(
        removed_pos, ["doc_id", "p"], "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.expr("transform(sort_array(collect_list(struct(p, tok))), s -> s.tok)"),
        ).alias("clean_text"),
    )
    docs = df.select(
        F.col(id_column).alias("doc_id"),
        F.size(tokens(F.coalesce(F.col(text_column), F.lit("")))).alias("n_tokens"),
    )
    return docs.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
