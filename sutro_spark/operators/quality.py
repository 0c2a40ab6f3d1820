"""Gopher-style document quality filters (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1) — the standard pretraining
quality gate: cheap surface statistics plus repetition measures, each
with a published keep-threshold.

EVERYTHING here — including the top-n-gram repetition measures — is
per-row Catalyst array arithmetic: a single map-only scan, no shuffle,
no join, no Python. The most-frequent-n-gram of a document is a
PER-DOCUMENT statistic, so it never needed a corpus-wide
explode/groupBy/window (the r1–r9 shape, whose exploded gram table
shuffle-spilled superlinearly at 16× data — measured exponent 1.35 in
SCALING.md): sort the doc's n-gram array and one `aggregate`
run-length scan finds (top gram, count) in O(L log L) per row. The
quality gate every curation pipeline runs over the full corpus is now
embarrassingly parallel.

Float parity discipline (the oracle contract): every fraction is
produced by ONE division of exactly-integer operands, rounded to 6
decimals — any engine computing the same integers reproduces the
doubles bit-for-bit.

Reference parity note: the reference SDK has no quality-filter ops;
this extends the training-data surface next to
sutro_spark/functions/text.py's heuristics (quality_score there is a
composite score; these are the individual gated metrics).
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.text import STOPWORDS
from sutro_spark.session import release_local_checkpoint

def _top_gram_struct(toks, n: int) -> F.Column:
    """(cnt bigint, gram string) of the most frequent word ``n``-gram
    in the token array ``toks`` — tie-break (cnt desc, gram asc) — as
    pure per-row array work: build the gram array (same construction
    as decontaminate.word_shingles), ``sort_array`` it, then ONE
    ``aggregate`` pass run-length-scans the sorted array with an O(1)
    struct accumulator. Strictly-greater updates keep the FIRST
    (lexicographically smallest) gram on count ties, so the result is
    exactly what a (count desc, gram asc) row_number window over a
    (doc, gram) groupBy would pick — with zero shuffles instead of two.
    gram is NULL (cnt 0) when the doc has fewer than ``n`` words.
    """
    m = F.size(toks)
    grams = F.sort_array(
        F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("cnt"),
        F.lit(None).cast("string").alias("gram"),
    )

    def step(acc, g):
        run = (
            F.when(acc["prev"].isNotNull() & (g == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        better = run > acc["cnt"]
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["cnt"]).alias("cnt"),
            F.when(better, g).otherwise(acc["gram"]).alias("gram"),
        )

    return F.aggregate(
        grams, init, step, lambda acc: F.struct(acc["cnt"], acc["gram"])
    )


#: Gopher Table A1 keep-thresholds.
GOPHER_RULES = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "min_alpha_word_frac": 0.8,
    "max_symbol_word_ratio": 0.1,
    "min_stop_hits": 2,
    "max_dup_line_frac": 0.3,
    "max_top_2gram_frac": 0.2,
}


def gopher_quality(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    rules: dict | None = None,
) -> DataFrame:
    """Per-document Gopher metrics + keep flag.

    Output: (id, n_words, mean_word_len, alpha_word_frac,
    symbol_word_ratio, stop_hits, dup_line_frac, top_2gram_frac, keep)
    with keep as 0/1 bigint (all rules pass).
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    rules = {**GOPHER_RULES, **(rules or {})}
    text = F.coalesce(F.col(text_column), F.lit(""))
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)

    word_len_sum = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_word_len = F.round(
        F.when(n == 0, F.lit(0.0)).otherwise(word_len_sum.cast("double") / n), 6
    )
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    alpha_word_frac = F.round(
        F.when(n == 0, F.lit(0.0)).otherwise(alpha_words.cast("double") / n), 6
    )
    # '#' and non-overlapping '...' occurrences per Gopher's symbol set;
    # both counts are exact integers so the single division is
    # engine-reproducible
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long")
    symbol_word_ratio = F.round(
        F.when(n == 0, F.lit(0.0)).otherwise(
            (hash_count + ellipsis_count).cast("double") / n
        ),
        6,
    )
    stop_hits = F.size(
        F.filter(
            toks,
            lambda w: F.lower(w).isin(*STOPWORDS["en"]),
        )
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.round(
        F.when(n_lines == 0, F.lit(0.0)).otherwise(
            (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines
        ),
        6,
    )

    # top word-2-gram by (count desc, gram asc — deterministic tie);
    # fraction = chars covered by its occurrences / doc chars. Per-row
    # run-length scan over the doc's sorted gram array — no shuffle.
    # The struct materializes in an INNER projection: higher-order
    # `aggregate` expressions are interpreted (not codegen'd), so
    # referencing the scan once keeps it evaluated once per row.
    inner = df.select(
        F.col(id_column).alias("id"),
        F.length(text).alias("__nc"),
        n.cast("bigint").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_word_frac.alias("alpha_word_frac"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        stop_hits.cast("bigint").alias("stop_hits"),
        dup_line_frac.alias("dup_line_frac"),
        _top_gram_struct(toks, 2).alias("__tg"),
    )
    scored = inner.select(
        "id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "symbol_word_ratio",
        "stop_hits",
        "dup_line_frac",
        F.round(
            F.when(
                F.col("__tg.gram").isNull() | (F.col("__nc") == 0), F.lit(0.0)
            ).otherwise(
                (F.col("__tg.cnt") * F.length("__tg.gram")).cast("double")
                / F.col("__nc")
            ),
            6,
        ).alias("top_2gram_frac"),
    )

    keep = (
        F.col("n_words").between(rules["min_words"], rules["max_words"])
        & F.col("mean_word_len").between(
            rules["min_mean_word_len"], rules["max_mean_word_len"]
        )
        & (F.col("alpha_word_frac") >= rules["min_alpha_word_frac"])
        & (F.col("symbol_word_ratio") <= rules["max_symbol_word_ratio"])
        & (F.col("stop_hits") >= rules["min_stop_hits"])
        & (F.col("dup_line_frac") <= rules["max_dup_line_frac"])
        & (F.col("top_2gram_frac") <= rules["max_top_2gram_frac"])
    )
    return scored.withColumn("keep", keep.cast("bigint")).withColumnRenamed(
        "id", id_column
    )


def repetition_profile(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """The remaining Gopher repetition signals (Rae et al. 2021, Table
    A1) beyond gopher_quality's dup_line_frac/top_2gram_frac:

    - dup_para_frac — duplicated paragraph share (split on blank line)
    - dup_line_char_frac — share of characters living in lines whose
      value occurs more than once (all occurrences count)
    - top_3gram_frac / top_4gram_frac — chars covered by the most
      frequent word 3-/4-gram

    ALL measures are per-row array arithmetic in the scan stage (the
    line-frequency check is O(lines²) per row — lines per doc is small
    and corpus-size-independent; the n-gram measures are the
    :func:`_top_gram_struct` sorted run-length scan). Map-only: no
    shuffle, no join. Every fraction: one division of exact integers,
    rounded to 6.
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    text = F.coalesce(F.col(text_column), F.lit(""))
    paras = F.split(text, "\n\n")
    n_paras = F.size(paras)
    dup_para_frac = F.round(
        F.when(n_paras == 0, F.lit(0.0)).otherwise(
            (n_paras - F.size(F.array_distinct(paras))).cast("double") / n_paras
        ),
        6,
    )
    lines = F.split(text, "\n")
    dup_chars = F.aggregate(
        F.filter(
            lines,
            lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1,
        ),
        F.lit(0).cast("long"),
        lambda acc, l: acc + F.length(l),
    )
    n_chars = F.length(text)
    dup_line_char_frac = F.round(
        F.when(n_chars == 0, F.lit(0.0)).otherwise(
            dup_chars.cast("double") / n_chars
        ),
        6,
    )
    toks = F.split(F.trim(text), r"\s+")
    # inner projection so each interpreted run-length scan evaluates
    # once per row (the gopher_quality note)
    inner = df.select(
        F.col(id_column).alias("id"),
        n_chars.alias("__nc"),
        dup_para_frac.alias("dup_para_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        _top_gram_struct(toks, 3).alias("__tg3"),
        _top_gram_struct(toks, 4).alias("__tg4"),
    )
    cols = [
        F.col("id"),
        F.col("dup_para_frac"),
        F.col("dup_line_char_frac"),
    ]
    for n in (3, 4):
        cols.append(
            F.round(
                F.when(
                    F.col(f"__tg{n}.gram").isNull() | (F.col("__nc") == 0),
                    F.lit(0.0),
                ).otherwise(
                    (F.col(f"__tg{n}.cnt") * F.length(f"__tg{n}.gram")).cast(
                        "double"
                    )
                    / F.col("__nc")
                ),
                6,
            ).alias(f"top_{n}gram_frac")
        )
    return inner.select(*cols).withColumnRenamed("id", id_column)


def percentile_filter(
    df: DataFrame,
    score_column: str,
    *,
    partition_column: str | None = None,
    id_column: str = "doc_id",
    keep_top_frac: float = 0.5,
    rank_column: str = "pct_rank",
) -> DataFrame:
    """Keep rows at or above a score percentile, per partition group —
    the "keep the best half per language" curation step.

    ``percent_rank`` over (score, id) is fully deterministic (the id
    tiebreak makes equal scores orderable) and an exact integer ratio
    ((rank-1)/(n-1)), so any engine reproduces it bit-for-bit. One
    window shuffle on the partition key; at 100 TB prefer a coarse
    partition key (language, source) so groups parallelize — a global
    percentile (partition_column=None) serializes one ordering and is
    only for small refinement sets.
    """
    keys = [partition_column] if partition_column else []
    w = Window.partitionBy(*keys).orderBy(score_column, id_column)
    ranked = df.withColumn(rank_column, F.percent_rank().over(w))
    return ranked.where(F.col(rank_column) >= 1.0 - keep_top_frac)


def hash_bucket(col, dim: int) -> F.Column:
    """Deterministic feature-hash bucket: first 4 hex nibbles of
    sha256(token) mod ``dim``. sha-based (not murmur/xxhash) so any
    engine — and the DuckDB oracle — reproduces the bucketing from the
    same spec; integer arithmetic end-to-end."""
    h = F.sha2(col, 256)
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % dim


def default_weights(spark, dim: int) -> DataFrame:
    """Deterministic pseudo-trained weight table (bucket, w_milli) with
    w_milli in [-500, 500]: a stand-in for a trained linear model. In
    production, read the trained weights parquet instead — the scoring
    plan below is identical (the weight table is a broadcast dim)."""
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 1001 - 500).alias("w_milli"),
    )


def linear_quality_score(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    dim: int = 4096,
    weights: DataFrame | None = None,
) -> DataFrame:
    """fastText-style linear document scorer over hashed bag-of-words:
    each lowercased token hashes to one of ``dim`` buckets; the doc
    score is the mean bucket weight (millis scaled back by one exact
    division); label = score > 0.

    Plan: token explode → broadcast join against the ``dim``-row weight
    table (the model IS a broadcast dim — no shuffle of the corpus to
    meet its model) → one map-side-combinable groupBy(doc). Integer
    weight sums make the single final division engine-exact.

    Output: (id, n_tokens, score, label); docs with zero tokens drop
    out (nothing to score).
    """
    w = weights if weights is not None else default_weights(df.sparkSession, dim)
    toks = df.select(
        F.col(id_column).alias("id"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_column), F.lit("")))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    scored = (
        toks.withColumn("bucket", hash_bucket(F.col("tok"), dim))
        .join(F.broadcast(w), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("s_milli"),
        )
    )
    return scored.select(
        F.col("id").alias(id_column),
        "n_tokens",
        F.round(
            F.col("s_milli").cast("double") / (1000 * F.col("n_tokens")), 6
        ).alias("score"),
        (F.col("s_milli") > 0).cast("bigint").alias("label"),
    )


def compression_signals(
    df: DataFrame,
    text_column: str = "text",
    *,
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document — the classic redundancy
    signal (used alongside the Gopher repetition fractions: highly
    compressible text is boilerplate/repetition; incompressible text
    is noise/binary junk; natural language sits in a band).

    Python is GENUINELY required here (no SQL zlib), so this is the
    honest Arrow-batched ``mapInPandas`` shape: rows stream through in
    columnar batches, zlib runs per row inside the batch loop, and the
    two new columns append in place — embarrassingly parallel, no
    shuffle, no driver involvement. Not oracle-expressible (DuckDB has
    no zlib); covered by deterministic unit tests instead.

    Output: input columns + (compressed_len bigint, compression_ratio
    double — compressed/raw, 0.0 for empty text).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("compressed_len", T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def run(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_column].fillna("").str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            n = raw.map(len)
            pdf = pdf.copy()
            pdf["compressed_len"] = comp.astype("int64")
            pdf["compression_ratio"] = [
                (c / ln) if ln else 0.0 for c, ln in zip(comp, n)
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def nfc_report(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Unicode NFC normalization audit per document: is the text
    already in Normalization Form C, and how long is it before/after
    normalizing. Multilingual crawls carry decomposed sequences (e.g.
    'e' + U+0301 instead of 'é') that break exact dedup, tokenizer
    merges, and fingerprinting — this is the detector you run before
    deciding to normalize a corpus in place.

    Python is genuinely required (Catalyst has no NFC expression);
    same honest Arrow ``mapInPandas`` shape as
    :func:`compression_signals`. The semantics ARE oracle-expressible
    — DuckDB's ``nfc_normalize`` implements the same Unicode standard
    as Python's ``unicodedata.normalize('NFC', ...)`` — so unlike the
    zlib signal this one is driver-checkable end to end.

    Output: (id, is_nfc int 0/1, raw_len bigint, nfc_len bigint) —
    lengths in code points; null text reports (1, 0, 0).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("is_nfc", T.IntegerType()),
            T.StructField("raw_len", T.LongType()),
            T.StructField("nfc_len", T.LongType()),
        ]
    )

    def run(batches):
        import unicodedata

        for pdf in batches:
            texts = pdf[text_column].fillna("")
            nfc = texts.map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    "id": pdf[id_column].astype("int64"),
                    "is_nfc": (texts == nfc).astype("int32"),
                    "raw_len": texts.map(len).astype("int64"),
                    "nfc_len": nfc.map(len).astype("int64"),
                }
            )

    return df.select(id_column, text_column).mapInPandas(run, schema=out_schema)


def hashed_token_features(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    dim: int = 1024,
) -> DataFrame:
    """Hashed bag-of-words feature table (id, bucket, cnt): lowercased
    whitespace tokens sha-bucketed into ``dim`` features (same portable
    bucketing as :func:`hash_bucket`). ONE token shuffle — every
    downstream training epoch and scoring pass reuses this table
    without touching the corpus again, which is the whole 100-TB point:
    the raw text is read once, the model loop runs over (id, bucket,
    cnt) whose size is bounded by total tokens, not re-tokenized text.
    """
    toks = df.select(
        F.col(id_column).alias("id"),
        F.explode(
            F.filter(
                F.split(
                    F.trim(F.lower(F.coalesce(F.col(text_column), F.lit("")))),
                    r"\s+",
                ),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    return (
        toks.withColumn("bucket", hash_bucket(F.col("tok"), dim))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_linear_scorer(
    df: DataFrame,
    label,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    dim: int = 1024,
    epochs: int = 2,
) -> DataFrame:
    """Distributed training for the fastText-style linear quality
    scorer — closes the label → train → score → filter loop in-engine
    (``linear_quality_score`` only APPLIES weights; this produces them).

    ``label`` is a column expression evaluating to +1 (keep-quality
    exemplar) / -1 (reject exemplar) per document — e.g. curated-source
    membership, the standard fastText quality-filter recipe.

    Algorithm: closed-form class-difference initialization
    ``w0[b] = sum_i y_i * cnt_ib`` (one pass — the nearest-centroid
    separator over hashed counts), then ``epochs`` full-batch
    perceptron correction passes: docs the current weights misclassify
    contribute ``err_i * cnt_ib`` (err in {-1,+1}) to their buckets.
    Every weight is an exact integer at every step — like
    operators/kmeans.py's milli-int discipline, any engine (and the
    DuckDB oracle) replays training bit-for-bit; no learning-rate
    float, no libm.

    Scale shape: the corpus is tokenized ONCE into the cached
    (id, bucket, cnt) table; each epoch is one broadcast join of the
    <= ``dim``-row weight table plus two map-side-combinable groupBys
    (per-doc score, per-bucket gradient). The model never exceeds
    ``dim`` rows and is localCheckpoint-ed per epoch so the plan stays
    linear in ``epochs`` (the BPE lesson, operators/bpe.py). No
    driver-side collect anywhere — the weights stay a DataFrame.

    Output: (bucket, w) — one row per feature bucket seen in training.
    """
    if epochs < 0:
        raise ValueError(f"epochs must be >= 0, got {epochs}")
    labels = df.select(F.col(id_column).alias("id"), label.cast("long").alias("y"))
    feats = hashed_token_features(
        df, text_column, id_column, dim=dim
    ).persist()
    try:
        fy = feats.join(labels, "id")
        w = (
            fy.groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("w"))
            .transform(_barrier)
        )
        prev_ckpt = w
        for _ in range(epochs):
            s = (
                feats.join(F.broadcast(w), "bucket", "left")
                .groupBy("id")
                .agg(
                    F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))).alias("s")
                )
            )
            err = (
                labels.join(s, "id")
                .select(
                    "id",
                    F.when((F.col("y") == 1) & (F.col("s") <= 0), F.lit(1))
                    .when((F.col("y") == -1) & (F.col("s") > 0), F.lit(-1))
                    .otherwise(F.lit(0))
                    .alias("err"),
                )
                .where(F.col("err") != 0)
            )
            g = (
                feats.join(err, "id")
                .groupBy("bucket")
                .agg(F.sum(F.col("err") * F.col("cnt")).alias("g"))
            )
            w = (
                w.join(g, "bucket", "full")
                .select(
                    "bucket",
                    (F.coalesce("w", F.lit(0)) + F.coalesce("g", F.lit(0))).alias(
                        "w"
                    ),
                )
                .transform(_barrier)
            )
            # superseded epoch's weight blocks are unreachable — free
            release_local_checkpoint(prev_ckpt)
            prev_ckpt = w
        return w
    finally:
        feats.unpersist()


def score_with_weights(
    feats: DataFrame, weights: DataFrame
) -> DataFrame:
    """Apply a trained (bucket, w) table to a (id, bucket, cnt) feature
    table: (id, s, pred) with pred in {+1, -1} (s > 0 keeps). Broadcast
    model join + one combinable groupBy — the corpus-side plan is
    identical whether the weights came from training or from disk."""
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))).alias("s"))
        .select(
            "id",
            "s",
            F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(-1)).alias("pred"),
        )
    )
