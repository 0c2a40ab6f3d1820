"""Text-analysis functions for training-data pipelines (north-star
extensions; not in the reference). All pure Catalyst expressions —
JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and ASCII so the DuckDB oracle can carry
# the identical literals.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "de", "et", "un", "est", "en", "que"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}


def tokens(col) -> Column:
    """Whitespace tokenization → array<string>, empty tokens removed.

    NOTE: not ``split(trim(x))`` — SQL ``trim`` strips only spaces, so
    leading tabs/newlines would produce phantom empty tokens (found by
    a hypothesis property test). Filtering empties handles every
    whitespace shape.

    The split class is PINNED to Java's ``\\s`` = [ \\t\\n\\x0B\\f\\r]
    written out explicitly: RE2 (the DuckDB oracle engine) excludes
    \\x0B from ``\\s``, so a bare ``\\s+`` means two different things
    in the two engines — the script_profile n_space divergence, r13.
    Every oracle word-split mirrors this literal class."""
    return F.filter(F.split(col, r"[ \t\n\x0B\f\r]+"), lambda x: x != "")


def token_count(col) -> Column:
    """Token count; empty/blank text counts 0."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col) -> Column:
    """A BPE-flavored proxy: count word pieces of <=4 chars by also
    splitting long words — ceil(len(word)/4) summed over words."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


def char_count(col) -> Column:
    return F.length(col).cast("long")


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alphanumeric/space, rounded
    to 6 decimals."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.round(
        F.when(F.length(col) == 0, 0.0).otherwise(
            F.length(stripped).cast("double") / F.length(col)
        ),
        6,
    )


def stopword_ratio(col, lang: str = "en") -> Column:
    """Fraction of tokens that are (distinct-matched) stopwords."""
    words = STOPWORDS[lang]
    hits = F.size(F.array_intersect(tokens(F.lower(col)), F.array(*[F.lit(w) for w in words])))
    return F.round(
        F.when(token_count(col) == 0, 0.0).otherwise(hits.cast("double") / token_count(col)), 6
    )


def quality_score(col) -> Column:
    """Composite quality heuristic in [0, 1]:
    0.4·length_score + 0.3·(1 - punct_ratio) + 0.3·alpha_ratio, where
    length_score = least(len/400, 1) and alpha_ratio is the alphabetic
    character fraction. Rounded to 6 decimals."""
    n = F.length(col)
    length_score = F.least(n.cast("double") / 400.0, F.lit(1.0))
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n == 0, 0.0).otherwise(alpha / n)
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    punct = F.when(n == 0, 0.0).otherwise(F.length(stripped).cast("double") / n)
    return F.round(0.4 * length_score + 0.3 * (1.0 - punct) + 0.3 * alpha_ratio, 6)


def lang_id(col, languages: list[str] | None = None) -> Column:
    """Stopword-overlap language ID: the language whose stopword list
    has the most *distinct* token matches wins; ties break
    lexicographically (stable in any engine). Returns the language code.
    """
    languages = languages or sorted(STOPWORDS)
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        tokens(F.lower(col)), F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                    )
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(languages)
        ]
    )
    # max by (hits, then *smallest* lang for ties): sort desc by hits,
    # asc by lang → first element. array_max on struct compares
    # lexicographically (hits, lang) which would tie-break by LARGEST
    # lang, so sort explicitly.
    best = F.array_sort(
        scored,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]["lang"]
    return best


def fingerprint(col) -> Column:
    """Document fingerprint: sha2-256 of the sorted distinct lowercase
    token multiset-collapsed form (the classic 'fingerprint' clustering
    key from Google Refine / OpenRefine, public technique)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(col)))), " ")
    return F.sha2(canon, 256)


def chunk_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    context-window packing for embedding/inference pipelines.

    Pure Catalyst: a per-row ``sequence`` of chunk starts →
    ``transform`` to substrings → ``posexplode``. No shuffle, no
    Python; output size is rows × ceil(len/stride), produced inside the
    scan stage, so at 100 TB the explode parallelism is the scan
    parallelism (partition count follows maxPartitionBytes, not a
    repartition).

    Chunk i covers [i·stride, i·stride + size); the final chunk may be
    shorter. Returns (id, chunk_id, chunk).
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    n = F.length(F.col(text_column))
    last = F.greatest(F.floor((n - 1) / stride), F.lit(0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.col(text_column).substr(i * stride + 1, F.lit(size)),
    )
    return (
        df.select(F.col(id_column), F.posexplode(chunks).alias("chunk_id", "chunk"))
        .where(F.length("chunk") > 0)
        .withColumn("chunk_id", F.col("chunk_id").cast("long"))
    )


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repeats —
# no lookarounds, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


def redact_pii(
    df: DataFrame,
    text_column: str = "text",
    *,
    output_column: str = "redacted",
    patterns: dict[str, str] | None = None,
    token: str = "[{name}]",
) -> DataFrame:
    """Scrub PII-shaped spans and count them per document.

    One projection: for each named pattern, ``regexp_extract_all`` size
    → ``n_<name>`` count column (computed on the ORIGINAL text, so
    counts are order-independent), then chained ``regexp_replace`` into
    ``output_column``. JVM-side regex only — the classic pre-training
    scrub runs at scan speed with zero Python.
    """
    patterns = patterns or {"email": EMAIL_RE, "phone": PHONE_RE}
    src = F.col(text_column)
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(src, F.lit(pat), 0)).cast("long")
        for name, pat in patterns.items()
    }
    redacted = src
    for name, pat in patterns.items():
        redacted = F.regexp_replace(redacted, pat, token.format(name=name.upper()))
    return df.withColumns({**counts, output_column: redacted})


def text_profile(df: DataFrame, text_column: str = "text") -> DataFrame:
    """All text metrics as one projection (single scan).

    The projection is expression-heavy (regex passes, stopword
    intersections, sha2 fingerprint), so the input is spread across the
    cluster first: a small single-file scan otherwise arrives as ONE
    partition and the whole profile runs on one core (measured 1.19 s →
    0.63 s at sf0.1 on local[32]). No-op when the scan is already
    parallel — the 100 TB case pays nothing."""
    from sutro_spark.operators.dedup import spread

    df = spread(df)
    c = F.col(text_column)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_bpe_tokens": bpe_ish_token_count(c),
            "n_chars_m": char_count(c),
            "punct_ratio": punct_ratio(c),
            "stopword_ratio_en": stopword_ratio(c, "en"),
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )


def term_topk(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 50,
) -> DataFrame:
    """Corpus term statistics: the k most frequent lowercase tokens with
    total occurrences and document frequency.

    Scale shape: explode → one groupBy(term) computing count and
    approx-free exact doc_freq via count(distinct id) (Spark plans this
    as a two-phase expand+partial agg, still one logical shuffle on
    term); the final top-k is `TakeOrderedAndProject` — each partition
    keeps only k rows, no global sort shuffle. Ties at the k boundary
    break deterministically on the term string so two engines select
    the same set.
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    toks = df.select(
        F.col(id_column).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("__id").alias("doc_freq"),
        )
        .orderBy(F.desc("occurrences"), F.asc("term"))
        .limit(k)
    )


def tfidf_topk(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 3,
) -> DataFrame:
    """Per-document top-k salient terms by tf × N/df weighting.

    The reciprocal-df weight replaces the classic ln(N/df): the ranking
    is identical (both are monotone in N/df) while staying inside
    IEEE-exact arithmetic — one integer multiply and one double divide,
    both exactly-rounded operations, so independent engines agree
    bit-for-bit. Transcendentals (ln/log) carry no cross-libm exactness
    guarantee and would make a value-hash correctness gate flaky.

    Scale shape: one explode feeds groupBy(id, term) (map-side
    combinable — the only shuffle over token volume); doc_freq is
    derived from that aggregate's much smaller (doc, term) output;
    corpus size N joins as a 1-row broadcast; the per-doc top-k is a
    rank window bounded to k with a deterministic (weight desc, term)
    tie-break.
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_column).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term"),
    )
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = df.agg(F.countDistinct(F.col(id_column)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("weight", F.col("tf") * F.col("n_docs") / F.col("doc_freq"))
    )
    w = Window.partitionBy("__id").orderBy(F.desc("weight"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__id").alias(id_column),
            "term",
            "tf",
            "doc_freq",
            F.round("weight", 6).alias("weight"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def word_bigrams(
    df: DataFrame,
    text_column: str = "text",
    *,
    k: int = 40,
) -> DataFrame:
    """Top-k adjacent-token pairs (collocations) across the corpus —
    the counting primitive under BPE-style merge induction and
    boilerplate phrase mining.

    Scale shape: the bigram list is built inside the scan stage with
    ``transform`` over an index sequence (no self-join, no Python),
    exploded, then one map-side-combinable groupBy; the final top-k is
    TakeOrderedAndProject with a deterministic tie-break.
    """
    t = df.select(tokens(F.lower(F.col(text_column))).alias("toks")).where(
        F.size("toks") >= 2
    )
    bg = t.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks)-2),"
                " i -> concat(toks[i], ' ', toks[i+1]))"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("bigram"))
        .limit(k)
    )


def reassemble_text(
    chunks: DataFrame,
    id_column: str = "doc_id",
    chunk_id_column: str = "chunk_id",
    chunk_column: str = "chunk",
    *,
    overlap: int = 32,
) -> DataFrame:
    """Inverse of :func:`chunk_text`: stitch overlapping chunks back
    into the original document (chunk 0 whole, later chunks minus their
    ``overlap``-char prefix).

    Order safety in a distributed engine: ``collect_list`` gives no
    ordering guarantee across shuffle partitions, so the parts are
    gathered as (chunk_id, chunk) structs and ``array_sort``ed before
    the fold — the result is identical on any partitioning. One shuffle
    on the doc id; per-doc state is bounded by document length.

    Returns (id_column, n_chunks, text).
    """
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(chunk_id_column), F.col(chunk_column)))
    )
    rebuilt = F.aggregate(
        parts,
        F.lit(""),
        lambda acc, p: F.concat(
            acc,
            F.when(p[chunk_id_column] == 0, p[chunk_column]).otherwise(
                p[chunk_column].substr(
                    F.lit(overlap + 1), F.length(p[chunk_column])
                )
            ),
        ),
    )
    return chunks.groupBy(F.col(id_column)).agg(
        (F.max(chunk_id_column) + 1).alias("n_chunks"),
        rebuilt.alias("text"),
    )


def bigram_lift(
    df: DataFrame,
    text_column: str = "text",
    *,
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Collocation strength: top-k bigrams by LIFT — P(ab) / (P(a)P(b))
    — the log-free PMI core (log is monotone, so ranking by lift IS
    ranking by PMI, without libm ln whose bits differ across engines).

    lift = (c_ab / N_bi) / ((c_a / N_uni) * (c_b / N_uni)); computed in
    a fixed left-to-right double expression so both engines produce
    identical bits. ``min_count`` suppresses the unstable tail (a
    hapax pair has huge lift by construction).

    Scale shape: one scan builds unigram and bigram streams; two
    map-side-combinable groupBys; corpus totals are 1-row aggregates
    broadcast via cross join (never a driver collect); final top-k is
    TakeOrderedAndProject.
    """
    # three consumers (unigram counts, bigram counts, bigram total) —
    # materialize the tokenized pass or Catalyst re-scans and
    # re-tokenizes the corpus three times (selection.py measured that
    # fan-out at 3x the whole query). r16: eager localCheckpoint
    # instead of persist() — the one collect below reads all three
    # consumers in ONE action, where persist's concurrent cache
    # references race to populate and replay lineage (the curation-v3
    # lesson). Released before returning, so repeated calls in a
    # long-lived session leak nothing.
    t = df.select(tokens(F.lower(F.col(text_column))).alias("toks")).transform(
        _barrier
    )
    uni = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = (
        t.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks)-2),"
                    " i -> struct(toks[i] AS a, toks[i+1] AS b))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").cast("long").alias("n_uni"))
    n_bi = (
        t.where(F.size("toks") >= 2)
        .agg(F.sum(F.size("toks") - 1).cast("long").alias("n_bi"))
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    scored = (
        bg.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", F.col("a"), F.col("b")).alias("bigram"),
            F.col("c_ab").cast("long").alias("c_ab"),
            (
                F.col("c_ab").cast("double")
                / F.col("n_bi")
                / (
                    F.col("c_a").cast("double")
                    / F.col("n_uni")
                    * (F.col("c_b").cast("double") / F.col("n_uni"))
                )
            ).alias("lift"),
        )
    )
    result = scored.orderBy(F.desc("lift"), F.asc("bigram")).limit(k)
    rows = result.collect()  # bounded: ≤ k report rows
    from sutro_spark.session import release_local_checkpoint

    release_local_checkpoint(t)
    return df.sparkSession.createDataFrame(rows, result.schema)


def lang_id_margin(col, languages: list[str] | None = None) -> Column:
    """Language ID with a CONFIDENCE margin: struct(lang_pred, hits,
    margin) where margin = winner's distinct-stopword hits minus the
    runner-up's — margin 0 means the call is a coin flip and the doc
    belongs in an "und" (undetermined) bucket, the standard guard
    before per-language routing.

    Engine-portable tie-break without a custom comparator: elements
    sort fieldwise ascending as (hits, -lang_index, lang), so the LAST
    element carries max hits and, among ties, the lexicographically
    smallest language (same rule as :func:`lang_id`)."""
    langs = sorted(languages or STOPWORDS)
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        tokens(F.lower(col)),
                        F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
                    )
                ).alias("h"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    arr = F.array_sort(scored)
    last = arr[F.size(arr) - 1]
    second = arr[F.size(arr) - 2]
    return F.struct(
        last["lang"].alias("lang_pred"),
        last["h"].cast("long").alias("hits"),
        (last["h"] - second["h"]).cast("long").alias("margin"),
    )


def sentence_stats(
    df,
    text_column: str = "text",
    id_column: str = "doc_id",
):
    """Per-document sentence segmentation stats: sentences split on
    terminal-punctuation runs followed by whitespace ('[.!?]+\\s+' —
    deliberately lookbehind-free so RE2 engines segment identically
    to Java regex). Output: (id, n_sentences bigint,
    mean_sentence_chars double — one exact-int division rounded to 6,
    0.0 for sentence-less docs).

    Pure Catalyst: split + filter + aggregate inside the scan stage;
    no explode survives, no shuffle beyond the caller's.
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    sents = F.filter(
        F.split(F.coalesce(F.col(text_column), F.lit("")), r"[.!?]+\s+"),
        lambda s: s != "",
    )
    total_chars = F.aggregate(
        F.transform(sents, lambda s: F.length(s).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size(sents).cast("long")
    return df.select(
        F.col(id_column).alias("id"),
        n.alias("n_sentences"),
        F.when(n > 0, F.round(total_chars / n, 6)).otherwise(F.lit(0.0)).alias(
            "mean_sentence_chars"
        ),
    )


def keyword_hits(
    df: DataFrame,
    terms: list[str],
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    threshold: int = 1,
    scan_max_terms: int = 128,
) -> DataFrame:
    """Blocklist/keyword tagging: per-document hit counts against a
    term list (toxicity wordlists, spam markers, license strings) —
    the cheap lexical filter every corpus-curation pipeline runs
    before any model-based scoring.

    Output: (id, n_hits bigint — total term occurrences,
    n_terms bigint — distinct terms hit, flagged int — 1 iff
    n_hits >= threshold). Tokenization is lowercase split on
    ``[^a-z0-9]+`` so "Spam!" and "spam" count identically and the
    DuckDB oracle can mirror it verbatim.

    Two plans, same semantics, chosen by blocklist size:

    - |terms| <= ``scan_max_terms``: pure in-scan higher-order
      functions (filter/array_intersect against a literal array) —
      zero joins, zero shuffles, runs unchanged on a stream. The
      per-token cost is O(|terms|), fine for the small curated lists
      this path gates on.
    - larger lists: explode tokens -> broadcast equi-join the terms
      dim (O(1) hash probe per token regardless of list size) ->
      groupBy doc over the *surviving hits only* (blocklist hits are
      sparse, so the shuffle is tiny) -> broadcast join-back onto the
      id spine so zero-hit docs keep their row.
    """
    lowered = [t.lower() for t in terms]
    if not lowered:
        # An empty blocklist flags nothing. Guarded explicitly because the
        # scan path would otherwise build F.array() with zero elements —
        # an array<void> literal that fails analysis inside
        # array_contains/array_intersect instead of counting zero hits.
        return df.select(
            F.col(id_column).alias("id"),
            F.lit(0).cast("long").alias("n_hits"),
            F.lit(0).cast("long").alias("n_terms"),
            F.lit(1 if 0 >= threshold else 0).cast("int").alias("flagged"),
        )
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_column), F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    if len(lowered) <= scan_max_terms:
        lit_terms = F.array(*[F.lit(t) for t in lowered])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(lit_terms, t)))
        distinct_hits = F.size(F.array_intersect(toks, lit_terms))
        return df.select(
            F.col(id_column).alias("id"),
            hits.cast("long").alias("n_hits"),
            distinct_hits.cast("long").alias("n_terms"),
        ).withColumn(
            "flagged",
            F.when(F.col("n_hits") >= threshold, 1).otherwise(0).cast("int"),
        )
    spark = df.sparkSession
    dim = spark.createDataFrame([(t,) for t in sorted(set(lowered))], "term string")
    tok_rows = df.select(
        F.col(id_column).alias("id"), F.explode(toks).alias("term")
    )
    agg = (
        tok_rows.join(F.broadcast(dim), "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.countDistinct("term").cast("long").alias("n_terms"),
        )
    )
    spine = df.select(F.col(id_column).alias("id"))
    return (
        spine.join(F.broadcast(agg), "id", "left")
        .select(
            "id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
        )
        .withColumn(
            "flagged",
            F.when(F.col("n_hits") >= threshold, 1).otherwise(0).cast("int"),
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, list[str]]],
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 10,
    scale: int = 1_000_000,
    scan_max_terms: int = 128,
) -> DataFrame:
    """BM25 ranked retrieval over an in-scan inverted index: for each
    (query_id, [terms]) return the top-k documents by an Okapi-BM25
    score computed in exact integer arithmetic — the lexical-retrieval
    primitive for curation workflows (find the training docs most
    relevant to an eval topic, route docs to domain buckets, audit
    what a benchmark question would retrieve).

    Okapi parameters k1=1.2, b=0.75 are folded into integer rationals;
    with dl the doc token count, N docs, T total tokens:

        dln         = (1000 * dl * N) div T          (dl/avgdl, per-mille)
        sat_scaled  = (22000 * tf * scale)
                      div (10000 * tf + 3000 + 9 * dln)
        term_score  = ((2N - 2df + 1) * sat_scaled) div (2df + 1)
        score       = sum(term_score) over matched query terms

    The idf factor (2N-2df+1)/(2df+1) is a rational surrogate for the
    classic ln((N-df+.5)/(df+.5)) — same sign and monotonicity, no
    transcendentals, so Spark and DuckDB agree bit-for-bit (same
    discipline as :func:`tfidf_topk`; cross-libm ``ln`` would make the
    value-hash correctness gate flaky). Relative to log-idf BM25 this
    weights rare terms more aggressively when a query mixes very rare
    and very common terms; the retrieval structure (inverted index,
    tf saturation, length normalization) is identical. All sums are
    over BIGINTs, so aggregation order cannot perturb the result the
    way a floating-point sum across partitions would.

    Overflow bounds (documented, not just asserted): 22000*tf*scale
    needs tf < 4e8; (2N)*sat_scaled <= 4.4*N*scale needs N < 2e12
    docs; 1000*dl*N needs dl*N < 9e15. All comfortably beyond any
    real corpus; ``scale`` can be lowered if a larger N is ever needed.

    Tokenization is whitespace split (:func:`tokens` over the lowered
    text) — NOT keyword_hits's ``[^a-z0-9]+`` split — so punctuation
    stays attached ("spark," does not match the term "spark"). That is
    deliberate: BM25's dl/avgdl length normalization counts the same
    whitespace tokens as :func:`token_count`, and the DuckDB oracle
    mirrors the whitespace split verbatim. Pre-strip punctuation (or
    lower :func:`keyword_hits`'s split onto the text first) if
    blocklist-style matching semantics are wanted.

    Scale shape — two plans, same semantics, chosen by the size of the
    union of query-term sets (path-equality pytest-asserted):

    - <= ``scan_max_terms`` distinct terms: terms are filtered INSIDE
      the scan stage with a literal-array higher-order filter (same
      small-list idiom as :func:`keyword_hits`), so the only shuffle is
      a map-side-combinable groupBy over *matched postings* — corpus
      tokens that match no query term never leave the scan. The
      per-doc (dl, matched-hits) frame is materialized ONCE with an
      eager localCheckpoint: three consumers need it (corpus stats, the
      tf index, and term df), and without the checkpoint Spark plans
      three separate scans that each re-tokenize the corpus (measured
      at sf0.1: 1.26 s -> 0.92 s; at 100 TB, one tokenize pass + a
      checkpoint of (id, long, tiny-array) rows vs three full tokenize
      passes).
    - larger term sets: the literal-array filter's O(|terms|)-per-token
      linear probe would dominate the scan, so tokens explode and
      broadcast-equi-join a distinct-terms dim instead (O(1) hash probe
      per token regardless of term-set size — keyword_hits's large-list
      path). Corpus stats (N, T) come from a second, aggregate-only
      tokenize pass: two scans total, traded for never checkpointing
      full token arrays (the small path's checkpoint holds only tiny
      matched-hit arrays; the large path would have to persist the
      whole tokenized corpus to avoid the second scan).

    Either way corpus stats (N, T) are a 1-row broadcast; df comes from
    the matched-postings aggregate (exact: a doc either holds a query
    term or contributes nothing to that term's df); the per-query top-k
    is a rank window over candidates only (WindowGroupLimit prunes to k
    per partition before the query_id exchange), bounded by a
    deterministic (score desc, doc_id asc) tie-break.
    """
    if not queries or any(not ts for _, ts in queries):
        raise ValueError("bm25_topk requires >=1 query, each with >=1 term")
    from pyspark.sql import Window

    qmap = sorted({(int(qid), t.lower()) for qid, ts in queries for t in ts})
    all_terms = sorted({t for _, t in qmap})
    spark = df.sparkSession

    toks_col = tokens(F.lower(F.col(text_column)))
    if len(all_terms) <= scan_max_terms:
        lit_terms = F.array(*[F.lit(t) for t in all_terms])
        base = df.select(
            F.col(id_column).alias("__id"),
            toks_col.alias("toks"),
        ).select(
            "__id",
            F.size("toks").cast("long").alias("dl"),
            F.filter("toks", lambda t: F.array_contains(lit_terms, t)).alias(
                "hits"
            ),
        ).transform(_barrier)
        stats = base.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("total_tokens"),
        )
        tf = (
            base.select("__id", "dl", F.explode("hits").alias("term"))
            .groupBy("__id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
    else:
        tdim = spark.createDataFrame([(t,) for t in all_terms], "term string")
        tokenized = df.select(
            F.col(id_column).alias("__id"),
            toks_col.alias("toks"),
        ).select("__id", F.size("toks").cast("long").alias("dl"), "toks")
        stats = tokenized.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("total_tokens"),
        )
        tf = (
            tokenized.select("__id", "dl", F.explode("toks").alias("term"))
            .join(F.broadcast(tdim), "term")
            .groupBy("__id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("term_df")
    )
    qdim = spark.createDataFrame(qmap, "query_id long, term string")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qdim), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.expr(
                f"((2*n_docs - 2*term_df + 1)"
                f" * ((22000 * tf * CAST({scale} AS BIGINT))"
                f"    DIV (10000*tf + 3000 + 9*((1000*dl*n_docs) DIV total_tokens))))"
                f" DIV (2*term_df + 1)"
            ),
        )
    )
    agg = scored.groupBy("query_id", "__id").agg(
        F.sum("term_score").cast("long").alias("score_scaled")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc("__id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("__id").alias(id_column),
            "score_scaled",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def content_chunks(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    divisor: int = 8,
    max_words: int | None = None,
    salt: str = "cdc",
) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync boundary idea at
    word granularity): a chunk boundary opens wherever the hash of the
    (previous word, word) pair is divisible by ``divisor`` — so chunk
    boundaries are a function of LOCAL CONTENT, not byte offsets, and
    inserting or deleting a prefix shifts only the chunks up to the
    first surviving boundary. Fixed-size chunking (:func:`chunk_text`)
    re-cuts the entire document after any edit; content-defined chunks
    make chunk-hash equality a shift-robust near-dup signal
    (pytest asserts a prefix-edited copy shares all but the first
    chunk hashes).

    Expected chunk length is ``divisor`` words (geometric); real CDC
    adds min/max size bounds, but a MIN bound makes the boundary
    decision sequential (each boundary depends on where the previous
    chunk ended) and would force the whole document through a
    single-pass UDF. This variant keeps the pure content rule — fully
    relational — and offers ``max_words`` as a relational post-split:
    within a content chunk, words re-split every ``max_words``
    (sub_seq), bounding the worst-case chunk without breaking the
    shift-robustness of the boundaries themselves.

    Hash = the repo's portable 32-bit sha256-prefix over
    ``salt:prev:word`` (winnow_fingerprints' construction), so any
    engine reproduces boundaries and chunk hashes bit-for-bit.

    Scale shape: words explode inside the scan; the boundary lag and
    the chunk-id running count are bounded per-document windows
    (parallel across docs, same discipline as winnowing); one groupBy
    (id, chunk) rebuilds chunk text order-deterministically. No
    corpus x corpus anything.

    Output: (id, chunk_seq, sub_seq, start_word, n_words, chunk_hash)
    — chunk_seq numbers content chunks from 0 in document order,
    sub_seq the max_words re-splits within one (always 0 when
    ``max_words`` is None).
    """
    if divisor < 1:
        raise ValueError("divisor must be >= 1")
    if max_words is not None and max_words < 1:
        raise ValueError("max_words must be >= 1 when set")
    from pyspark.sql import Window

    words = df.select(
        F.col(id_column).alias("id"),
        F.posexplode(tokens(F.lower(F.col(text_column)))).alias("pos", "w"),
    )
    part = Window.partitionBy("id").orderBy(F.col("pos").asc())
    h = F.conv(
        F.substring(
            F.sha2(
                F.concat_ws(":", F.lit(salt), F.lag("w", 1).over(part), F.col("w")),
                256,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    flagged = words.withColumn(
        "bnd",
        F.when(
            (F.col("pos") > 0) & (h % divisor == 0), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "chunk_seq",
        F.sum("bnd").over(part.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    if max_words is not None:
        cw = Window.partitionBy("id", "chunk_seq")
        flagged = flagged.withColumn(
            "sub_seq",
            ((F.col("pos") - F.min("pos").over(cw)) / max_words)
            .cast("long"),
        )
    else:
        flagged = flagged.withColumn("sub_seq", F.lit(0).cast("long"))
    grouped = flagged.groupBy("id", "chunk_seq", "sub_seq").agg(
        F.min("pos").cast("long").alias("start_word"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("__chunk_text"),
    )
    return grouped.select(
        "id",
        "chunk_seq",
        "sub_seq",
        "start_word",
        "n_words",
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(f"{salt}#:"), F.col("__chunk_text")), 256),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("chunk_hash"),
    )


def ngram_novelty(
    df: DataFrame,
    reference: DataFrame,
    *,
    n: int = 3,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction
    of the document's word n-grams that appear NOWHERE in the
    reference — the standard memorization/novelty diagnostic for
    training-data work (how much of a candidate set is genuinely new
    text vs recombinations of what the model already saw; the
    document-level complement of decontamination's benchmark-level
    question).

    novelty_milli = (1000 * n_unseen) div n_grams — integer rational,
    0 (all n-grams known) to 1000 (fully novel). Documents with fewer
    than ``n`` tokens have no n-grams and report NULL (no basis for a
    claim, not "novel by vacuity").

    Plan: both sides explode n-grams inside their scan; the reference
    set is DISTINCT n-grams (one combinable aggregate); the probe is
    a left-anti-shaped join counted per doc — an equi-join on the
    gram string, never pairs of docs. At 100 TB persist the distinct
    reference grams bucketed by gram (streaming/dedup.py's layout) so
    only the probe side shuffles; a bloom prefilter
    (operators/decontaminate.py's idiom) can skip the join for
    clearly-novel grams.

    Output: (id, n_grams, n_unseen, novelty_milli).
    """
    if n < 1:
        raise ValueError("n must be >= 1")

    def grams(frame: DataFrame, with_id: bool) -> DataFrame:
        toks = tokens(F.lower(F.coalesce(F.col(text_column), F.lit(""))))
        # guard: sequence(1, 0) DESCENDS in Spark, so short docs must
        # take the empty-array branch, not a degenerate sequence
        g = F.expr(
            f"CASE WHEN size(__toks) >= {n} THEN "
            f"transform(sequence(1, size(__toks) - {n - 1}),"
            f" i -> concat_ws(' ', slice(__toks, i, {n}))) "
            f"ELSE array() END"
        )
        base = frame.select(
            *([F.col(id_column).alias("id")] if with_id else []),
            toks.alias("__toks"),
        ).select(
            *(["id"] if with_id else []),
            F.explode_outer(g).alias("gram"),
        )
        return base

    ref = (
        grams(reference, with_id=False)
        .where(F.col("gram").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    probe = grams(df, with_id=True)
    return (
        probe.join(ref, "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("gram")).cast("long").alias("n_grams"),
            F.sum(
                F.when(
                    F.col("gram").isNotNull() & F.col("__hit").isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_unseen"),
        )
        .select(
            "id",
            "n_grams",
            "n_unseen",
            F.expr(
                "CAST(CASE WHEN n_grams = 0 THEN NULL "
                "ELSE (1000 * n_unseen) div n_grams END AS BIGINT)"
            ).alias("novelty_milli"),
        )
    )


def vocab_richness(
    df: DataFrame,
    *,
    text_column: str = "text",
) -> DataFrame:
    """Corpus vocabulary-richness: Chao1 species estimate and the
    Good-Turing unseen-probability mass, from one token scan.

    Why a training-data pipeline wants this: before paying for more
    crawl, ask "how much vocabulary is this source still hiding?".
    Chao1 lower-bounds the true type count from the singleton and
    doubleton counts; the Good-Turing mass f1/N is the probability
    the NEXT token drawn is a never-seen type. A source whose
    chao1 is close to the observed type count (and gt mass near 0)
    is lexically saturated; one with a large gap still yields new
    vocabulary per added document.

    Bias-corrected Chao1 (always finite, no f2=0 blow-up):

        chao1 = D + f1*(f1-1) / (2*(f2+1))

    computed as ONE IEEE division of exact BIGINT numerator
    (2*(f2+1)*D + f1*(f1-1)) by exact BIGINT denominator
    (2*(f2+1)) so the double is engine-reproducible (same idiom as
    `fleiss_kappa`). Good-Turing mass = CAST(f1)/CAST(N), also a
    single exact-integer division. Overflow: D, f1 < 2^31 covers
    any real vocabulary; terms stay far below 2^63.

    Tokenization is keyword_hits's ``[^a-z0-9]+`` split on the
    lowered text (punctuation-robust), empties dropped.

    Plan: scan -> explode -> two combinable groupBys
    (token -> count, count -> frequency-of-frequency) -> 1-row agg.
    The token groupBy is the only real shuffle and it map-side
    combines; at 100 TB the frequency table is vocabulary-sized
    (millions of rows), everything after it is trivial.

    Reference parity: the reference SDK ships corpus stats to its
    server side; this is the in-engine equivalent (cf. reference
    README data-quality tooling).
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    toks = df.select(
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.coalesce(F.col(text_column), F.lit(""))),
                    "[^a-z0-9]+",
                ),
                lambda x: x != "",
            )
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.coalesce(F.sum(F.when(F.col("c") == 1, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("f1"),
        F.coalesce(F.sum(F.when(F.col("c") == 2, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("f2"),
    ).select(
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        F.expr(
            "CAST(2*(f2+1)*n_types + f1*(f1-1) AS DOUBLE)"
            " / CAST(2*(f2+1) AS DOUBLE)"
        ).alias("chao1"),
        F.expr(
            "CASE WHEN n_tokens > 0 THEN"
            " CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) END"
        ).alias("gt_unseen_mass"),
    )


def yule_k(
    df: DataFrame,
    *,
    text_column: str = "text",
) -> DataFrame:
    """Corpus lexical-repetitiveness: Yule's characteristic K
    (Yule 1944), the length-invariant repetition constant

        K = 10^4 * (sum_c c^2 * f_c - N) / N^2
          = 10^4 * (S2 - N) / N^2

    over the type-frequency spectrum (S2 = sum of squared type
    counts, N = token count). Why a training-data pipeline wants it:
    K is ~stable under corpus growth for natural text (~60-180 for
    English prose) and blows up on template/boilerplate-heavy
    sources — a single scalar that flags "this crawl slice is mostly
    the same page over and over" where per-doc repetition profiles
    (`repetition_profile`) can't see cross-document sameness. The
    complement of `vocab_richness`: Chao1 asks "how much NEW
    vocabulary is left", K asks "how hard does the old vocabulary
    repeat".

    Exact arithmetic: S2 and N are BIGINTs; K is ONE IEEE division
    of exact integers (10^4*(S2-N)) / N^2 — engine-reproducible, the
    `vocab_richness`/`fleiss_kappa` idiom. Overflow: S2 <= N^2 needs
    10^4*N^2 < 2^63 — fine below ~30M tokens per *corpus slice*;
    shard bigger corpora and K per shard (K is the point: it is
    size-invariant, so per-shard values are comparable).

    Tokenization matches `vocab_richness`: ``[^a-z0-9]+`` split on
    lowered text, empties dropped.

    Plan: scan -> explode -> ONE map-side-combinable token groupBy
    (the only shuffle, vocabulary-sized) -> 1-row agg.
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    toks = df.select(
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.coalesce(F.col(text_column), F.lit(""))),
                    "[^a-z0-9]+",
                ),
                lambda x: x != "",
            )
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
        .cast("long")
        .alias("s2"),
    ).select(
        "n_tokens",
        "n_types",
        "s2",
        F.expr(
            "CASE WHEN n_tokens > 0 THEN"
            " CAST(10000 * (s2 - n_tokens) AS DOUBLE)"
            " / CAST(n_tokens * n_tokens AS DOUBLE) END"
        ).alias("yule_k"),
    )


def unigram_surprisal(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Per-document unigram-LM surprisal in floor-log2 bits — the
    ln()-free cross-entropy quality signal: score each document by
    how surprising its tokens are under the corpus's own unigram
    distribution. Boilerplate scores low (its tokens are everywhere),
    lexically unusual documents score high; both tails are curation
    candidates (dedup the low tail, inspect the high tail for junk /
    non-language), the same role perplexity filters play in published
    pipelines (CCNet, Gopher) without shipping an LM.

    Exactness: a token with corpus count c out of N total has
    surprisal floor(log2(N/c)) bits, computed EXACTLY in integer
    arithmetic as length(bin(N div c)) - 1 — for any integers
    N >= c >= 1, floor(log2(N/c)) equals the bit-length of
    floor(N/c) minus one (2^k <= N/c < 2^(k+1) iff the integer
    quotient lies in [2^k, 2^(k+1))). `bin()` renders identically in
    Spark and DuckDB, so the quantized cross-entropy is
    oracle-checkable with zero float drift; quantization to whole
    bits costs resolution but none of the ordering signal a filter
    gate needs.

    Tokenization matches `vocab_richness`/`yule_k`: ``[^a-z0-9]+``
    on lowered text, empties dropped. Documents with no tokens are
    absent from the output (no tokens -> no distribution to score).

    Plan: ONE tokenize pass feeds both sides — a map-side-combinable
    token groupBy (vocabulary-sized shuffle) and the per-token rows;
    they rejoin ON TOKEN (shuffle join; at 100 TB both sides are
    token-partitioned so the join co-locates), then one per-doc sum.
    N is a 1-row broadcast. No floats anywhere until none are needed.

    Output: (id, n_tokens, surprisal_bits, bpt_milli) — bpt_milli =
    (1000 * surprisal_bits) div n_tokens, milli-scaled bits/token.
    """
    toks = df.select(
        F.col(id_column).cast("long").alias("__id"),
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.coalesce(F.col(text_column), F.lit(""))),
                    "[^a-z0-9]+",
                ),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    total = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total")
    )
    per_tok = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "__id",
            F.expr(
                "CAST(length(bin(n_total div c)) - 1 AS BIGINT)"
            ).alias("bits"),
        )
    )
    return (
        per_tok.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
        )
        .select(
            F.col("__id").alias(id_column),
            "n_tokens",
            "surprisal_bits",
            F.expr(
                "CAST((1000 * surprisal_bits) div n_tokens AS BIGINT)"
            ).alias("bpt_milli"),
        )
    )


def readability_profile(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Per-document readability: word/sentence/syllable counts and a
    quantized Flesch reading-ease score — the classic text-quality
    heuristic family (C4/Gopher-style gates use exactly these
    statistics) as pure in-scan Catalyst expressions.

    Flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/
    words), computed in MILLI units with floor divisions:

        flesch_milli = 206835 - (1015*W) div S - (84600*Y) div W

    The two floor divisions quantize each term to a milli unit —
    deterministic on any engine, and a gate thresholding on "reading
    ease < X" cannot feel sub-milli error. Syllables are the standard
    vowel-group proxy (runs of [aeiouy] in the lowered text): exact
    syllabification needs a dictionary; the proxy is what every
    scalable readability implementation actually ships. Sentences
    split on terminal-punctuation runs (the `sentence_stats` pattern,
    lookbehind-free so RE2 == Java regex); words on the repo's
    ``[^a-z0-9]+`` tokenization, occurrences NOT deduped.

    Docs with no sentences or no words report NULL flesch_milli
    (undefined, not fake-zero). No explode, no shuffle: every count
    is an in-scan expression — at 100 TB this is a map-only pass.

    Output: (id, n_sentences, n_words, n_syllables, flesch_milli).
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    low = F.lower(F.coalesce(F.col(text_column), F.lit("")))
    n_sent = F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_column), F.lit("")), r"[.!?]+\s+"),
            lambda s: s != "",
        )
    ).cast("long")
    n_words = F.size(
        F.filter(F.split(low, "[^a-z0-9]+"), lambda x: x != "")
    ).cast("long")
    n_syll = F.regexp_count(low, F.lit("[aeiouy]+")).cast("long")
    return df.select(
        F.col(id_column).alias("id"),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    ).withColumn(
        "flesch_milli",
        F.expr(
            "CASE WHEN n_sentences > 0 AND n_words > 0 THEN "
            "CAST(206835 - (1015 * n_words) div n_sentences "
            "- (84600 * n_syllables) div n_words AS BIGINT) END"
        ),
    )


#: UTF-8-decoded-as-cp1252 marker sequences (the ftfy mojibake
#: fingerprint): each is what a common non-ASCII character becomes
#: after the double-decode (e.g. RIGHT SINGLE QUOTE U+2019 ->
#: "\u00e2\u20ac\u2122", rendered a-circumflex + euro + trademark).
#: A fixed literal list keeps the counter a pure string op (no
#: regex-dialect drift) that any engine reproduces.
MOJIBAKE_MARKERS = [
    "\u00c3\u00a9",  # e-acute
    "\u00c3\u00a1",  # a-acute
    "\u00c3\u00b3",  # o-acute
    "\u00c3\u00bc",  # u-umlaut
    "\u00c3\u00b1",  # n-tilde
    "\u00e2\u20ac\u2122",  # right single quote
    "\u00e2\u20ac\u0153",  # left double quote
    "\u00e2\u20ac\u201c",  # en dash
    "\u00c2\u00a0",  # NBSP
]


def encoding_damage_profile(
    df, text_column: str = "text", id_column: str = "doc_id"
):
    """Mojibake / encoding-damage detector (the ftfy problem class):
    web corpora are full of UTF-8 text that was decoded as cp1252
    somewhere upstream (a right single quote becomes the three-char
    a-circumflex/euro/trademark sequence), plus U+FFFD replacement
    chars from lossy transcodes. Per doc: marker-sequence occurrences
    (fixed literal list -- see MOJIBAKE_MARKERS), replacement-char
    count, and the damage flag.

    Every counter is substitution arithmetic --
    (len(text) - len(replace(text, marker, ''))) / len(marker) -- pure
    codegen string ops, zero joins/shuffles, exact in any engine, and
    stream-safe (a per-row projection survives readStream unchanged).

    Output: (id, n_mojibake bigint, n_replacement bigint,
    damaged boolean).
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    from pyspark.sql import functions as F

    t = F.coalesce(F.col(text_column), F.lit(""))

    def _count(marker):
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(marker), F.lit(""))))
            / F.lit(len(marker))
        ).cast("long")

    n_moji = None
    for mk in MOJIBAKE_MARKERS:
        c = _count(mk)
        n_moji = c if n_moji is None else n_moji + c
    n_repl = _count("\ufffd")
    return df.select(
        F.col(id_column).alias("id"),
        n_moji.cast("long").alias("n_mojibake"),
        n_repl.alias("n_replacement"),
        ((n_moji + n_repl) > 0).alias("damaged"),
    )


def script_profile(df, text_column: str = "text", id_column: str = "doc_id"):
    """Unicode script composition per document -- the multilingual
    corpus filter (FineWeb2/CC-style pipelines gate on script ratios
    before language ID: a "French" doc that is 40% CJK is mislabeled
    or mojibake). Counts per script class via regexp-strip arithmetic
    (len - len(strip(class))) -- a pure projection, zero joins, zero
    shuffles, stream-safe; every count is an exact integer so
    cross-engine parity is trivial (all classes are BMP ranges, one
    unit in both UTF-16 and codepoint length semantics).

    ``dominant`` uses a FIXED priority order on ties
    (latin > cyrillic > cjk, 'none' when no letters) and
    ``latin_milli`` is exact integer division -- stated, not
    locale- or float-dependent.

    Output: (id, n_chars, n_latin, n_cyrillic, n_cjk, n_digit,
    n_space, latin_milli bigint -- NULL on empty text, dominant
    string).
    """
    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    from pyspark.sql import functions as F

    t = F.coalesce(F.col(text_column), F.lit(""))

    def _n(pattern):
        return (
            F.length(t) - F.length(F.regexp_replace(t, pattern, ""))
        ).cast("long")

    n_chars = F.length(t).cast("long")
    n_latin = _n("[A-Za-z]")
    n_cyr = _n("[\u0400-\u04ff]")
    n_cjk = _n("[\u4e00-\u9fff]")
    dominant = (
        F.when((n_latin + n_cyr + n_cjk) == F.lit(0), F.lit("none"))
        .when((n_latin >= n_cyr) & (n_latin >= n_cjk), F.lit("latin"))
        .when(n_cyr >= n_cjk, F.lit("cyrillic"))
        .otherwise(F.lit("cjk"))
    )
    return df.select(
        F.col(id_column).alias("id"),
        n_chars.alias("n_chars"),
        n_latin.alias("n_latin"),
        n_cyr.alias("n_cyrillic"),
        n_cjk.alias("n_cjk"),
        _n("[0-9]").alias("n_digit"),
        # explicit class, NOT \s: Java's \s is [ \t\n\x0B\f\r] while
        # RE2's (the oracle's) is [\t\n\f\r ] — U+000B vertical tab
        # would diverge; the pinned class is identical in both engines
        _n("[ \\t\\n\\x0B\\f\\r]").alias("n_space"),
        dominant.alias("dominant"),
    ).select(
        "id",
        "n_chars",
        "n_latin",
        "n_cyrillic",
        "n_cjk",
        "n_digit",
        "n_space",
        F.expr(
            "CASE WHEN n_chars > 0 THEN 1000 * n_latin div n_chars END"
        ).alias("latin_milli"),
        "dominant",
    )


#: The full multilingual script-class set (FineWeb2/CC-style gates):
#: name -> BMP codepoint range, priority = LIST ORDER on dominant
#: ties (stated, deterministic). Latin is None -> ASCII letters
#: [A-Za-z] (the profile convention script_profile set). Every range
#: is a clean BMP block, one unit in both UTF-16 (Spark length) and
#: codepoint (DuckDB length) semantics, so counts agree cross-engine.
SCRIPT_CLASSES = [
    ("latin", None),
    ("cyrillic", (0x0400, 0x04FF)),
    ("cjk", (0x4E00, 0x9FFF)),
    ("arabic", (0x0600, 0x06FF)),
    ("devanagari", (0x0900, 0x097F)),
    ("hangul", (0xAC00, 0xD7A3)),
    ("greek", (0x0370, 0x03FF)),
    ("hebrew", (0x0590, 0x05FF)),
    ("thai", (0x0E00, 0x0E7F)),
]


def script_gate(
    df,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    dominant_threshold_milli: int = 800,
):
    """Full multilingual script gate (the FineWeb2/CC class set that
    :func:`script_profile`'s 3-script starter grows into): per-doc
    letter counts for all nine SCRIPT_CLASSES via the same
    regexp-strip arithmetic (len - len(strip(class)) -- pure
    projection, zero joins/shuffles, stream-safe, exact integers),
    the dominant script (max count, ties -> SCRIPT_CLASSES order,
    'none' when no letters), its exact integer milli ratio of all
    script letters, and the ``mixed`` anomaly flag: letters present
    but the dominant script holds less than ``dominant_threshold_milli``
    per mille of them -- the route-to-language-ID-review signal (a
    "French" doc that is 40% CJK is mislabeled or mojibake).

    Output: (id, n_chars, n_latin, n_cyrillic, n_cjk, n_arabic,
    n_devanagari, n_hangul, n_greek, n_hebrew, n_thai, n_letters,
    dominant string, dominant_milli bigint -- NULL when no letters,
    mixed boolean).
    """
    from pyspark.sql import functions as F

    t = F.coalesce(F.col(text_column), F.lit(""))

    def _n(pattern):
        return (
            F.length(t) - F.length(F.regexp_replace(t, pattern, ""))
        ).cast("long")

    counts = {}
    for name, rng in SCRIPT_CLASSES:
        pat = "[A-Za-z]" if rng is None else f"[\\u{rng[0]:04X}-\\u{rng[1]:04X}]"
        counts[name] = _n(pat)
    base = df.select(
        F.col(id_column).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )
    cols = [F.col(f"n_{name}") for name, _ in SCRIPT_CLASSES]
    n_letters = cols[0]
    for c in cols[1:]:
        n_letters = n_letters + c
    maxc = F.greatest(*cols)
    dom = F.when(n_letters == F.lit(0), F.lit("none"))
    for name, _ in SCRIPT_CLASSES:  # first class at the max wins ties
        dom = dom.when(F.col(f"n_{name}") == maxc, F.lit(name))
    with_dom = base.select(
        "*",
        n_letters.cast("long").alias("n_letters"),
        dom.alias("dominant"),
        F.when(n_letters > F.lit(0), (F.lit(1000) * maxc))
        .otherwise(F.lit(None))
        .alias("__num"),
    )
    return with_dom.select(
        "id",
        "n_chars",
        *[f"n_{name}" for name, _ in SCRIPT_CLASSES],
        "n_letters",
        "dominant",
        F.expr("CAST(__num div n_letters AS BIGINT)").alias("dominant_milli"),
        (
            (F.col("n_letters") > 0)
            & (
                F.expr("__num div n_letters")
                < F.lit(dominant_threshold_milli)
            )
        ).alias("mixed"),
    )


#: Candidate payment-card pattern: contiguous 13-19 digit runs. No
#: lookarounds (RE2/Java parity — the EMAIL_RE/PHONE_RE rule); a run
#: longer than 19 digits greedily matches its first 19 in BOTH engines
#: (stated: boundary-exact card isolation needs a tokenizer upstream).
CARD_RE = r"[0-9]{13,19}"


def _luhn_sum_expr(c: str) -> str:
    """SQL fragment: the Luhn digit sum of digit-string expression
    ``c`` — double every second digit from the RIGHT, fold > 9 by
    subtracting 9, sum. Shared by luhn_valid and card_hits' filter."""
    d = f"(ascii(substring({c}, i, 1)) - 48)"
    return (
        f"aggregate(transform(sequence(1, length({c})),"
        f" i -> CASE WHEN (length({c}) - i) % 2 = 1"
        f" THEN IF({d} * 2 > 9, {d} * 2 - 9, {d} * 2)"
        f" ELSE {d} END),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def luhn_valid(column_name: str) -> Column:
    """Luhn checksum (ISO/IEC 7812) of a digit-string column (by
    name) — the check that separates real payment-card numbers from
    arbitrary digit runs (cuts PII-scrub false positives ~10x). Pure
    integer HOF arithmetic, identical in any engine, zero Python:
    valid iff the Luhn sum mod 10 == 0."""
    from pyspark.sql import functions as F

    return F.expr(f"{_luhn_sum_expr(column_name)} % 10 = 0")


def card_hits(
    df,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    output_column: str = "redacted",
    token: str = "[CARD]",
):
    """Payment-card PII detection with Luhn validation (the
    redact_pii family member where a bare regex is not enough: most
    13-19 digit runs are order ids / timestamps, and scrubbing them
    destroys data — only checksum-valid runs redact).

    One projection: extract candidate runs (CARD_RE), Luhn-check each
    via integer HOF arithmetic, count both, and fold the VALID ones
    through replace() into ``output_column``. Zero joins, zero
    shuffles, zero Python — scan-speed like redact_pii.

    Stated redaction boundary (r13 advice): the fold uses LITERAL
    ``replace``, so every occurrence of a valid candidate's digit
    string redacts — including where those digits appear as a
    SUBSTRING of a longer non-candidate digit context elsewhere in
    the text (over-redaction, the safe direction for PII). Anchoring
    on digit boundaries would need lookbehind, which RE2 (the oracle
    engine) lacks, so the literal fold is the deliberate
    engine-portable contract, like CARD_RE's documented >19-digit
    greedy prefix.

    Output: df + (n_card_candidates, n_valid_cards, has_card,
    ``output_column``).
    """
    from pyspark.sql import functions as F

    cands = F.expr(
        f"regexp_extract_all(coalesce({text_column}, ''), '{CARD_RE}', 0)"
    )
    valid_expr = (
        f"filter(__cands, __c -> {_luhn_sum_expr('__c')} % 10 = 0)"
    )
    return (
        df.withColumn("__cands", cands)
        .withColumn("__valid", F.expr(valid_expr))
        .withColumn(
            "n_card_candidates", F.size("__cands").cast("long")
        )
        .withColumn("n_valid_cards", F.size("__valid").cast("long"))
        .withColumn("has_card", F.col("n_valid_cards") > 0)
        .withColumn(
            output_column,
            F.expr(
                f"aggregate(__valid, coalesce({text_column}, ''),"
                f" (acc, c) -> replace(acc, c, '{token}'))"
            ),
        )
        .drop("__cands", "__valid")
    )
