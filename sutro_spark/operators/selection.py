"""Data-selection scoring for pretraining corpora (north-star
extension; the reference SDK has no selection surface — these extend
the training-data family next to operators/quality.py).

Two standard selection signals, both pure Catalyst (no Python in the
hot path) and both engine-portable under the repo's float-parity
discipline (integer milli-weights; one final division at most):

- :func:`dsir_weights` — Data Selection with Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): hashed-unigram bag-of-words
  likelihood ratio between a TARGET corpus (what you want more of) and
  the RAW corpus. Per hash bucket b the smoothed log ratio
  ``ln(p_target(b) / p_raw(b))`` becomes an integer milli-weight; a
  document's importance is the sum of its tokens' weights. Documents
  that look like the target score high; resample/filter on the score.

- :func:`charlm_score` — CCNet-style LM quality proxy (Wenzek et al.
  2020) without an external model: a character-bigram language model
  fit on the corpus itself. Per-doc mean log-probability of its
  bigrams under the corpus model — boilerplate and natural prose score
  high, garbage/random bytes score low (they contain rare transitions).

Scale shape (both): explode grams → map-side-combinable counts →
model table is at most ``buckets`` / |alphabet|² rows → BROADCAST join
back to per-doc gram counts → one groupBy(doc). The corpus is scanned
twice (model fit + scoring) and shuffled only as (id, gram-key) count
rows; no corpus×corpus blow-up anywhere, and at 100 TB the model
table is still tiny (fits every executor).

Float parity: ``ln`` is evaluated on a double produced by ONE division
of exact integers, scaled to milli-units, rounded, and cast to BIGINT
— summing integers is associative, so engines can't drift by
re-associating float adds. (ln itself is not IEEE-correctly-rounded,
but a flip requires the milli-scaled value to land within an ulp of a
.5 boundary — negligible, and the selfcheck gate would surface it.)
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.sampling import hash_bucket
from sutro_spark.functions.text import tokens
from sutro_spark.operators.dedup import char_shingles


def _token_buckets(
    df: DataFrame, text_column: str, id_column: str, *, buckets: int, salt: str
) -> DataFrame:
    """(id, bucket) — one row per token OCCURRENCE, lowercased
    whitespace tokens hashed into ``buckets`` via the portable sha
    bucket (the same construction every sampling oracle mirrors)."""
    return df.select(
        F.col(id_column).alias("id"),
        F.explode(tokens(F.lower(F.coalesce(F.col(text_column), F.lit(""))))).alias(
            "tok"
        ),
    ).select("id", hash_bucket(F.col("tok"), salt=salt, buckets=buckets).alias("b"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR importance score of every RAW document toward
    the TARGET distribution.

    Model: hashed unigram counts per corpus with Laplace smoothing —
    bucket weight ``w(b) = ln( ((tc+1)·(R+B)) / ((rc+1)·(T+B)) )``
    where tc/rc are target/raw counts for bucket b, T/R the corpus
    totals, B = ``buckets``; stored as BIGINT milli-units. Document
    score = Σ over token occurrences of w(bucket(token)) — i.e. the
    smoothed log-likelihood ratio of the document's hashed bag of
    words, the quantity DSIR importance-resamples on.

    Output: (id, n_tokens, dsir_milli) for EVERY raw document
    (token-less docs score 0). dsir_milli is an exact integer —
    sort/filter/threshold it directly, or divide by n_tokens for a
    length-normalized variant.
    """
    raw_tok = _token_buckets(raw, text_column, id_column, buckets=buckets, salt=salt)
    tgt_tok = _token_buckets(target, text_column, id_column, buckets=buckets, salt=salt)

    # per-(doc, bucket) counts are the ONE tokenize+hash pass over each
    # corpus; everything else (bucket counts, totals, per-doc scoring)
    # derives from these small count tables. Persisted because the plan
    # references them fan-out — Catalyst does not dedupe common
    # subtrees, so without the persist the regex+sha tokenization would
    # run 3× over the raw corpus (measured 3× the whole query's time).
    # At 100 TB this is the intermediate you'd checkpoint anyway: it is
    # |docs|·|distinct buckets per doc| rows of three integers — orders
    # of magnitude smaller than the text it summarizes.
    # r16: eager localCheckpoint instead of persist() — within ONE
    # action the multiple cache references race to populate the
    # InMemoryRelation and replay lineage (the curation-v3 lesson);
    # the eager row-format barrier materializes exactly once
    pdb_raw = (
        raw_tok.groupBy("id", "b").agg(F.count(F.lit(1)).alias("cnt"))
        .transform(_barrier)
    )
    pdb_tgt = (
        tgt_tok.groupBy("id", "b").agg(F.count(F.lit(1)).alias("cnt"))
        .transform(_barrier)
    )

    rc = pdb_raw.groupBy("b").agg(F.sum("cnt").alias("rc"))
    tc = pdb_tgt.groupBy("b").agg(F.sum("cnt").alias("tc"))
    # scalar totals as 1-row broadcast cross joins — never a driver
    # collect (same pattern as the TPC-H scalar subqueries)
    r_tot = pdb_raw.agg(F.sum("cnt").alias("R"))
    t_tot = pdb_tgt.agg(F.sum("cnt").alias("T"))
    model = (
        rc.join(tc, "b", "full_outer")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "b",
            # each factor cast to double BEFORE multiplying: IEEE
            # multiply/divide are correctly rounded (engine-identical),
            # and doubles can't int64-overflow at 100 TB token counts
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                        * (F.col("R") + F.lit(buckets)).cast("double")
                    )
                    / (
                        (F.coalesce(F.col("rc"), F.lit(0)) + 1).cast("double")
                        * (F.col("T") + F.lit(buckets)).cast("double")
                    )
                )
                * 1000
            )
            .cast("long")
            .alias("w_milli"),
        )
    )
    scored = (
        pdb_raw.join(F.broadcast(model), "b")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("w_milli")).alias("dsir_milli"),
        )
    )
    ids = raw.select(F.col(id_column).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("dsir_milli", F.lit(0)).cast("long").alias("dsir_milli"),
    )


def charlm_score(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Corpus-self-trained character-bigram LM quality score.

    Normalization: lowercase, all whitespace runs collapsed to one
    space, trimmed — so formatting differences don't shift the model.
    Model: ``p(y|x) = (n(xy)+1) / (n(x·)+V)`` with V = number of
    distinct bigrams whose first char is x's alphabet... precisely:
    V = count of DISTINCT second characters observed corpus-wide
    (Laplace over the observed alphabet). Each bigram's
    ``ln p(y|x)`` is a BIGINT milli-weight; a document's score is the
    mean over its bigram occurrences — one exact integer sum, one
    final division.

    Output: (id, n_bigrams, mean_logp) with mean_logp rounded to 3
    decimals (0.0 for docs with fewer than 2 normalized chars).
    Low (very negative) = improbable character transitions → likely
    garbage; high = conformant text.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_column), F.lit(""))), r"\s+", " ")
    )
    base = df.select(F.col(id_column).alias("id"), norm.alias("t"))
    grams = char_shingles(base, "t", "id", k=2, distinct=False)

    # ONE gram pass: per-(doc, bigram) counts, persisted against the
    # plan's fan-out (model counts + scoring both derive from it);
    # n(xy), n(x·) and the alphabet are rollups of this small table,
    # never re-scans of the corpus.
    per_doc = (
        # r16: eager localCheckpoint, not persist() — model counts,
        # vocab and scoring all reference this table inside one action
        # (the curation-v3 persist-race lesson)
        grams.groupBy("id", "shingle").agg(F.count(F.lit(1)).alias("cnt"))
        .transform(_barrier)
    )
    n_xy = per_doc.groupBy("shingle").agg(F.sum("cnt").alias("nxy"))
    n_x = n_xy.groupBy(F.substring("shingle", 1, 1).alias("x")).agg(
        F.sum("nxy").alias("nx")
    )
    vocab = n_xy.agg(
        F.countDistinct(F.substring("shingle", 2, 1)).alias("V")
    )
    model = (
        n_xy.withColumn("x", F.substring("shingle", 1, 1))
        .join(n_x, "x")
        .crossJoin(F.broadcast(vocab))
        .select(
            "shingle",
            F.round(
                F.log(
                    (F.col("nxy") + 1).cast("double") / (F.col("nx") + F.col("V"))
                )
                * 1000
            )
            .cast("long")
            .alias("w_milli"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(model), "shingle")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("w_milli")).alias("s_milli"),
        )
    )
    ids = df.select(F.col(id_column).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.round(
                F.col("s_milli").cast("double") / (F.col("n_bigrams") * 1000), 3
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_logp"),
    )
