"""Data-mixture operators: what a pre-training corpus is made of, and
deterministic re-weighting of over-represented slices.

Two halves of the same workflow:

- :func:`source_mix` is the mixture *report* — per (source, lang):
  document count, token count, and share of total corpus tokens. At
  100 TB this is one shuffle on (source, lang) with map-side partial
  aggregation; the corpus total is a 1-row aggregate broadcast into a
  cross join, not a second pass or a driver collect.

- :func:`cap_per_source` is the mixture *edit* — keep at most ``cap``
  documents per source, selected by a deterministic pseudo-random
  order (sha2 of the salted doc id) so reruns and engines agree
  row-for-row. This is the standard down-sampling step when one crawl
  dominates the mixture. The rank is a per-source window sort; at
  100 TB the sort is bounded per source partition, and a skewed
  mega-source can be pre-sharded with the salting utilities in
  functions/skew.py before ranking.

The reference has no mixture surface (it is an inference SDK); these
extend the dedup/quality suite per the brief's training-data-pipeline
mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.text import token_count


def source_mix(
    df: DataFrame,
    source_column: str = "source",
    lang_column: str = "lang",
    text_column: str = "text",
) -> DataFrame:
    """(source, lang, n_docs, n_tokens, token_share) — token_share is
    this slice's fraction of all corpus tokens, rounded to 6 places
    (single long/long division, engine-reproducible)."""
    per_slice = (
        df.groupBy(
            F.col(source_column).alias("source"), F.col(lang_column).alias("lang")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_column))).alias("n_tokens"),
        )
    )
    total = per_slice.agg(F.sum("n_tokens").alias("__total"))
    return (
        per_slice.join(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("__total"), 6).alias("token_share"),
        )
    )


def cap_per_source(
    df: DataFrame,
    cap: int,
    source_column: str = "source",
    id_column: str = "doc_id",
    *,
    salt: str = "mix",
) -> DataFrame:
    """Keep at most ``cap`` rows per source, chosen by sha2-hash order
    of the salted id (a deterministic shuffle — no rand(), so resuming
    a failed job keeps the identical sample). Output adds ``sample_rank``
    (1-based within source)."""
    order = F.sha2(
        F.concat(F.lit(salt + ":"), F.col(id_column).cast("string")), 256
    )
    w = Window.partitionBy(source_column).orderBy(order, F.col(id_column))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= cap)
    )


def temperature_rates(
    df: DataFrame,
    stratum_column: str = "source",
    *,
    alpha_pct: int = 50,
    target_pct: int = 50,
    buckets: int = 100,
) -> DataFrame:
    """Temperature-flattened mixture rates: per-stratum keep shares
    ∝ share^(alpha_pct/100), normalized so the expected overall keep
    fraction is ``target_pct``/``buckets``. alpha=100 keeps the natural
    mixture; alpha→0 flattens toward uniform (the multilingual-corpus
    "temperature sampling" rule used to stop head languages from
    drowning the tail).

    All arithmetic is deterministic: shares are exact integer-count
    ratios, the power is IEEE ``pow`` of those (both engines correctly
    round pow/sqrt), and the final rate is floored to an integer rate
    out of ``buckets`` with a [1, buckets] clamp. Output:
    (stratum, n_docs, rate_pct) — a tiny broadcast dim consumed by
    :func:`sutro_spark.functions.sampling.stratified_sample`.
    """
    counts = df.groupBy(F.col(stratum_column).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").alias("__total"))
    share = F.col("n_docs") / F.col("__total")
    # alpha=50 (sqrt) gets the IEEE-correctly-rounded sqrt — identical
    # in every engine; general pow(x, a) can differ by 1 ULP across
    # libm implementations (fine for sampling, not for hash parity)
    w = F.sqrt(share) if alpha_pct == 50 else F.pow(share, F.lit(alpha_pct / 100.0))
    # quantize the weight to integer micro-units BEFORE summing: a
    # double Σw depends on partition order (floats don't associate) and
    # would make the floor() boundary nondeterministic; integer sums
    # are exact in any order
    w_int = F.floor(w * F.lit(float(10**12))).cast("long")
    powed = counts.crossJoin(F.broadcast(total)).select(
        "stratum",
        "n_docs",
        w_int.alias("__wi"),
        share.alias("__share"),
    )
    wsum = powed.agg(F.sum("__wi").alias("__wsum"))
    # expected kept fraction = Σ share_i · rate_i/buckets; solve the
    # scale so it hits target_pct/buckets, then clamp each rate
    return (
        powed.crossJoin(F.broadcast(wsum))
        .select(
            "stratum",
            "n_docs",
            F.least(
                F.lit(buckets),
                F.greatest(
                    F.lit(1),
                    F.floor(
                        F.lit(target_pct)
                        * (F.col("__wi").cast("double") / F.col("__wsum"))
                        / F.col("__share")
                    ).cast("int"),
                ),
            ).alias("rate_pct"),
        )
    )


def source_overlap(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    source_column: str = "source",
    k: int = 6,
) -> DataFrame:
    """Cross-source duplication report: for every pair of sources, how
    much k-token n-gram content they share (the evidence behind
    mixture decisions like "crawl B is 40% a re-crawl of A — cap it").

    Output: (src_a, src_b, n_shared bigint, n_a bigint, n_b bigint,
    jaccard double) with src_a < src_b; n_a/n_b are each source's
    distinct-gram counts and jaccard = n_shared/(n_a + n_b - n_shared)
    (one IEEE division, engine-exact).

    Plan (100 TB shape): one pass tokenizes and emits (source, gram
    digest) pairs, deduped by the same groupBy that builds the posting
    list; per digest the source set is a bounded ``collect_set`` (at
    most |sources| elements — corpus scale cannot grow it), and source
    PAIRS explode combinatorially only in |sources|, not in corpus
    size. No gram self-join, no all-pairs over documents.
    """
    from sutro_spark.operators.passages import passage_occurrences

    occ = passage_occurrences(
        df.select(F.col(id_column), F.col(source_column), F.col(text_column)),
        text_column=text_column,
        id_column=id_column,
        k=k,
    )
    src = df.select(F.col(id_column).alias("doc_id"), F.col(source_column).alias("src"))
    grams = (
        occ.where(F.col("dig").isNotNull())
        .join(src, "doc_id")
        .select("src", "dig")
        .distinct()
    )
    per_dig = grams.groupBy("dig").agg(F.array_sort(F.collect_set("src")).alias("srcs"))
    pair_rows = per_dig.where(F.size("srcs") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) ->"
                " transform(slice(srcs, i + 2, size(srcs)),"
                " b -> struct(a AS src_a, b AS src_b))))"
            )
        ).alias("p")
    )
    shared = pair_rows.groupBy(
        F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b")
    ).agg(F.count(F.lit(1)).alias("n_shared"))
    totals = grams.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    return (
        shared.join(totals.select(F.col("src").alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(totals.select(F.col("src").alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def mixture_drift(
    old: DataFrame,
    new: DataFrame,
    stratum_column: str = "source",
) -> DataFrame:
    """Corpus-composition drift between two snapshots: per stratum, the
    chi-squared contribution of the new counts against the expectation
    scaled from the old mixture — the monitoring rule "alert when a
    source's share moves".

    Per-stratum arithmetic only (no cross-row float summation — IEEE
    addition is order-dependent, so a single global chi2 stat would not
    be engine-reproducible; consumers may sum the contributions when
    they do not need cross-engine determinism): expected_new =
    n_old · total_new / total_old (one multiply + one divide),
    contribution = (n_new − expected)² / expected. Strata present in
    only one snapshot appear with a zero count on the other side
    (expected 0 → NULL contribution, flagged by `is_new`/`is_gone`).

    Totals are 1-row aggregates broadcast via cross join — the
    snapshots are scanned once each.
    """
    o = old.groupBy(F.col(stratum_column).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_old")
    )
    n = new.groupBy(F.col(stratum_column).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    to = o.agg(F.sum("n_old").alias("total_old"))
    tn = n.agg(F.sum("n_new").alias("total_new"))
    joined = (
        o.join(n, "stratum", "full")
        .select(
            "stratum",
            F.coalesce(F.col("n_old"), F.lit(0)).cast("long").alias("n_old"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
        )
        .crossJoin(F.broadcast(to))
        .crossJoin(F.broadcast(tn))
    )
    expected = (
        F.col("n_old").cast("double")
        * F.col("total_new").cast("double")
        / F.col("total_old").cast("double")
    )
    return joined.select(
        "stratum",
        "n_old",
        "n_new",
        F.when(F.col("n_old") > 0, expected).alias("expected_new"),
        F.when(
            F.col("n_old") > 0,
            (F.col("n_new").cast("double") - expected)
            * (F.col("n_new").cast("double") - expected)
            / expected,
        ).alias("chi2_contribution"),
        (F.col("n_old") == 0).cast("int").alias("is_new"),
        (F.col("n_new") == 0).cast("int").alias("is_gone"),
    )


def token_budget_allocation(
    df: DataFrame,
    budget: int,
    *,
    source_column: str = "source",
    text_column: str = "text",
    max_epochs_milli: int = 4000,
) -> DataFrame:
    """Per-source token allocation for a fixed training budget — the
    mixture-planning step of a pretraining run (how many tokens, and
    therefore epochs, to draw from each source).

    Target mixture: sqrt-temperature weights (alpha = 0.5, the same
    flattening rule as :func:`temperature_rates`) — w_s =
    floor(1000 * sqrt(avail_s)) milli-units, so tail sources are
    upweighted relative to the natural mixture. The weights are
    INTEGER so their corpus total is an exact associative sum (a
    double total would be row-order-dependent). Allocation:

    1. alloc1_s = min(cap_s, floor(budget * (w_s / W)))  with cap_s =
       avail_s * max_epochs_milli / 1000 tokens — the diminishing-
       returns repeat cap of Muennighoff et al. 2023 ("Scaling
       Data-Constrained Language Models"). Under sqrt flattening the
       cap binds on SMALL sources first (their target share implies
       many epochs), which is exactly the real-world case.
    2. one redistribution pass: tokens freed by capped sources flow to
       the others proportional to remaining headroom. Exact whenever
       the pass does not itself push a source past its cap; any
       remainder left after it means the corpus cannot fill the budget
       under the epoch cap — report, don't loop.

    Determinism: avail/cap/weights are exact integers; each
    proportional split is ``floor(x * (a / b))`` with one IEEE
    division and one multiply — the same literal expression on any
    engine (sqrt is IEEE-correctly-rounded everywhere).

    Output: (source, avail_tokens, cap_tokens, alloc_tokens,
    epochs_milli) — epochs_milli = floor(1000 * alloc/avail).

    Scale: one token-count shuffle on source; everything after runs on
    the per-source table (|sources| rows) with 1-row broadcast totals.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if max_epochs_milli < 1:
        raise ValueError(f"max_epochs_milli must be >= 1, got {max_epochs_milli}")
    per_src = df.groupBy(F.col(source_column).alias("source")).agg(
        F.sum(token_count(F.col(text_column))).alias("avail_tokens")
    )
    cap = per_src.select(
        "source",
        "avail_tokens",
        F.expr(f"avail_tokens * {max_epochs_milli} div 1000").alias("cap_tokens"),
        F.floor(F.sqrt(F.col("avail_tokens").cast("double")) * 1000)
        .cast("long")
        .alias("w_milli"),
    )
    total = cap.agg(F.sum("w_milli").alias("__w_total"))
    first = cap.join(F.broadcast(total)).select(
        "source",
        "avail_tokens",
        "cap_tokens",
        F.least(
            F.col("cap_tokens"),
            F.floor(
                F.lit(float(budget))
                * (F.col("w_milli").cast("double") / F.col("__w_total"))
            ).cast("long"),
        ).alias("alloc1"),
    )
    pools = first.agg(
        (F.lit(budget) - F.sum("alloc1")).alias("__leftover"),
        F.sum(F.col("cap_tokens") - F.col("alloc1")).alias("__headroom"),
    )
    alloc = F.least(
        F.col("cap_tokens"),
        F.col("alloc1")
        + F.when(
            (F.col("__headroom") > 0) & (F.col("__leftover") > 0),
            F.floor(
                F.col("__leftover").cast("double")
                * (
                    (F.col("cap_tokens") - F.col("alloc1")).cast("double")
                    / F.col("__headroom")
                )
            ).cast("long"),
        ).otherwise(F.lit(0)),
    )
    return first.join(F.broadcast(pools)).select(
        "source",
        "avail_tokens",
        "cap_tokens",
        alloc.alias("alloc_tokens"),
        F.when(
            F.col("avail_tokens") > 0,
            F.floor(
                F.lit(1000.0) * (alloc.cast("double") / F.col("avail_tokens"))
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("epochs_milli"),
    )
