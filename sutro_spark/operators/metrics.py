"""Classification evaluation metrics over prediction tables.

Completes the evals family next to operators/elo.py (reference ships
classify/score/rank templates — /root/reference/sutro/templates/
evals.py — but leaves metric computation to the caller; a 100-TB
pipeline needs it as an engine op).

Relational all the way down: two map-side-combinable groupBys (by
gold label, by predicted label) joined on the class — never a
per-class scan. Float parity discipline: precision/recall/F1 are each
ONE division of exact integer counts (F1 via 2·tp/(support+predicted),
algebraically identical to the harmonic mean but engine-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_column: str = "label", pred_column: str = "pred"
) -> DataFrame:
    """(label, pred, n) cell counts — one shuffle on the class pair."""
    return df.groupBy(
        F.col(label_column).alias("label"), F.col(pred_column).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))


def classification_report(
    df: DataFrame, label_column: str = "label", pred_column: str = "pred"
) -> DataFrame:
    """Per-class (cls, support, predicted, tp, fp, fn, precision,
    recall, f1). Classes seen only in predictions (or only in gold)
    appear with zero-coalesced counts; undefined ratios are null.
    """
    hit = F.when(F.col(pred_column) == F.col(label_column), 1).otherwise(0)
    by_label = df.groupBy(F.col(label_column).alias("cls")).agg(
        F.count(F.lit(1)).alias("support"), F.sum(hit).alias("tp")
    )
    by_pred = df.groupBy(F.col(pred_column).alias("cls")).agg(
        F.count(F.lit(1)).alias("predicted")
    )
    j = (
        by_label.join(by_pred, "cls", "full")
        .select(
            "cls",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
        .withColumn("fp", F.col("predicted") - F.col("tp"))
        .withColumn("fn", F.col("support") - F.col("tp"))
    )
    div = lambda num, den: F.when(den != 0, num.cast("double") / den)  # noqa: E731
    return (
        j.withColumn("precision", div(F.col("tp"), F.col("predicted")))
        .withColumn("recall", div(F.col("tp"), F.col("support")))
        .withColumn(
            "f1", div(2 * F.col("tp"), F.col("support") + F.col("predicted"))
        )
    )


def accuracy(
    df: DataFrame, label_column: str = "label", pred_column: str = "pred"
) -> DataFrame:
    """One-row (n, correct, accuracy) — exact single division."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(pred_column) == F.col(label_column), 1).otherwise(0)
        ).alias("correct"),
    ).select(
        "n",
        "correct",
        (F.col("correct").cast("double") / F.col("n")).alias("accuracy"),
    )


def cohens_kappa(
    df: DataFrame, label_column: str = "label", pred_column: str = "pred"
) -> DataFrame:
    """One-row chance-corrected agreement: Cohen's κ between the gold
    and predicted labelings.

    κ = (pₒ − pₑ)/(1 − pₑ) is computed as ONE double division of exact
    integers — (n·correct − Σ_c support_c·predicted_c) /
    (n² − Σ_c support_c·predicted_c) — algebraically identical to the
    textbook form but with no intermediate float rounding, so
    independent engines agree bit-for-bit. Exact while n < ~3e9 (n²
    must fit a BIGINT); beyond that switch the counts to DECIMAL.

    Perfect chance agreement (pₑ = 1, denominator 0) yields null.
    """
    hit = F.when(F.col(pred_column) == F.col(label_column), 1).otherwise(0)
    by_label = df.groupBy(F.col(label_column).alias("cls")).agg(
        F.count(F.lit(1)).alias("support")
    )
    by_pred = df.groupBy(F.col(pred_column).alias("cls")).agg(
        F.count(F.lit(1)).alias("predicted")
    )
    chance = (
        by_label.join(by_pred, "cls", "full")
        .select(
            (
                F.coalesce("support", F.lit(0))
                * F.coalesce("predicted", F.lit(0))
            ).alias("prod")
        )
        .agg(F.sum("prod").alias("chance_pairs"))
    )
    totals = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(hit).alias("correct")
    )
    num = F.col("n") * F.col("correct") - F.col("chance_pairs")
    den = F.col("n") * F.col("n") - F.col("chance_pairs")
    return totals.crossJoin(F.broadcast(chance)).select(
        "n",
        "correct",
        "chance_pairs",
        F.when(den != 0, num.cast("double") / den).alias("kappa"),
    )


def rank_metrics(
    truth: DataFrame,
    ranked: DataFrame,
    *,
    query_key: str = "query_id",
    item_key: str = "neighbor_id",
    rank_column: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Ranked-retrieval quality of an ANN path: MRR@k and hit@k against
    an exact ground-truth pair set (brute-force top-k, labeled qrels).

    `candidate_recall` treats the candidate set as unordered; this is
    the ORDERED complement — it scores how early the first true
    neighbor appears, which is what a retrieval-augmented training
    pipeline actually pays for (rank 1 vs rank 10 is a 10x context
    budget difference even at identical recall).

    Float parity discipline: reciprocal ranks are summed as exact
    integers scaled by L = lcm(1..k) (L/rank is integral for every
    rank <= k), so MRR = sum / (L * n_queries) is ONE IEEE division of
    exact integers — bit-identical across engines. The bound is
    k <= 25: L = lcm(1..25) ≈ 2.68e10, so the scaled sum stays inside
    a signed BIGINT up to ~3.4e8 queries all hitting rank 1 (and the
    mrr denominator L·n_queries up to the same count). k = 42 would
    keep L itself integral but lets ~43 rank-1 queries silently wrap
    the sum in non-ANSI Spark — the reason the looser bound was
    rejected. Need deeper k? Re-derive the safe query count as
    2^63 / lcm(1..k) before loosening this check.

    Queries come from the TRUTH side: a truth query with no ranked hit
    contributes 0 to both metrics (never silently dropped).

    Plan: distinct truth pairs -> equi-join on (query, item) against
    the rank<=k slice -> per-query min-rank groupBy -> right join onto
    the distinct truth queries -> one global aggregate. Linear in the
    pair counts, no collects.
    """
    if not 1 <= k <= 25:
        raise ValueError(
            "k must be in [1, 25]: lcm(1..k) scaling keeps the reciprocal-rank "
            "sum exact only while lcm * n_queries fits a BIGINT (k=25 is safe "
            "to ~3.4e8 queries; larger k silently wraps at realistic counts)"
        )
    lcm = 1
    for i in range(2, k + 1):
        g, a = lcm, i
        while a:
            g, a = a, g % a
        lcm = lcm * i // g
    t = truth.select(query_key, item_key).distinct()
    r = ranked.select(query_key, item_key, rank_column).where(F.col(rank_column) <= k)
    first = (
        t.join(r, [query_key, item_key])
        .groupBy(query_key)
        .agg(F.min(rank_column).cast("long").alias("first_rank"))
    )
    per_query = t.select(query_key).distinct().join(first, query_key, "left")
    scaled = per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("first_rank").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
        F.sum(
            F.when(
                F.col("first_rank").isNotNull(),
                F.expr(f"CAST({lcm} AS BIGINT) div first_rank"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rr_scaled"),
    )
    return scaled.select(
        "n_queries",
        "n_hit",
        F.when(
            F.col("n_queries") > 0,
            F.col("n_hit").cast("double") / F.col("n_queries"),
        ).alias("hit_rate"),
        F.when(
            F.col("n_queries") > 0,
            F.col("rr_scaled").cast("double") / (F.lit(lcm) * F.col("n_queries")),
        ).alias("mrr"),
    )


def calibration_bins(
    df: DataFrame,
    *,
    label_column: str = "label",
    pred_column: str = "pred",
    conf_column: str = "conf_milli",
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram over integer-milli confidences (0..1000).

    Confidence arrives pre-quantized to integer thousandths (the same
    discipline as the integer-cents money columns elsewhere in this
    repo): per-bin accuracy and mean confidence are then each ONE IEEE
    division of exact integer sums, so independent engines agree
    bit-for-bit — a float-confidence reliability diagram never does.

    bin = conf_milli * bins div 1000, clamped into [0, bins−1] on BOTH
    sides (greatest + least) so conf 1000 lands in the top bin and an
    out-of-range confidence can never mint a phantom negative bin.
    Rows with a NULL confidence are FILTERED OUT up front rather than
    binned: Spark's least() skips NULLs, so before this guard a NULL
    conf landed in the top bin while contributing nothing to conf_sum,
    silently skewing that bin's avg_conf — per the pre-quantized
    discipline, a row without a confidence has no place in a
    reliability diagram (callers who want them counted must impute
    explicitly). Output per bin: (bin, n, correct, conf_sum, accuracy,
    avg_conf, gap_scaled) where gap_scaled = |1000*correct − conf_sum|
    is the exact integer numerator of n·|acc − conf| — summing it and
    dividing once by 1000·N is the ECE (see `calibration_ece`).

    One map-side-combinable groupBy on <= `bins` keys — constant
    state, mergeable across partitions, batches, or days.
    """
    hit = F.when(F.col(pred_column) == F.col(label_column), 1).otherwise(0)
    df = df.where(F.col(conf_column).isNotNull())
    b = F.greatest(
        F.least(
            F.expr(f"({conf_column} * {bins}) div 1000").cast("long"),
            F.lit(bins - 1).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    g = df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(hit).cast("long").alias("correct"),
        F.sum(conf_column).cast("long").alias("conf_sum"),
    )
    return g.select(
        "bin",
        "n",
        "correct",
        "conf_sum",
        (F.col("correct").cast("double") / F.col("n")).alias("accuracy"),
        (F.col("conf_sum").cast("double") / (F.lit(1000) * F.col("n"))).alias(
            "avg_conf"
        ),
        F.abs(F.lit(1000) * F.col("correct") - F.col("conf_sum"))
        .cast("long")
        .alias("gap_scaled"),
    )


def calibration_ece(
    df: DataFrame,
    *,
    label_column: str = "label",
    pred_column: str = "pred",
    conf_column: str = "conf_milli",
    bins: int = 10,
) -> DataFrame:
    """One-row expected calibration error over the same integer bins.

    ECE = Σ_b (n_b/N)·|acc_b − conf_b| collapses algebraically to
    Σ_b |1000·correct_b − conf_sum_b| / (1000·N): the numerator is an
    exact integer sum over <= `bins` rows, the division happens ONCE —
    no per-bin float ratios are ever added together.
    """
    g = calibration_bins(
        df,
        label_column=label_column,
        pred_column=pred_column,
        conf_column=conf_column,
        bins=bins,
    )
    return g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("gap_scaled").cast("long").alias("gap_total"),
    ).select(
        "n",
        "gap_total",
        F.when(
            F.col("n") > 0,
            F.col("gap_total").cast("double") / (F.lit(1000) * F.col("n")),
        ).alias("ece"),
    )


def candidate_recall(
    truth: DataFrame,
    candidates: DataFrame,
    keys: list[str] | tuple[str, ...] = ("id_a", "id_b"),
) -> DataFrame:
    """Recall/precision of a candidate-generation stage against an
    exact ground truth — the honesty metric for every approximate path
    in this repo (LSH bands vs exact Jaccard, IVF probes vs brute
    force, SimHash blocking vs full Hamming).

    Both inputs are key sets (extra columns ignored); the report is ONE
    row: (n_truth, n_cand, n_hit, recall, precision) with recall =
    hit/truth and precision = hit/cand as single IEEE divisions (NULL
    when the denominator is 0, rather than a fake 0.0 or 1.0).

    Plan: distinct each side, one full-outer equi-join on the keys,
    one global aggregate — no collects, linear in the pair counts.
    """
    ks = list(keys)
    t = truth.select(*ks).distinct().withColumn("__t", F.lit(1))
    c = candidates.select(*ks).distinct().withColumn("__c", F.lit(1))
    j = t.join(c, ks, "full")
    agg = j.agg(
        F.sum(F.coalesce(F.col("__t"), F.lit(0))).cast("long").alias("n_truth"),
        F.sum(F.coalesce(F.col("__c"), F.lit(0))).cast("long").alias("n_cand"),
        F.sum(
            F.when(F.col("__t").isNotNull() & F.col("__c").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_truth",
        "n_cand",
        "n_hit",
        F.when(
            F.col("n_truth") > 0, F.col("n_hit").cast("double") / F.col("n_truth")
        ).alias("recall"),
        F.when(
            F.col("n_cand") > 0, F.col("n_hit").cast("double") / F.col("n_cand")
        ).alias("precision"),
    )


def precision_threshold(
    scored: DataFrame,
    *,
    score_column: str = "score",
    label_column: str = "label",
    target_milli: int = 900,
) -> DataFrame:
    """Smallest score cutoff whose keep-set precision meets a target —
    the tuner for every "keep documents scoring above X" curation
    gate: run the trainable scorer (or an LLM judge) over a labeled
    holdout, then pick the least-strict threshold that still
    delivers, say, 90% precision. Less strict than necessary wastes
    precision; stricter wastes recall.

    Semantics: candidate cutoffs are the distinct scores; "keep" means
    score >= cutoff. For each cutoff the keep-set precision is
    cum_tp / cum_n over the rows at-or-above it; the chosen row is
    the SMALLEST cutoff with 1000 * cum_tp >= target_milli * cum_n —
    a pure integer comparison (the division never happens, so there
    is nothing to drift cross-engine). If no cutoff qualifies, the
    output is empty (no silent fallback — an unreachable target
    should fail loudly in the pipeline, not quietly keep nothing).

    Plan: one (score, n, tp) aggregate — map-side combinable, shuffle
    is |distinct scores| rows — then a running sum over scores
    descending (single ordered pass over the distinct-score table,
    NOT the corpus) and a 1-row min. Labels are booleans/0-1 ints.

    ``score_column`` must hold INTEGRAL scores (the repo's
    milli-scaled convention — scale 0-1 float probabilities to e.g.
    round(p*1000) first). A fractional score raises at execution
    rather than silently truncating every probability to 0.

    Output: one row (threshold, kept_n, kept_tp, precision_milli,
    total_n, total_tp) — precision_milli = (1000*cum_tp) div cum_n of
    the chosen cutoff, recall derivable as kept_tp/total_tp.
    """
    if not 0 < target_milli <= 1000:
        raise ValueError("target_milli must be in (0, 1000]")
    # Scores must already be integral (the repo's milli-scaled-integer
    # convention, e.g. quality_scorer's score_milli): a raw 0-1 float
    # probability would silently truncate to 0 under cast("long"),
    # collapsing every cutoff into one. Guard in-plan via raise_error —
    # no extra validation job, fails loudly at execution time.
    integral_s = F.expr(
        f"CASE WHEN {score_column} IS NULL THEN CAST(NULL AS BIGINT) "
        f"WHEN {score_column} = CAST({score_column} AS BIGINT) "
        f"THEN CAST({score_column} AS BIGINT) "
        "ELSE CAST(raise_error('precision_threshold: score_column must "
        "hold integral (milli-scaled) scores; got a fractional value — "
        "scale float probabilities to integers first') AS BIGINT) END"
    )
    agg = (
        scored.select(
            integral_s.alias("s"),
            F.col(label_column).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("tp"),
        )
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    cum = agg.select(
        "s",
        F.sum("n").over(w).cast("long").alias("cum_n"),
        F.sum("tp").over(w).cast("long").alias("cum_tp"),
    )
    totals = agg.agg(
        F.sum("n").cast("long").alias("total_n"),
        F.sum("tp").cast("long").alias("total_tp"),
    )
    ok = cum.where(
        F.lit(1000) * F.col("cum_tp") >= F.lit(target_milli) * F.col("cum_n")
    )
    best = ok.orderBy(F.asc("s")).limit(1)
    return best.crossJoin(F.broadcast(totals)).select(
        F.col("s").alias("threshold"),
        F.col("cum_n").alias("kept_n"),
        F.col("cum_tp").alias("kept_tp"),
        F.expr("CAST((1000 * cum_tp) div cum_n AS BIGINT)").alias(
            "precision_milli"
        ),
        "total_n",
        "total_tp",
    )


def fleiss_kappa(
    labels: DataFrame,
    *,
    item_column: str = "item",
    rater_column: str = "rater",
    category_column: str = "category",
) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement for ANY number of
    raters (Cohen's kappa — `cohens_kappa` — handles exactly two).
    The multi-annotator eval staple: three LLM judges labeling the
    same docs, crowdworker triplets, model ensembles.

    Exact-rational construction: with N conforming items, n raters
    per item, n_ic the raters assigning item i to category c, and
    T_c the per-category totals,

        P_bar  = (S2 - N*n) / (N*n*(n-1)),  S2 = sum n_ic^2
        P_e    = sum T_c^2 / (N*n)^2
        kappa  = (P_bar - P_e) / (1 - P_e)
               = (a*d - c*b) / (b * (d - c))          -- ONE division
          with a = S2 - N*n, b = N*n*(n-1), c = sum T_c^2, d = (N*n)^2

    every term an exact BIGINT, so the sole IEEE division is
    engine-reproducible. Overflow bound: d = (N*n)^2 and a*d must
    stay < 2^63 — safe while N*n < ~3e9 rater-item pairs, i.e. any
    human-annotated set and most judge ensembles; sample first
    beyond that.

    Fleiss requires a COMMON n: n is taken as the most frequent
    per-item rater count (ties -> larger n), items with any other
    count are excluded and reported in ``n_items_excluded`` rather
    than silently skewing the statistic. Duplicate (item, rater)
    votes count as distinct ratings (last-write-wins dedup is the
    caller's policy decision, not this metric's).

    Plan: one (item, category) count -> per-item sum-of-squares
    (combinable aggregates), category totals over conforming items,
    three 1-row frames crossed at the end. Output: one row (n_items,
    n_raters, n_categories, n_items_excluded, kappa double).
    """
    cells = (
        labels.select(
            F.col(item_column).alias("__i"),
            F.col(rater_column).alias("__r"),
            F.col(category_column).cast("string").alias("__c"),
        )
        .groupBy("__i", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("nic"))
    )
    per_item = cells.groupBy("__i").agg(
        F.sum("nic").cast("long").alias("n_i"),
        F.sum(F.col("nic") * F.col("nic")).cast("long").alias("s2_i"),
    )
    # modal rater count = the common n (ties -> larger n)
    mode = (
        per_item.groupBy("n_i")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.desc("n_i"))
        .limit(1)
        .select(F.col("n_i").alias("n"))
    )
    conforming = per_item.join(F.broadcast(mode), per_item["n_i"] == F.col("n"))
    excluded = per_item.join(F.broadcast(mode), per_item["n_i"] == F.col("n"), "left_anti")
    agg1 = conforming.agg(
        F.count(F.lit(1)).cast("long").alias("ni_"),
        F.sum("s2_i").cast("long").alias("S2"),
        F.max("n_i").cast("long").alias("nr_"),
    )
    tot = (
        cells.join(
            F.broadcast(conforming.select(F.col("__i"))), "__i"
        )
        .groupBy("__c")
        .agg(F.sum("nic").cast("long").alias("Tc"))
    )
    agg2 = tot.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum(F.col("Tc") * F.col("Tc")).cast("long").alias("C"),
    )
    nex = excluded.agg(F.count(F.lit(1)).cast("long").alias("n_items_excluded"))
    return (
        agg1.crossJoin(agg2)
        .crossJoin(nex)
        .select(
            F.col("ni_").alias("n_items"),
            F.col("nr_").alias("n_raters"),
            "n_categories",
            "n_items_excluded",
            F.expr(
                "CASE WHEN ni_ = 0 OR nr_ < 2"
                " OR (ni_*nr_)*(ni_*nr_) = C THEN NULL ELSE "
                "CAST((S2 - ni_*nr_) * (ni_*nr_)*(ni_*nr_)"
                " - C * (ni_*nr_*(nr_-1)) AS DOUBLE)"
                " / CAST((ni_*nr_*(nr_-1))"
                " * ((ni_*nr_)*(ni_*nr_) - C) AS DOUBLE) END"
            ).alias("kappa"),
        )
    )


def krippendorff_alpha(
    labels: DataFrame,
    *,
    item_column: str = "item",
    rater_column: str = "rater",
    category_column: str = "category",
    max_raters: int = 10,
) -> DataFrame:
    """Krippendorff's alpha (nominal data): chance-corrected
    agreement that — unlike Fleiss' kappa (`fleiss_kappa`), which
    excludes items off the modal rater count — USES every item with
    >= 2 ratings, whatever its rater count. That is the realistic
    annotation shape: crowdworkers drop out, judge ensembles time
    out, some docs get 2 votes and some get 5. Alpha is the standard
    reliability statistic for exactly that missing-data case
    (Krippendorff 2004, ch. 11).

    Construction (nominal distance): with n_ic raters placing item i
    in category c, m_i = sum_c n_ic (items with m_i < 2 are
    unpairable — excluded and counted), n = sum m_i, T_c the
    category totals over pairable items:

        D_o = (1/n) * sum_i [ sum_c n_ic*(m_i - n_ic) / (m_i - 1) ]
        D_e = sum_c T_c*(n - T_c) / (n*(n-1))
        alpha = 1 - D_o / D_e = 1 - S*(n-1) / (L*E)

    where the per-item fractions are made EXACT by scaling with the
    fixed L = lcm(1..9) = 2520 (covers m_i <= 10):
    S = sum_i A_i * (L div (m_i-1)), A_i = sum_c n_ic*(m_i - n_ic),
    E = sum_c T_c*(n - T_c). The sole IEEE division
    (L*E - S*(n-1)) / (L*E) is over exact BIGINTs —
    engine-reproducible, the `fleiss_kappa` idiom.

    An item with more than ``max_raters`` ratings raises in-plan
    (raise_error — no silent wrong L); raise the parameter only up
    to 10 (L is fixed at lcm(1..9)). Overflow: S*(n-1) <~
    2520*max_raters*n^2 must stay < 2^63 — safe to ~10M rater-votes;
    alpha is an item-sampled statistic, so sample items beyond that.

    Plan: one (item, category) count, two combinable per-item aggs,
    category totals over pairable items, 1-row frames crossed at the
    end — no shuffle larger than |items| x |categories|.

    Output: one row (n_items, n_values, n_categories,
    n_items_excluded, s_scaled, e_sum, alpha) — alpha NULL when
    degenerate (n < 2 pairable values, or every value in one
    category: D_e = 0).
    """
    if not 2 <= max_raters <= 10:
        raise ValueError("max_raters must be in [2, 10] (L is lcm(1..9))")
    lcm = 2520  # lcm(1..9): exact per-item scaling for m_i - 1 <= 9
    cells = (
        labels.select(
            F.col(item_column).alias("__i"),
            F.col(rater_column).alias("__r"),
            F.col(category_column).cast("string").alias("__c"),
        )
        # one vote per rater per item: replayed identical votes count
        # once (a rater genuinely re-coding an item into a SECOND
        # category still contributes both rows — that is real
        # disagreement data, not a duplicate)
        .distinct()
        .groupBy("__i", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("nic"))
    )
    per_item = cells.groupBy("__i").agg(
        F.sum("nic").cast("long").alias("m_i"),
        F.sum(F.col("nic") * F.col("nic")).cast("long").alias("s2_i"),
    )
    guarded = per_item.select(
        "__i",
        F.expr(
            f"CASE WHEN m_i <= {max_raters} THEN m_i ELSE "
            "CAST(raise_error('krippendorff_alpha: an item has more "
            f"ratings than max_raters={max_raters}; dedupe votes or "
            "raise max_raters (<= 10)') AS BIGINT) END"
        ).alias("m_i"),
        # A_i = sum_c n_ic*(m_i - n_ic) = m_i^2 - sum_c n_ic^2
        (F.col("m_i") * F.col("m_i") - F.col("s2_i")).alias("a_i"),
    )
    pairable = guarded.where(F.col("m_i") >= 2)
    nex = guarded.where(F.col("m_i") < 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_items_excluded")
    )
    agg1 = pairable.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(F.sum("m_i"), F.lit(0)).cast("long").alias("n_values"),
        F.coalesce(
            F.sum(F.col("a_i") * F.expr(f"CAST({lcm} div (m_i - 1) AS BIGINT)")),
            F.lit(0),
        )
        .cast("long")
        .alias("s_scaled"),
    )
    tot = (
        cells.join(F.broadcast(pairable.select("__i")), "__i")
        .groupBy("__c")
        .agg(F.sum("nic").cast("long").alias("tc"))
    )
    agg2 = tot.crossJoin(F.broadcast(agg1.select("n_values"))).agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.coalesce(
            F.sum(F.col("tc") * (F.col("n_values") - F.col("tc"))), F.lit(0)
        )
        .cast("long")
        .alias("e_sum"),
    )
    return (
        agg1.crossJoin(agg2)
        .crossJoin(nex)
        .select(
            "n_items",
            "n_values",
            "n_categories",
            "n_items_excluded",
            "s_scaled",
            "e_sum",
            F.expr(
                "CASE WHEN n_values < 2 OR e_sum = 0 THEN NULL ELSE "
                f"CAST({lcm} * e_sum - s_scaled * (n_values - 1) AS DOUBLE)"
                f" / CAST({lcm} * e_sum AS DOUBLE) END"
            ).alias("alpha"),
        )
    )


def average_precision(
    truth: DataFrame,
    ranked: DataFrame,
    *,
    query_key: str = "query_id",
    item_key: str = "neighbor_id",
    rank_column: str = "rank",
    k: int = 10,
) -> DataFrame:
    """MAP@k — mean average precision of ranked lists against exact
    truth sets, the whole-list complement of `rank_metrics` (MRR sees
    only the FIRST hit; AP rewards every relevant item by how early
    it appears, which is what a retrieval stage feeding multiple
    context slots actually buys).

    Exact-integer discipline (the `rank_metrics` lcm idiom): at each
    hit position p, precision@p = hits_so_far/p is accumulated as
    hits_so_far * (L div p) with L = lcm(1..k) — integral for every
    p <= k — so per-query AP = ap_scaled / (L * min(R, k)) needs ONE
    floor division, quantized to micro units; MAP quantizes the
    per-query micros to milli with one more floor division. Each
    quantization is a documented <=1-unit truncation — a gate
    thresholding on MAP cannot feel it, and both engines floor
    identically. Bound: k <= 25 keeps 10^6 * k * lcm(1..k) < 2^63.

    Ranks must be unique per query (ranked lists, not scores); ties
    would double-count hits_so_far. A duplicated (query, item) is
    collapsed to its best rank before the truth join (each relevant
    item can score at most once). Queries come from the TRUTH side;
    a query with no ranked hits contributes AP = 0, never silently
    drops.

    Plan: one (query, item) equi-join, one bounded window over <= k
    hit rows per query, two combinable aggregates. No collects.

    Output: one row (n_queries, n_hit_queries, map_milli bigint,
    mean_ap double — sum(ap_micro)/(1e6*n), a single IEEE division).
    """
    if not 1 <= k <= 25:
        raise ValueError(
            "k must be in [1, 25]: the lcm(1..k) scaling overflows a BIGINT "
            "at realistic query counts beyond that (same bound as rank_metrics)"
        )
    lcm = 1
    for i in range(2, k + 1):
        g, a = lcm, i
        while a:
            g, a = a, g % a
        lcm = lcm * i // g
    t = truth.select(query_key, item_key).distinct()
    rel = t.groupBy(query_key).agg(F.count(F.lit(1)).cast("long").alias("__R"))
    # one row per (query, item): an item ranked at several positions
    # <= k scores only its BEST rank (else every occurrence would join
    # the truth row and double-count hits_so_far)
    r = (
        ranked.select(query_key, item_key, rank_column)
        .where(F.col(rank_column) <= k)
        .groupBy(query_key, item_key)
        .agg(F.min(rank_column).alias(rank_column))
    )
    hits = t.join(r, [query_key, item_key]).select(
        query_key, F.col(rank_column).cast("long").alias("__p")
    )
    w = (
        Window.partitionBy(query_key)
        .orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    contrib = hits.withColumn(
        "__h", F.count(F.lit(1)).over(w).cast("long")
    ).groupBy(query_key).agg(
        F.sum(F.expr(f"__h * ({lcm} div __p)")).cast("long").alias("__ap_scaled")
    )
    per_q = (
        rel.join(contrib, query_key, "left")
        .select(
            F.col("__R"),
            F.coalesce(F.col("__ap_scaled"), F.lit(0)).alias("__s"),
        )
        .select(
            F.expr(
                f"CAST((1000000 * __s) div ({lcm} * least(__R, {k})) AS BIGINT)"
            ).alias("__ap_micro"),
            (F.col("__s") > 0).cast("int").alias("__hit"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("__hit").cast("long").alias("n_hit_queries"),
        F.coalesce(F.sum("__ap_micro"), F.lit(0)).alias("__sum_micro"),
    ).select(
        "n_queries",
        "n_hit_queries",
        F.expr(
            "CASE WHEN n_queries > 0 THEN"
            " CAST(__sum_micro div (1000 * n_queries) AS BIGINT) END"
        ).alias("map_milli"),
        F.expr(
            "CASE WHEN n_queries > 0 THEN"
            " CAST(__sum_micro AS DOUBLE)"
            " / CAST(1000000 * n_queries AS DOUBLE) END"
        ).alias("mean_ap"),
    )


def _pass_envelope_max_n(k: int) -> int:
    """Largest n with (n)_k * 10**6 < 10**38 — the exact DECIMAL(38,0)
    envelope INCLUDING the pass_micro scaling (the micro column
    multiplies the falling factorial by 10**6 before the integral
    division, so its bound is 10**6 tighter than the bare (n)_k <
    10**38 product bound; enforcing the tighter one means neither
    column can silently null out)."""
    limit = 10**32  # (n)_k < 10**32  <=>  10**6 * (n)_k < 10**38

    def ff(n: int) -> int:
        p = 1
        for i in range(k):
            p *= n - i
        return p

    lo, hi = k, 10**32
    while lo < hi:  # largest n with ff(n) < limit
        mid = (lo + hi + 1) // 2
        if ff(mid) < limit:
            lo = mid
        else:
            hi = mid - 1
    return min(lo, 2**62)


def _per_problem(
    samples: DataFrame, problem_column: str, correct_column: str
) -> DataFrame:
    """Unfiltered per-problem tallies: (problem, n, c) — one
    map-side-combinable groupBy over the samples."""
    return samples.groupBy(F.col(problem_column).alias("problem")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(correct_column).cast("int")).cast("long").alias("c"),
    )


def _with_pass(per: DataFrame, k: int) -> DataFrame:
    """Attach the exact pass columns to a (problem, n, c) frame:
    (problem, n, c, k, pass_micro, pass_at_k) — NULL pass columns when
    n < k (callers either pre-filter or aggregate conditionally).
    Rows with n beyond the DECIMAL(38,0) envelope raise at runtime
    (``raise_error`` inside the lazy CASE branch — non-ANSI Spark
    would otherwise return NULL silently)."""
    n_max = _pass_envelope_max_n(k)
    guarded = per.withColumn(
        "n",
        F.when(F.col("n") <= F.lit(n_max), F.col("n")).otherwise(
            F.expr(
                "CAST(raise_error(concat('pass_at_k: n = ',"
                " CAST(n AS STRING),"
                f" ' exceeds the exact DECIMAL(38,0) envelope for k = {k}"
                f" (max n {n_max}); subsample per problem first'))"
                " AS BIGINT)"
            )
        ),
    )
    num = F.expr(
        f"aggregate(sequence(0, {k - 1}),"
        f" CAST(1 AS DECIMAL(38, 0)),"
        f" (acc, i) -> CAST(acc * greatest(n - c - i, 0) AS DECIMAL(38, 0)))"
    )
    den = F.expr(
        f"aggregate(sequence(0, {k - 1}),"
        f" CAST(1 AS DECIMAL(38, 0)),"
        f" (acc, i) -> CAST(acc * (n - i) AS DECIMAL(38, 0)))"
    )
    return guarded.select(
        "problem",
        "n",
        "c",
        F.lit(k).cast("long").alias("k"),
        F.when(F.col("n") >= k, num).alias("__num"),
        F.when(F.col("n") >= k, den).alias("__den"),
    ).select(
        "problem",
        "n",
        "c",
        "k",
        # exact integer micro first (floor(1e6*num/den) — integral div
        # on exact decimals, engine-reproducible and SUMMABLE without
        # float-order sensitivity), then the one-division double
        F.expr("CAST(1000000 - (1000000 * __num) div __den AS BIGINT)").alias(
            "pass_micro"
        ),
        (
            F.lit(1.0) - F.col("__num").cast("double") / F.col("__den").cast("double")
        ).alias("pass_at_k"),
    )


def pass_at_k(
    samples: DataFrame,
    *,
    problem_column: str = "problem_id",
    correct_column: str = "correct",
    k: int = 5,
) -> DataFrame:
    """pass@k, the unbiased estimator of Chen et al. 2021 (Codex,
    arXiv:2107.03374 eq. 1): with n samples per problem of which c are
    correct,

        pass@k = 1 - C(n-c, k) / C(n, k)
               = 1 - (n-c)_k / (n)_k      (falling factorials)

    computed per problem then averaged. The eval staple for
    sample-based LLM benchmarks (HumanEval, MBPP, MATH) — the naive
    empirical fraction is biased; this is the exact hypergeometric
    complement.

    Exactness discipline: both falling factorials are exact
    DECIMAL(38,0) products (one ``aggregate`` fold over
    ``sequence(0, k-1)`` — no Python), so the per-problem ratio is ONE
    IEEE division of two exactly-represented integers and the mean is
    one more division — engine-reproducible bit-for-bit. Bound
    (ENFORCED at runtime, not just documented): the micro column forms
    10^6 * (n)_k, so the envelope is (n)_k < 10^32 — k=5 at
    n <= ~2.5M, k=10 at n <= ~1580, k=16 at n <= ~104; a problem
    whose n exceeds it raises loudly (``raise_error``) instead of the
    silent NULL a non-ANSI decimal overflow would produce — subsample
    per problem first. When n - c < k, C(n-c, k) = 0 and pass@k is
    exactly 1.

    Output: one row per problem (problem, n, c, k, pass_at_k) plus the
    corpus mean is left to the caller (it's one avg) — see
    ``pass_at_k_summary`` for the aggregated verdict (which also
    surfaces how many problems were dropped for having n < k).
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    per = _per_problem(samples, problem_column, correct_column).where(
        F.col("n") >= k
    )
    return _with_pass(per, k)


def pass_at_k_summary(
    samples: DataFrame,
    *,
    problem_column: str = "problem_id",
    correct_column: str = "correct",
    k: int = 5,
) -> DataFrame:
    """Corpus verdict over :func:`pass_at_k`: problem count, mean
    pass@k, the count of saturated (pass@k = 1) problems, AND
    ``n_dropped`` — how many problems were excluded for having fewer
    than k samples (the estimator is undefined there; reporting the
    mean without the exclusion count would silently narrow the
    universe — the repo's no-silent-caps rule). The mean sums the
    EXACT integer micros (float summation order is not
    engine-reproducible; integer sums are) and divides once. One row,
    ONE pass over the samples (the dropped problems ride the same
    groupBy as conditional aggregation legs).
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    per = _with_pass(
        _per_problem(samples, problem_column, correct_column), k
    )
    kept = F.col("n") >= k
    return per.agg(
        F.coalesce(F.sum(kept.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_problems"),
        F.lit(k).cast("long").alias("k"),
        F.sum("pass_micro").cast("long").alias("__sum_micro"),
        F.coalesce(
            F.sum((kept & (F.col("c") + F.lit(k) > F.col("n"))).cast("int")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_saturated"),
        F.coalesce(F.sum((~kept).cast("int")), F.lit(0))
        .cast("long")
        .alias("n_dropped"),
    ).select(
        "n_problems",
        "k",
        F.expr(
            "CASE WHEN n_problems > 0 THEN"
            " CAST(__sum_micro div n_problems AS BIGINT) END"
        ).alias("mean_pass_micro"),
        F.expr(
            "CASE WHEN n_problems > 0 THEN"
            " CAST(__sum_micro AS DOUBLE) / CAST(1000000 * n_problems AS DOUBLE)"
            " END"
        ).alias("mean_pass_at_k"),
        "n_saturated",
        "n_dropped",
    )


def _ndcg_discounts(k: int) -> list:
    """The fixed micro-scaled DCG discount table: disc[i] =
    round(10^6 / log2(i + 1)) for rank i = 1..k. Universal constants
    (positions, not data), computed ONCE driver-side and embedded as
    literals in BOTH the Spark plan and the oracle SQL — the log never
    runs inside either engine, so the no-transcendentals discipline
    holds and every DCG term is an exact BIGINT product."""
    import math

    return [round(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg(
    judged: DataFrame,
    ranked: DataFrame,
    *,
    query_key: str = "query_id",
    item_key: str = "item_id",
    grade_column: str = "grade",
    rank_column: str = "rank",
    k: int = 10,
) -> DataFrame:
    """NDCG@k with graded relevance (Järvelin & Kekäläinen 2002) — the
    standard ranked-retrieval metric the binary-relevance pair
    (``rank_metrics`` MRR/hit, ``average_precision``) cannot express:
    a rank-1 grade-3 result must beat a rank-1 grade-1 result.

    Exactness discipline: gains are (2^grade - 1) via ``shiftleft``
    (exact integers, the standard exponential gain), discounts come
    from the fixed micro-scaled table ``_ndcg_discounts`` (literals in
    both engines — see its docstring), so DCG@k and the ideal IDCG@k
    are exact BIGINT sums and both the integer ``ndcg_micro``
    (floor(10^6 * dcg / idcg)) and the double ``ndcg`` are single
    divisions of exactly-represented integers. Bounds (ENFORCED):
    k <= 25 and grade <= 18 — beyond that 10^6 * dcg_micro leaves the
    signed-BIGINT envelope; out-of-range or negative grades
    ``raise_error`` per row instead of silently wrapping (the
    pass_at_k guard discipline).

    Semantics, stated: judged pairs dedup to MAX grade; an item ranked
    at several positions <= k scores only its BEST rank; ranked items
    without a judgment gain 0; judged items never retrieved lower NDCG
    only through IDCG; queries come from the JUDGED side — a query
    with no ranked overlap scores 0, and a query whose judgments are
    all grade 0 has IDCG 0 and NULL ndcg (count them via
    ``ndcg_summary``'s n_zero_ideal rather than dropping silently).

    Output: one row per query (query, dcg_micro, idcg_micro,
    ndcg_micro bigint, ndcg double).
    """
    if not 1 <= k <= 25:
        raise ValueError(f"k must be in [1, 25], got {k}")
    disc = _ndcg_discounts(k)
    g = (
        # NULL grades are judgments that never happened — dropped
        # (keeping them would route NULL through the envelope guard's
        # raise_error message); a pair judged both NULL and graded
        # keeps the grade via the MAX
        judged.where(F.col(grade_column).isNotNull())
        .groupBy(
            F.col(query_key).alias("query"),
            F.col(item_key).alias("item"),
        )
        .agg(F.max(grade_column).cast("long").alias("grade"))
        .withColumn(
            "grade",
            F.when(
                (F.col("grade") >= 0) & (F.col("grade") <= 18),
                F.col("grade"),
            ).otherwise(
                F.expr(
                    "CAST(raise_error(concat('ndcg: grade ',"
                    " CAST(grade AS STRING),"
                    " ' outside [0, 18] — 2^grade gains would leave the"
                    " exact BIGINT envelope')) AS BIGINT)"
                )
            ),
        )
    )
    gain = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(grade AS INT))") - 1
    disc_arr = F.array(*[F.lit(d).cast("long") for d in disc])
    r = (
        ranked.select(
            F.col(query_key).alias("query"),
            F.col(item_key).alias("item"),
            F.col(rank_column).cast("int").alias("rank"),
        )
        .withColumn(
            # ranks are 1-based; a rank < 1 would pass the <= k filter
            # and element_at(disc_arr, rank) silently indexes the
            # discount table from the END (Spark negative-index
            # semantics) — a wrong-but-plausible DCG. raise_error per
            # row instead (the grade-guard discipline); NULL ranks
            # pass through and drop at the <= k filter like NULL
            # grades drop on the judged side.
            "rank",
            F.when(
                F.col("rank").isNull() | (F.col("rank") >= 1),
                F.col("rank"),
            ).otherwise(
                F.expr(
                    "CAST(raise_error(concat('ndcg: rank ',"
                    " CAST(rank AS STRING),"
                    " ' < 1 — ranks are 1-based')) AS INT)"
                )
            ),
        )
        .where(F.col("rank") <= k)
        .groupBy("query", "item")
        .agg(F.min("rank").alias("rank"))
    )
    dcg = (
        g.join(r, ["query", "item"])
        .select(
            "query",
            (gain * F.element_at(disc_arr, F.col("rank"))).alias("__t"),
        )
        .groupBy("query")
        .agg(F.sum("__t").cast("long").alias("dcg_micro"))
    )
    w = Window.partitionBy("query").orderBy(
        F.col("grade").desc(), F.col("item").asc()
    )
    idcg = (
        g.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            "query",
            (gain * F.element_at(disc_arr, F.col("__rn"))).alias("__t"),
        )
        .groupBy("query")
        .agg(F.sum("__t").cast("long").alias("idcg_micro"))
    )
    return (
        g.select("query")
        .distinct()
        .join(dcg, "query", "left")
        .join(idcg, "query", "left")
        .select(
            "query",
            F.coalesce(F.col("dcg_micro"), F.lit(0)).alias("dcg_micro"),
            F.coalesce(F.col("idcg_micro"), F.lit(0)).alias("idcg_micro"),
        )
        .select(
            "query",
            "dcg_micro",
            "idcg_micro",
            F.expr(
                "CASE WHEN idcg_micro > 0 THEN"
                " CAST((1000000 * dcg_micro) div idcg_micro AS BIGINT) END"
            ).alias("ndcg_micro"),
            F.expr(
                "CASE WHEN idcg_micro > 0 THEN"
                " CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE)"
                " END"
            ).alias("ndcg"),
        )
    )


def ndcg_summary(
    judged: DataFrame,
    ranked: DataFrame,
    *,
    query_key: str = "query_id",
    item_key: str = "item_id",
    grade_column: str = "grade",
    rank_column: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Corpus verdict over :func:`ndcg`: scored-query count, the count
    of zero-ideal queries (all judgments grade 0 — unscorable, counted
    not dropped), and the mean NDCG summed from the EXACT per-query
    micros (float summation order is not engine-reproducible) with ONE
    trailing division. One row."""
    per = ndcg(
        judged,
        ranked,
        query_key=query_key,
        item_key=item_key,
        grade_column=grade_column,
        rank_column=rank_column,
        k=k,
    )
    scored = F.col("idcg_micro") > 0
    return per.agg(
        F.coalesce(F.sum(scored.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_queries"),
        F.coalesce(F.sum((~scored).cast("int")), F.lit(0))
        .cast("long")
        .alias("n_zero_ideal"),
        F.sum("ndcg_micro").cast("long").alias("__sum_micro"),
    ).select(
        "n_queries",
        "n_zero_ideal",
        F.expr(
            "CASE WHEN n_queries > 0 THEN"
            " CAST(__sum_micro div n_queries AS BIGINT) END"
        ).alias("mean_ndcg_micro"),
        F.expr(
            "CASE WHEN n_queries > 0 THEN"
            " CAST(__sum_micro AS DOUBLE) / CAST(1000000 * n_queries"
            " AS DOUBLE) END"
        ).alias("mean_ndcg"),
    )


def majority_vote_accuracy(
    samples: DataFrame,
    gold: DataFrame,
    *,
    problem_column: str = "problem_id",
    answer_column: str = "answer",
    gold_column: str = "gold",
) -> DataFrame:
    """Self-consistency accuracy (Wang et al. 2023, arXiv:2203.11171):
    majority-vote each problem's sampled answers, score the vote
    against gold. Ties break to the lexicographically smallest answer
    — deterministic in any engine, stated rather than hidden.

    Plan: one count groupBy, one per-problem rank window (count desc,
    answer asc), broadcast join to gold. Output: one row (n_problems,
    n_correct, accuracy_milli, accuracy) — accuracy is ONE division.
    """
    votes = (
        samples.where(F.col(answer_column).isNotNull())
        .groupBy(
            F.col(problem_column).alias("problem"),
            F.col(answer_column).cast("string").alias("answer"),
        )
        .agg(F.count(F.lit(1)).alias("__v"))
    )
    w = Window.partitionBy("problem").orderBy(
        F.col("__v").desc(), F.col("answer").asc()
    )
    top = (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("problem", "answer")
    )
    g = gold.select(
        F.col(problem_column).alias("problem"),
        F.col(gold_column).cast("string").alias("gold"),
    )
    scored = top.join(F.broadcast(g), "problem").select(
        (F.col("answer") == F.col("gold")).cast("int").alias("__ok")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_problems"),
        F.sum("__ok").cast("long").alias("n_correct"),
    ).select(
        "n_problems",
        "n_correct",
        F.expr("CASE WHEN n_problems > 0 THEN"
               " 1000 * n_correct div n_problems END").alias("accuracy_milli"),
        F.expr(
            "CASE WHEN n_problems > 0 THEN"
            " CAST(n_correct AS DOUBLE) / CAST(n_problems AS DOUBLE) END"
        ).alias("accuracy"),
    )
