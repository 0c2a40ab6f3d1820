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

from pyspark.sql import DataFrame
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
