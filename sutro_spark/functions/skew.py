"""Skew mitigation (SURVEY.md scale notes).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) is the
first line of defense and is enabled by the session factory. These
helpers cover the cases AQE can't fix:

- ``salted_join`` — a shuffle join where one key dominates: the skewed
  (large) side gets a deterministic salt in [0, B), the small side is
  replicated B times, and the join key becomes (key, salt) — the hot
  key's rows spread over B reducers.
- ``two_phase_agg`` — heavy-hitter groupBy: pre-aggregate on
  (key, salt) then combine per key, bounding any single reducer's
  input. (Spark's hash aggregate already does map-side partials; this
  is for the pathological case where even one reducer's share of a
  single key overflows.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated ``buckets`` times. Result equals ``skewed.join(small,
    on, how)`` for inner/left joins on an equi-key."""
    left = skewed.withColumn(_SALT, F.pmod(F.xxhash64(*skewed.columns), F.lit(buckets)))
    replicas = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return left.join(replicas, on=[on, _SALT], how=how).drop(_SALT)


def _mg_fold_py(summary_rows, *, k: int) -> dict:
    """Driver-side replay of the Misra–Gries bucket fold (merge =
    per-key est sum, then ONE truncation; buckets folded in ascending
    order) over collected (bucket, key, est) summary rows — the SAME
    deterministic rule as sketches.mg_merge/_mg_truncate: subtract the
    (k+1)-th largest est (ties est desc, key asc) and keep the
    positive top-k. Input is bounded (<= buckets·k rows), so this is
    the bounded-collect class, and the n/(k+1) under-estimate
    guarantee is the merge-tree-independent Agarwal et al. 2012 bound.
    Returns {key: est}."""
    by_bucket: dict = {}
    for r in summary_rows:
        by_bucket.setdefault(int(r["bucket"]), {})[r["key"]] = int(r["est"])

    def trunc(d: dict) -> dict:
        items = sorted(d.items(), key=lambda t: (-t[1], t[0]))
        thr = items[k][1] if len(items) > k else 0
        return {key: est - thr for key, est in items[:k] if est > thr}

    acc: dict | None = None
    for b in sorted(by_bucket):
        part = by_bucket[b]
        if acc is None:
            acc = dict(part)  # first summary is already <= k keys
            continue
        summed = dict(acc)
        for key, est in part.items():
            summed[key] = summed.get(key, 0) + est
        acc = trunc(summed)
    return acc or {}


def adaptive_salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    k: int = 16,
    how: str = "inner",
) -> DataFrame:
    """:func:`salted_join` that salts ONLY the keys a Misra–Gries
    sketch measures as heavy — the sketch feeding a plan decision.

    Plain salting replicates the ENTIRE small side ``buckets`` times
    (B·|small| rows through the shuffle). Here one MG pass over the
    skewed side's key column (bounded state, ≤ k survivors) picks the
    heavy keys; only their rows salt on the left, and only their dim
    rows replicate — B·|heavy| extra rows instead of B·|small|. At
    100 TB with a million-row dim and 3 hot keys, that is the
    difference between 8M duplicated dim rows and 24.

    Honesty of the trigger, stated: MG NEVER misses a key with share
    > 1/(k+1) of rows (the deterministic guarantee qdigest/mg_guarantee
    [Q]-probe), so every key that can overload a reducer at this k is
    salted; it may ALSO flag up to k−1 lighter keys, which costs B−1
    harmless extra dim rows each. The collected survivor list is ≤ k
    rows — the bounded-collect class — and becomes a constant-folded
    isin probe, not a join.

    Result equals ``skewed.join(small, on, how)`` for inner/left
    equi-joins: heavy rows meet exactly the replica with their salt;
    light rows (salt 0) meet the always-present salt-0 replica.

    Measured decision, not a default (SCALING.md r14 probe): the MG
    trigger is one extra keyed scan — at 16x-lineitem toy scale it
    TRIPLED a broadcast-joinable query (7.75 s vs 1.27 s plain,
    identical results). Use AQE skew-join first; reach for this on
    skew_report evidence when the dim cannot broadcast AND a hot key
    overflows a reducer — and amortize the trigger via
    mg_bucket_summaries' incremental persist-and-merge shape.
    """
    from sutro_spark.functions.sketches import mg_bucket_summaries

    if how not in ("inner", "left"):
        # result-equality is only proven for inner/left equi-joins;
        # right/outer would emit one row PER REPLICA for unmatched dim
        # rows (up to `buckets` copies per heavy key) — refuse loudly
        # instead of silently duplicating (the q_milli-validator
        # discipline).
        raise ValueError(
            f"adaptive_salted_join supports how in ('inner', 'left'); "
            f"got {how!r} — unmatched dim rows would duplicate once per "
            f"salt replica under right/outer semantics"
        )

    # row identity for MG's unbiased shard routing = the key column
    # itself (any deterministic expression works; sharding by key only
    # concentrates a key in one shard, which MG's merge bound absorbs).
    # The heavy lifting is mg_bucket_summaries' ONE groupBy; the B-1
    # merge/truncate fold then runs DRIVER-SIDE over the collected
    # <= buckets*k summary rows (the qdigest-Python-tail discipline:
    # the distributed fold pays a stage barrier per bucket to move a
    # few dozen rows — measured seconds of pure scheduling).
    summary_rows = mg_bucket_summaries(
        skewed.select(F.col(on)), on, on, k=k
    ).collect()  # bounded: <= buckets * k rows
    heavy = sorted(_mg_fold_py(summary_rows, k=k))
    if heavy:
        is_heavy = F.col(on).cast("string").isin(heavy)
    else:  # empty input: nothing is heavy, degrade to a plain join
        is_heavy = F.lit(False)
    left = skewed.withColumn(
        _SALT,
        F.when(
            is_heavy, F.pmod(F.xxhash64(*skewed.columns), F.lit(buckets))
        ).otherwise(F.lit(0)),
    )
    replicas = small.withColumn(
        _SALT,
        F.explode(
            F.when(
                is_heavy, F.sequence(F.lit(0), F.lit(buckets - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return left.join(replicas, on=[on, _SALT], how=how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    *,
    buckets: int = 8,
) -> DataFrame:
    """Skew-proof sum/count per key: partial aggregate on (key, salt),
    then final aggregate on key. Output: (key, total, n_rows)."""
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(F.col(agg_col)), F.lit(buckets)))
    partial = salted.groupBy(key, _SALT).agg(
        F.sum(agg_col).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("__psum").alias("total"), F.sum("__pcnt").alias("n_rows")
    )


def skew_report(
    df: DataFrame,
    key_column: str,
    *,
    top: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnosis: the evidence behind "should I salt
    this key?". One map-side-combinable groupBy + two tiny aggregates.

    Output: one row per top-``top`` key by count, plus the aggregate
    context on every row — (key string, cnt bigint, rank bigint,
    n_keys bigint, total bigint, max_cnt bigint, avg_cnt double,
    skew_factor double = max_cnt/avg_cnt). A skew_factor near 1 means
    uniform keys; >> shuffle-partition count means one reducer owns
    the key and salting/AQE-skew-join is warranted. NULL keys are
    counted as a key (they hash to one reducer like any other value —
    that is exactly the skew this diagnoses).

    avg and the factor are single IEEE divisions of exact integers —
    engine-reproducible.
    """
    counts = df.groupBy(
        F.col(key_column).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    ranked = (
        counts.orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
        .limit(top)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
            ),
        )
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        "key",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("rank").cast("long").alias("rank"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total").cast("long").alias("total"),
        F.col("max_cnt").cast("long").alias("max_cnt"),
        (F.col("total").cast("double") / F.col("n_keys")).alias("avg_cnt"),
        (
            F.col("max_cnt").cast("double")
            / (F.col("total").cast("double") / F.col("n_keys"))
        ).alias("skew_factor"),
    )
