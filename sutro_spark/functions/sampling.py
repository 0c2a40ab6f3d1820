"""Deterministic sampling and split assignment for training-data
pipelines.

Random sampling (``df.sample``, ``TABLESAMPLE``) is seeded per-engine
and per-partitioning, so a "10% sample" is neither reproducible across
runs with different partition counts nor auditable. Pipelines at 100 TB
instead sample by CONTENT HASH: a row is in the sample iff
``hash(salt, key) % buckets < share`` — a pure per-row projection:

- zero shuffle, zero state: the decision is a filter, fully pushed
  into the scan stage;
- stable under repartitioning, retries, cluster size, engine version;
- composable: the same (salt, key) always lands in the same split, so
  train/val/test assignment is consistent across every table derived
  from the same key (no leakage between splits when new tables join
  the pipeline);
- auditable: any engine can recompute membership (sha256 is the
  portable hash family — the DuckDB oracle reproduces the exact
  bucket with ``CAST('0x' || substr(sha256(x), 1, 8) AS UBIGINT)``).

Not present in the reference (an SDK concern, not an engine one); the
operator family the brief's "training-data pipeline" scope calls for.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, *, salt: str = "", buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets) from the first 32 bits of
    sha256(salt ':' key). 32 bits keeps the value inside a BIGINT in
    every engine (the full 256-bit digest wouldn't parse portably) while
    leaving bucket-count granularity up to ~4e9."""
    k = F.col(key) if isinstance(key, str) else key
    h32 = F.conv(
        F.substring(F.sha2(F.concat(F.lit(f"{salt}:"), k.cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    return (h32 % buckets).alias("bucket")


def deterministic_sample(
    df: DataFrame,
    rate_pct: int,
    key_column: str,
    *,
    salt: str = "sample",
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose hash bucket < ``rate_pct`` of ``buckets`` — a
    reproducible ``rate_pct/buckets`` sample keyed on content, applied
    as a plain filter (survives predicate pushdown reordering since it
    only reads one column)."""
    return df.where(hash_bucket(key_column, salt=salt, buckets=buckets) < rate_pct)


def stratified_sample(
    df: DataFrame,
    key_column: str,
    stratum_column: str,
    rates: Mapping[str, int] | DataFrame,
    *,
    default_pct: int = 100,
    salt: str = "stratified",
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling — the rebalancing step of a
    data-mixture pipeline (downsample over-represented languages or
    sources to a target share) with the same content-hash guarantees as
    :func:`deterministic_sample`.

    ``rates`` maps stratum value → keep share out of ``buckets`` (or a
    (stratum, rate_pct) DataFrame read from config). The rate table is
    a BROADCAST dim — the corpus never shuffles to meet its config;
    membership stays a per-row filter evaluated in the scan stage.
    Strata absent from the table keep ``default_pct``.
    """
    spark = df.sparkSession
    if isinstance(rates, DataFrame):
        rate_df = rates.select(
            F.col(rates.columns[0]).alias(stratum_column),
            F.col(rates.columns[1]).cast("int").alias("__rate_pct"),
        )
    else:
        rate_df = spark.createDataFrame(
            [(k, int(v)) for k, v in rates.items()],
            f"{stratum_column} string, __rate_pct int",
        )
    bucket = hash_bucket(key_column, salt=salt, buckets=buckets)
    return (
        df.join(F.broadcast(rate_df), stratum_column, "left")
        .where(bucket < F.coalesce(F.col("__rate_pct"), F.lit(default_pct)))
        .drop("__rate_pct")
    )


def hash_split(
    df: DataFrame,
    key_column: str,
    splits: Mapping[str, int] | None = None,
    *,
    salt: str = "split",
    column: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket share.

    ``splits`` maps name → integer share; shares are cumulated in
    insertion order over ``sum(shares)`` buckets (default 98/1/1
    train/val/test). One projection, no shuffle; the same key always
    lands in the same split in every table and every run."""
    splits = dict(splits or {"train": 98, "val": 1, "test": 1})
    total = sum(splits.values())
    if total <= 0 or any(v < 0 for v in splits.values()):
        raise ValueError(f"split shares must be non-negative with a positive sum: {splits}")
    bucket = hash_bucket(key_column, salt=salt, buckets=total)
    expr = None
    acc = 0
    for name, share in splits.items():
        acc += share
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(column, expr)


def _weighted_priority(
    key_column: str, weight: Column | str, *, salt: str, buckets: int
) -> Column:
    """priority = u / w with u mapped into [1, buckets] — u = 0 would
    make the priority 0 for ANY weight (the row is unconditionally
    sampled); shifting by one keeps the hash uniform while guaranteeing
    every row's priority still scales with its weight. NULL/zero/
    negative weights are rejected at evaluation time."""
    w = F.col(weight) if isinstance(weight, str) else weight
    wd = w.cast("double")
    u = hash_bucket(key_column, salt=salt, buckets=buckets) + F.lit(1)
    return F.when(
        wd.isNull() | (wd <= 0),
        F.raise_error(
            F.concat(
                F.lit("weighted sample: weight must be strictly positive, got "),
                F.coalesce(wd.cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(u.cast("double") / wd)


def weighted_topk(
    df: DataFrame,
    key_column: str,
    weight: Column | str,
    k: int,
    *,
    salt: str = "weighted",
    buckets: int = 1 << 31,
) -> DataFrame:
    """Deterministic weighted sample without replacement: priority
    sampling (Efraimidis-Spirtsis shape) with a content hash standing in
    for the RNG — priority = u / w with u = 32-bit sha bucket of the
    key, keep the k SMALLEST priorities. Doubling a row's weight halves
    its priority, doubling its odds of making the cut, and the choice is
    reproducible across runs, engines, and partitionings.

    One projection + a global top-k (TakeOrderedAndProject: per-partition
    heaps, k rows to the driver — no full sort, no shuffle of the data).
    The priority is one double division of exact integers, so any engine
    recomputes the identical sample.

    Weights must be strictly positive; a NULL/zero/negative weight fails
    the job (a declarative ``raise_error``, no eager scan) rather than
    silently winning or vanishing from the sample.
    """
    pri = _weighted_priority(key_column, weight, salt=salt, buckets=buckets)
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(key_column).asc())
        .limit(k)
        .drop("__pri")
    )


def weighted_topk_per_group(
    df: DataFrame,
    group_column: str,
    key_column: str,
    weight: Column | str,
    k: int,
    *,
    salt: str = "weighted",
    buckets: int = 1 << 31,
) -> DataFrame:
    """Per-group deterministic weighted sample: the k smallest
    hash-priorities within each group (same priority construction as
    :func:`weighted_topk`) — the per-source / per-language quota shape.

    One shuffle on the group key; the rank filter is a bounded window
    (WindowGroupLimit keeps only k rows per group through the sort), so
    state never exceeds k rows per group regardless of corpus size.
    Output keeps the input columns plus ``sample_rank`` (1-based).
    Weights must be strictly positive (see :func:`weighted_topk`).
    """
    pri = _weighted_priority(key_column, weight, salt=salt, buckets=buckets)
    win = Window.partitionBy(group_column).orderBy(
        F.col("__pri").asc(), F.col(key_column).asc()
    )
    return (
        df.withColumn("__pri", pri)
        .withColumn("sample_rank", F.row_number().over(win))
        .where(F.col("sample_rank") <= k)
        .drop("__pri")
    )


def time_split(
    df: DataFrame,
    ts_column: str,
    *,
    holdout_pct: int = 20,
    column: str = "split",
) -> DataFrame:
    """Temporal holdout: the chronologically LAST ``holdout_pct`` percent
    of rows become 'holdout', the rest 'train' — the leakage-safe split
    for anything with a time axis (a random split would let the model
    peek at the future).

    The cutoff is the ceil((100-holdout_pct)/100 · n)-th smallest
    timestamp — computed with one global aggregate (count) broadcast
    into a rank filter, not a driver collect. Rows ON the cutoff
    timestamp stay in train (ties resolve chronologically: the split
    boundary is a point in time, so equal timestamps must land on one
    side). NULL timestamps go to 'train' (they carry no order
    information and must never contaminate the eval window).

    Plan: a GLOBAL row rank would collapse to one partition; instead
    the cutoff VALUE is found exactly in two tiny steps — count n,
    then the smallest timestamp with at least ceil(frac·n) rows
    at-or-below it, via a cumulative count over the DISTINCT-timestamp
    spine (|distinct ts| rows, not |rows| — the only single-partition
    window runs over that spine). The cutoff then broadcasts into a
    per-row projection over the full table.

    Output: input columns + ``column`` ('train' | 'holdout').
    """
    if not 0 < holdout_pct < 100:
        raise ValueError(f"holdout_pct must be in (0, 100): {holdout_pct}")
    ts = F.col(ts_column)
    n_total = df.where(ts.isNotNull()).agg(F.count(F.lit(1)).alias("__n"))
    spine = (
        df.where(ts.isNotNull())
        .groupBy(ts.alias("__ts"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.orderBy(F.asc("__ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = spine.withColumn("__cum", F.sum("__c").over(w))
    train_rows = F.ceil(
        F.col("__n") * F.lit((100 - holdout_pct) / 100.0)
    ).cast("long")
    cutoff = (
        cum.crossJoin(F.broadcast(n_total))
        .where(F.col("__cum") >= train_rows)
        .agg(F.min("__ts").alias("__cutoff"))
    )
    return df.crossJoin(F.broadcast(cutoff)).withColumn(
        column,
        F.when(ts.isNull() | (ts <= F.col("__cutoff")), F.lit("train")).otherwise(
            F.lit("holdout")
        ),
    ).drop("__cutoff")


def hamilton_allocation(
    df: DataFrame,
    stratum_column: str,
    key_column: str,
    total_n: int,
    *,
    salt: str = "hamilton",
) -> DataFrame:
    """Exact-size proportional stratified sample: allocate EXACTLY
    ``total_n`` rows across strata by the largest-remainder (Hamilton)
    method, then pick each stratum's quota deterministically by
    content hash. The eval-set constructor: "give me a 10,000-doc
    holdout with every source represented in proportion" — where
    :func:`stratified_sample`'s per-row rates give a BINOMIAL sample
    size (right share in expectation, never exactly n).

    Allocation is pure integer arithmetic: base_g = (n*size_g) div N,
    and the ``n - sum(base_g)`` leftover units go to the strata with
    the largest remainders ``n*size_g mod N`` (ties: larger stratum,
    then stratum value — fully deterministic). Hamilton is the unique
    divisor-free method that never violates quota by more than one
    unit; with ``total_n <= N`` no stratum is ever allocated more
    rows than it has (floor(n*size/N) + 1 <= size whenever the
    remainder is nonzero). Row picks rank by the repo's sha-derived
    content hash (ties by key), so membership is stable across runs,
    engines, and cluster sizes, and adding documents to OTHER strata
    never changes a stratum's picks.

    Plan: one stratum-size aggregate (map-side combinable), the
    allocation math on a |strata|-row frame, a broadcast join of the
    quota table back onto the corpus, and one rank window per
    stratum. The corpus shuffles once, on the stratum key.

    Output: the sampled rows (original columns), exactly ``total_n``
    of them when ``total_n <= N`` (else every row).
    """
    if total_n < 0:
        raise ValueError("total_n must be >= 0")
    # NULL strata can't survive the equality join below; excluding them
    # from N as well keeps the exactly-total_n contract honest (rows
    # with a NULL stratum are unsampleable, not silently under-counted)
    df = df.where(F.col(stratum_column).isNotNull())
    sizes = df.groupBy(F.col(stratum_column).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__g")
    )
    tot = sizes.agg(
        F.coalesce(F.sum("__g"), F.lit(0)).cast("long").alias("__N")
    )
    quotas = (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            "__s",
            "__g",
            F.expr(f"CAST(({total_n} * __g) div __N AS BIGINT)").alias(
                "__base"
            ),
            F.expr(f"CAST(({total_n} * __g) % __N AS BIGINT)").alias(
                "__rem"
            ),
        )
    )
    spill = quotas.agg(
        (F.lit(total_n) - F.coalesce(F.sum("__base"), F.lit(0)))
        .cast("long")
        .alias("__left")
    )
    w_rem = Window.orderBy(
        F.desc("__rem"), F.desc("__g"), F.asc("__s")
    )
    alloc = (
        quotas.withColumn("__rk", F.row_number().over(w_rem))
        .crossJoin(F.broadcast(spill))
        .select(
            "__s",
            F.least(
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__left"), 1).otherwise(0),
                F.col("__g"),
            ).alias("__alloc"),
        )
    )
    h = hash_bucket(F.col(key_column), salt=salt, buckets=1 << 32)
    w_pick = Window.partitionBy(stratum_column).orderBy(
        h.asc(), F.col(key_column).asc()
    )
    return (
        df.join(
            F.broadcast(alloc),
            F.col(stratum_column) == F.col("__s"),
        )
        .withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") <= F.col("__alloc"))
        .drop("__s", "__alloc", "__rn")
    )
