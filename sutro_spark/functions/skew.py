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

from pyspark.sql import Column, DataFrame
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
