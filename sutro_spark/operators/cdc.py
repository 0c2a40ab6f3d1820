"""Change-data-capture apply: merge a changes feed (insert / update /
delete rows) onto a base table — the Delta-`MERGE` shape expressed as
plain relational algebra so it runs on any DataFrame pair.

Scale notes (100 TB base, small-to-medium changes batch):
- one shuffle on the merge key for the anti-join, one for the
  latest-change window; when the changes side is small Catalyst/AQE
  broadcasts it and the base table is never shuffled at all;
- the latest-wins window runs on the CHANGES side only (the small
  side) — never on the base table;
- deletes are just rows that survive the window with op='D' and are
  dropped before the union, so a delete costs the same as an update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["latest_changes", "merge_upsert", "incremental_rollup", "scd2_history"]


def latest_changes(
    changes: DataFrame,
    key_columns: list[str],
    *,
    order_column: str,
    op_column: str = "op",
) -> DataFrame:
    """Collapse a multi-version changes feed to one winner per key:
    highest ``order_column`` wins, ties broken by op so the feed is
    deterministic even when a key carries two ops at one version."""
    w = Window.partitionBy(*key_columns).orderBy(
        F.col(order_column).desc(), F.col(op_column).desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_columns: list[str],
    *,
    order_column: str,
    op_column: str = "op",
) -> DataFrame:
    """Apply ``changes`` onto ``base``: the newest change per key wins;
    op 'D' removes the key, any other op replaces (or inserts) the full
    row. Change rows carry the same payload columns as ``base``.

    Result = (base ∖ changed-keys) ∪ surviving-changes — two joins that
    both shuffle on the merge key (or broadcast when changes are small),
    no driver-side state.
    """
    latest = latest_changes(
        changes, key_columns, order_column=order_column, op_column=op_column
    )
    changed_keys = latest.select(*key_columns)
    untouched = base.join(changed_keys, on=key_columns, how="left_anti")
    survivors = latest.where(F.col(op_column) != F.lit("D")).select(*base.columns)
    return untouched.unionByName(survivors)


_SEP = "\x1f"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_columns: list[str],
    *,
    compare_columns: list[str] | None = None,
) -> DataFrame:
    """Diff two corpus snapshots: which keys were added, removed, or
    changed (same key, different content) between ``old`` and ``new``.

    Content comparison is by sha2 digest over the null-coalesced,
    unit-separator-joined compare columns — one full-outer join on the
    key with both sides pre-reduced to (key, digest), so the payload
    columns never travel through the shuffle. Unchanged rows are
    dropped before anything leaves the join stage.

    Output: key columns + ``change`` ∈ {'added','removed','changed'}.
    """
    compare = compare_columns or [c for c in old.columns if c not in key_columns]

    def digest(df: DataFrame) -> F.Column:
        return F.sha2(
            F.concat_ws(
                _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in compare]
            ),
            256,
        )

    o = old.select(*key_columns, digest(old).alias("__old_d"))
    n = new.select(*key_columns, digest(new).alias("__new_d"))
    joined = o.join(n, on=key_columns, how="full_outer")
    change = (
        F.when(F.col("__old_d").isNull(), F.lit("added"))
        .when(F.col("__new_d").isNull(), F.lit("removed"))
        .when(F.col("__old_d") != F.col("__new_d"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*key_columns, "change")
    )


def incremental_rollup(
    rollup: DataFrame,
    changes: DataFrame,
    key_columns: list[str],
    sums: dict[str, str],
    *,
    count_column: str = "n",
    op_column: str = "op",
    strict: bool = False,
) -> DataFrame:
    """Maintain a pre-aggregated rollup (count + sums per key) from a
    CDC delta WITHOUT re-reading the base corpus — the materialized-
    view maintenance shape: at 100 TB you can afford to re-aggregate
    the day's changes, never the corpus.

    ``rollup`` holds the current state: key columns + ``count_column``
    + one column per ``sums`` key. ``changes`` carries the raw value
    columns (``sums`` values) plus ``op_column`` = +1 (insert) / -1
    (delete); an update is a -1 old-row and a +1 new-row. Counts and
    sums are signed-additive, so the new state is just

        groupBy(key)( rollup-partials UNION delta-partials )

    with groups whose count reaches 0 dropped. A group whose merged
    count goes NEGATIVE (a delete for a key absent from the rollup, or
    over-delivered deletes — a CDC consistency violation upstream) is
    by default dropped along with the zeros, i.e. the default mode
    masks the inconsistency as a clean result; pass ``strict=True`` to
    keep count < 0 groups in the output so a maintenance job can
    assert ``count >= 0`` and surface the violation instead of
    silently absorbing it. Work is
    O(|changes| + |touched keys|): the delta aggregate is map-side
    combinable, the union's groupBy shuffles only |keys| rows (the
    rollup is already one row per key). Only additive measures belong
    here — min/max are not delete-maintainable; pair this with the
    sketches family (CMS/HLL add the same way) for distincts.
    """
    delta = changes.groupBy(*key_columns).agg(
        F.sum(F.col(op_column)).cast("long").alias(count_column),
        *[
            F.sum(F.col(op_column) * F.col(src)).cast("long").alias(dst)
            for dst, src in sums.items()
        ],
    )
    cols = [count_column, *sums.keys()]
    merged = (
        rollup.select(*key_columns, *cols)
        .unionByName(delta.select(*key_columns, *cols))
        .groupBy(*key_columns)
        .agg(*[F.sum(c).cast("long").alias(c) for c in cols])
        .where(
            F.col(count_column) != 0 if strict else F.col(count_column) > 0
        )
    )
    return merged


def scd2_history(
    changes: DataFrame,
    *,
    entity_column: str = "entity",
    state_column: str = "state",
    ts_column: str = "ts",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: turn an append-only
    change log (entity, ts, state) into validity intervals — one row
    per state EPISODE with [valid_from, valid_to) bounds, a version
    number, and an is_current flag. The standard warehouse history
    shape (Kimball SCD type 2), and for an LLM-data pipeline the
    "what labels/quality tier did this document hold WHEN we
    snapshotted the training mix" time-travel table.

    Semantics:
    - consecutive identical states COMPRESS into one episode (a
      change log that re-asserts the same value records no change);
    - ``valid_to`` is the next episode's ``valid_from`` (half-open
      intervals chain with no gaps or overlaps); NULL on the last
      episode, which alone has ``is_current`` = true;
    - ``version`` numbers episodes 1..k per entity in time order.

    Determinism: rows are ordered by (ts, state) within an entity, so
    two CONFLICTING states at the same timestamp yield a zero-length
    episode plus the surviving one in lexical order — deterministic,
    but fix your upstream if you see it (a change log should not
    contradict itself at one instant). Exact duplicates (same entity,
    ts, state) are deduped first.

    Plan: one shuffle on entity — all three windows (dedup is a
    groupBy on the same key prefix) share the partitioning, so
    Catalyst plans a single Exchange; state per entity is its episode
    list, never the log. At 100 TB the log shuffles once on the
    dimension key, which is the floor for any history build.

    Output: (entity, state, valid_from, valid_to, version,
    is_current), NULL-state rows dropped (a NULL observation is a
    missing read, not a state).
    """
    log = (
        changes.select(
            F.col(entity_column).alias("__e"),
            F.col(ts_column).alias("__ts"),
            F.col(state_column).alias("__s"),
        )
        .where(F.col("__s").isNotNull() & F.col("__ts").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("__e").orderBy("__ts", "__s")
    episodes = (
        log.withColumn("__prev", F.lag("__s").over(w))
        .where(F.col("__prev").isNull() | (F.col("__prev") != F.col("__s")))
        .drop("__prev")
    )
    w2 = Window.partitionBy("__e").orderBy("__ts", "__s")
    return episodes.select(
        F.col("__e").alias(entity_column),
        F.col("__s").alias(state_column),
        F.col("__ts").alias("valid_from"),
        F.lead("__ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("__ts").over(w2).isNull().alias("is_current"),
    )
