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

__all__ = ["latest_changes", "merge_upsert"]


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
