"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful data-plane (SURVEY §2.8); this covers the
Spark-native capability a production event pipeline needs: per-key
running state with timeout-based eviction, here a per-user running
event counter + value sum that emits one update row per micro-batch.

State is bounded: one small tuple per active user, evicted after the
processing-time timeout — the constant-memory construction that keeps
an infinite stream runnable on a fixed cluster.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _make_update_user(evict_idle_ms: int | None):
    def _update_user(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if evict_idle_ms:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return _update_user


def running_user_totals(
    events_stream: DataFrame, *, evict_idle_ms: int | None = 3600 * 1000
) -> DataFrame:
    """Per-user running (count, sum(value)) over an events stream.

    ``evict_idle_ms`` drops state for users idle longer than the bound
    (the constant-memory production setting). Pass ``None`` for
    finite/replay workloads — the processing-time timeout keeps the
    query scheduling wake-up batches, which never drains under
    ``availableNow``-style triggers.

    Usage: ``running_user_totals(stream).writeStream.outputMode("update")``.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_update_user(evict_idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
