"""Streaming sketch maintenance: the Structured Streaming face of
functions/sketches.py (north-star extension; the reference —
/root/reference — has no streaming data plane, its only stream is job
progress, sdk.py).

A Count-Min sketch is a plain sum over (row, bucket) cells, so its
incremental maintenance IS a streaming groupBy aggregation: Spark keeps
the running counters as query state (bounded at depth*width rows —
constant, independent of key cardinality or stream length) and emits
the updated sketch per trigger. Because the cell addressing is shared
with the batch builder (``cms_cells``), the streaming state equals
``cms_counts`` of everything ingested so far — asserted in tests.

The same shape works for the HLL registers (max instead of sum); CMS is
the demonstrator because its update is the simplest associative case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.functions.sketches import cms_cells

__all__ = [
    "anisotropy_from_state",
    "streaming_anisotropy",
    "streaming_cms",
    "streaming_hll",
    "streaming_mg",
    "mg_state_update",
    "streaming_qdigest",
    "qdigest_state_update",
]


def streaming_cms(
    stream: DataFrame,
    key_column: str,
    *,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Incrementally maintained Count-Min counters over a stream.

    Run with ``outputMode("complete")`` (the sketch is tiny — at most
    depth*width rows — so re-emitting the whole state per trigger is
    cheaper than downstream merge logic) or ``update`` to emit only
    changed cells.

    Output: (row int, bucket int, cnt bigint) — identical to the batch
    ``cms_counts`` over the union of all ingested batches.
    """
    cells = stream.select(cms_cells(key_column, depth=depth, width=width, salt=salt))
    return cells.groupBy(
        F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def streaming_hll(
    stream: DataFrame,
    group_column: str,
    key_column: str,
    *,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Incrementally maintained HyperLogLog registers over a stream —
    the max-aggregate twin of :func:`streaming_cms`. State is bounded
    at (groups x 2^p) rows; because max is idempotent as well as
    associative, replayed or duplicated records cannot corrupt the
    registers (exactly-once not required). Run with
    ``outputMode("complete")`` and feed the sink through
    ``functions.sketches.hll_from_registers`` for the estimate.
    """
    from sutro_spark.functions.sketches import hll_registers

    return hll_registers(stream, group_column, key_column, p=p, salt=salt)


def _anisotropy_state_rows() -> F.Column:
    """The exploded state rows for :func:`streaming_anisotropy`, over
    a projected quantized array column ``__q``: one (d, x) row per
    dimension (d >= 0, x = quantized component) plus d = -1 carrying 1
    (vector count) and d = -2 carrying the vector's exact self-dot.
    Summing x per d is the ENTIRE anisotropy state — dim + 2 integers,
    associative, so batch partitions, incremental batches, and
    streaming triggers all merge to the same state."""
    self_dot = F.expr(
        "aggregate(transform(__q, v -> v * v),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return F.concat(
        F.array(
            F.struct(
                F.lit(-1).cast("long").alias("d"),
                F.lit(1).cast("long").alias("x"),
            ),
            F.struct(F.lit(-2).cast("long").alias("d"), self_dot.alias("x")),
        ),
        # (v, i) form: an empty embedding contributes only the count
        # and self-dot rows instead of corrupting them via the
        # descending sequence(1, 0) -> element_at(.., 0) failure
        F.expr(
            "transform(__q,"
            " (v, i) -> struct(CAST(i AS BIGINT) AS d, v AS x))"
        ),
    )


def streaming_anisotropy(
    stream: DataFrame,
    vector_column: str = "embedding",
    *,
    scale: int = 1000,
) -> DataFrame:
    """Incrementally maintained anisotropy state over an embedding
    stream — the streaming face of
    operators/similarity.embedding_anisotropy. The state is dim + 2
    BIGINTs (per-dim sums, vector count at d = -1, self-dot total at
    d = -2): constant regardless of stream length, and equal to the
    batch state over everything ingested (asserted in tests). Finish
    a snapshot to the scalar diagnostic with
    :func:`anisotropy_from_state`.

    Output per trigger: (d bigint, s bigint).
    """
    q = F.transform(
        F.col(vector_column),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    return (
        stream.select(q.alias("__q"))
        .select(F.explode(_anisotropy_state_rows()).alias("cell"))
        .groupBy(F.col("cell.d").alias("d"))
        .agg(F.sum("cell.x").alias("s"))
    )


def anisotropy_from_state(state: DataFrame) -> DataFrame:
    """Finish an anisotropy state table (d, s) — from
    :func:`streaming_anisotropy` (persisted snapshot) or the
    equivalent batch aggregation — to the one-row diagnostic with the
    SAME arithmetic as embedding_anisotropy: one IEEE division of
    exact integers. Output: (n_vecs, t_self, s_norm2, anisotropy)."""
    return state.agg(
        F.coalesce(F.sum(F.when(F.col("d") == -1, F.col("s"))), F.lit(0))
        .cast("long")
        .alias("n_vecs"),
        F.coalesce(F.sum(F.when(F.col("d") == -2, F.col("s"))), F.lit(0))
        .cast("long")
        .alias("t_self"),
        F.coalesce(
            F.sum(F.when(F.col("d") >= 0, F.col("s") * F.col("s"))), F.lit(0)
        )
        .cast("long")
        .alias("s_norm2"),
    ).select(
        "n_vecs",
        "t_self",
        "s_norm2",
        F.expr(
            "CASE WHEN n_vecs >= 2 AND t_self > 0 THEN"
            " CAST(s_norm2 - t_self AS DOUBLE)"
            " / CAST((n_vecs - 1) * t_self AS DOUBLE) END"
        ).alias("anisotropy"),
    )


def mg_state_update(k: int):
    """State function for :func:`streaming_mg`: per shard, add the
    micro-batch's exact key counts to the running MG counters, then one
    closed-form truncation (subtract the (k+1)-th largest, keep the
    positive top-k — count desc, key asc tie-break, identical to the
    batch ``_mg_truncate``). Each truncation removes >= (k+1)*t mass,
    so the summed thresholds — hence every key's underestimate — stay
    within n_shard/(k+1) over the WHOLE stream, however it was
    micro-batched (the streaming face of Agarwal et al. 2012
    mergeability; the batch fold is the same algebra over bucket
    summaries instead of trigger deltas)."""
    import pandas as pd

    def _update(key, batches, state):
        (shard,) = key
        if state.exists:
            (keys, ests, n_seen) = state.get
            counters = dict(zip(keys, (int(e) for e in ests)))
            n_seen = int(n_seen)
        else:
            counters, n_seen = {}, 0
        for pdf in batches:
            n_seen += len(pdf)
            for kk, c in pdf["key"].value_counts().items():
                counters[kk] = counters.get(kk, 0) + int(c)
        ranked = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
        thr = ranked[k][1] if len(ranked) > k else 0
        counters = {
            kk: c - thr for kk, c in ranked[:k] if c - thr > 0
        }
        state.update(
            (list(counters.keys()), list(counters.values()), n_seen)
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "key": list(counters.keys()),
                "est": list(counters.values()),
                "n_seen": [n_seen] * len(counters),
            }
        )

    return _update


def streaming_mg(
    stream: DataFrame,
    key_column: str,
    *,
    k: int = 8,
    shards: int = 4,
    salt: str = "mg",
) -> DataFrame:
    """Incrementally maintained Misra-Gries heavy hitters over a stream.

    Keys are hash-sharded (portable sha bucket of the KEY, so a key
    never crosses shards and the per-shard bound applies to it
    directly); each shard's state is <= k (key, est) counters — total
    state shards*k rows, constant in stream length and key cardinality,
    which is the property that keeps an infinite stream runnable where
    a streaming groupBy count table would grow without bound. Reading
    the union of shard outputs gives per-key underestimates with
    total error <= n/(k+1).

    Output per trigger: (shard, key, est, n_seen) — the shard's full
    current summary plus its cumulative row count (outputMode
    ``update``; the max-n_seen rows per shard are the final state).
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sutro_spark.functions.sampling import hash_bucket

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("est", T.LongType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("ests", T.ArrayType(T.LongType())),
            T.StructField("n_seen", T.LongType()),
        ]
    )
    # NULL keys are dropped BEFORE the state op (mirroring the batch
    # mg_bucket_summaries' key IS NOT NULL filter): pandas
    # value_counts() silently drops NaN, so an unfiltered stream would
    # inflate n_seen — and the error bound's n — with rows that never
    # entered a counter, and NULL keys would hash to a NULL shard group
    keyed = stream.where(F.col(key_column).isNotNull()).select(
        hash_bucket(F.col(key_column).cast("string"), salt=salt, buckets=shards)
        .cast("long")
        .alias("shard"),
        F.col(key_column).cast("string").alias("key"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        mg_state_update(k),
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# _qdigest_py_compress moved to functions/sketches.py (the batch
# build's bounded Python tail reuses it); re-exported here for the
# streaming state machinery and its tests
from sutro_spark.functions.sketches import _qdigest_py_compress  # noqa: E402,F401


def qdigest_state_update(bits: int, k: int):
    """State function for :func:`streaming_qdigest`: add the trigger's
    values as leaves, then one compression under the UPDATED
    floor(n_shard/k) threshold. Repeated trigger-compression keeps the
    rank-error bound (q-digest is fully mergeable — Agarwal et al.
    PODS 2012, the same theorem family as streaming_mg), so however
    the stream was micro-batched the final shard digests merge into a
    bits*n/k-accurate global summary."""
    import pandas as pd

    def _update(key, batches, state):
        (shard,) = key
        if state.exists:
            ids, cnts, n_seen = state.get
            counts = dict(zip((int(i) for i in ids), (int(c) for c in cnts)))
            n_seen = int(n_seen)
        else:
            counts, n_seen = {}, 0
        top = 1 << bits
        for pdf in batches:
            n_seen += len(pdf)
            for v, c in pdf["v"].value_counts().items():
                leaf = int(v) + top
                counts[leaf] = counts.get(leaf, 0) + int(c)
        thr = n_seen // k
        if thr > 0:
            counts = _qdigest_py_compress(counts, bits, thr)
        state.update(
            (list(counts.keys()), list(counts.values()), n_seen)
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counts),
                "id": list(counts.keys()),
                "cnt": list(counts.values()),
                "n_seen": [n_seen] * len(counts),
            }
        )

    return _update


def streaming_qdigest(
    stream: DataFrame,
    value_column: str,
    *,
    bits: int = 20,
    k: int = 64,
    shards: int = 4,
    salt: str = "qd",
) -> DataFrame:
    """Incrementally maintained q-digest quantile summaries over a
    stream — the streaming twin of functions/sketches.py's
    qdigest_build, the way streaming_mg twins mg_heavy_hitters.

    Values hash-shard (by value, so each shard's digest is a digest
    of a fixed sub-population); each shard's state is <= 3k digest
    nodes plus a row count — shards*3k rows TOTAL, constant in stream
    length AND value cardinality, the property that keeps an infinite
    stream runnable where a streaming groupBy(value) histogram grows
    with the universe. Reading the union of shard outputs (max-n_seen
    rows per shard) and count-summing by node id gives a global
    digest whose rank error stays within bits*n/k (q-digest full
    mergeability) — extract quantiles with the batch
    qdigest_quantiles.

    Divergences from batch, stated: NULL and out-of-range values are
    DROPPED before the state op (the batch build raises; a per-row
    raise inside a streaming state function would poison the
    checkpoint on replay) — gate upstream if they must be fatal.

    Output per trigger: (shard, id, cnt, n_seen).
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sutro_spark.functions.sampling import hash_bucket

    if not 1 <= bits <= 30:
        raise ValueError(f"bits must be in [1, 30], got {bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("n_seen", T.LongType()),
        ]
    )
    top = 1 << bits
    keyed = (
        stream.select(F.col(value_column).cast("long").alias("v"))
        .where(
            F.col("v").isNotNull() & (F.col("v") >= 0) & (F.col("v") < top)
        )
        .select(
            hash_bucket(
                F.col("v").cast("string"), salt=salt, buckets=shards
            )
            .cast("long")
            .alias("shard"),
            "v",
        )
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        qdigest_state_update(bits, k),
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
