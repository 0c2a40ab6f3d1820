"""Context-window packing (concat-and-chunk) for LLM pretraining.

The standard pretraining data step the reference SDK leaves to the
trainer: documents are concatenated into one token stream per packing
group and cut into fixed ``budget``-token context windows; a document
may straddle a window boundary, exactly like the tokenizer's
concat-then-split. (Reference has no packing op — this extends the
training-data surface mandated by the brief, next to
operators/quality.py and functions/sampling.py.)

Spark-first design:
- ONE window cumulative sum per group (``SUM(n_tokens) OVER
  (PARTITION BY group ORDER BY id)``) yields every document's start
  offset; chunk membership is then pure integer arithmetic — no
  self-join, no Python, no second shuffle.
- the shuffle key is the packing group (e.g. ``source``), so groups
  pack in parallel. A window partition spills rather than OOMs, but at
  100 TB a single giant group still serializes its cumsum — pass
  ``buckets=N`` to subdivide each group by a portable sha bucket of
  the id (each (group, bucket) packs independently, bounding any one
  task at corpus/N regardless of skew).
- all offsets are exact integers (whitespace token counts), so any
  engine — and the DuckDB oracle — reproduces the packing bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sutro_spark.functions.sampling import hash_bucket
from sutro_spark.functions.text import token_count


def pack_contexts(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    budget: int = 512,
    group_by: str = "source",
    buckets: int | None = None,
) -> DataFrame:
    """Assign each document its span in the packed token stream.

    Output: (group, [bucket,] id, n_tokens, start_offset, chunk_start,
    chunk_end, n_chunks) where chunk ids are 0-based within the
    (group[, bucket]) stream and ``n_chunks`` is how many context
    windows the document touches (0 for an empty document).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    keys = [group_by]
    out = df.select(
        F.col(group_by),
        F.col(id_column),
        token_count(F.col(text_column)).alias("n_tokens"),
    )
    if buckets:
        out = out.withColumn(
            "bucket", hash_bucket(id_column, salt="pack", buckets=buckets)
        )
        keys.append("bucket")
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_column)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    chunk_start = F.expr(f"start_offset div {budget}")
    chunk_end = F.when(F.col("n_tokens") == 0, chunk_start).otherwise(
        F.expr(f"(start_offset + n_tokens - 1) div {budget}")
    )
    return (
        out.withColumn("chunk_start", chunk_start)
        .withColumn("chunk_end", chunk_end)
        .withColumn(
            "n_chunks",
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint")).otherwise(
                F.col("chunk_end") - F.col("chunk_start") + 1
            ),
        )
    )


def shard_manifest(
    chunk_stats: DataFrame,
    *,
    chunks_per_shard: int = 16,
    group_by: str = "source",
) -> DataFrame:
    """Training-shard manifest from ``pack_chunk_stats`` output: fixed
    ``chunks_per_shard`` windows per shard file, per group. Pure
    integer arithmetic over the chunk table (already tiny relative to
    the corpus — one row per context window), one map-side-combinable
    groupBy. Output: (group, shard_id, n_chunks, chunk_lo, chunk_hi,
    n_tokens) — what a trainer's data loader consumes.
    """
    if chunks_per_shard <= 0:
        raise ValueError(f"chunks_per_shard must be positive, got {chunks_per_shard}")
    return (
        chunk_stats.withColumn(
            "shard_id", F.expr(f"chunk_id div {chunks_per_shard}")
        )
        .groupBy(group_by, "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("chunk_id").alias("chunk_lo"),
            F.max("chunk_id").alias("chunk_hi"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def pack_chunk_stats(
    packed: DataFrame,
    *,
    budget: int = 512,
    group_by: str = "source",
) -> DataFrame:
    """Per-context-window occupancy from a ``pack_contexts`` result.

    Explodes each document over the (few) windows it touches —
    bounded by n_tokens/budget + 1, never corpus² — and aggregates
    per (group, chunk_id): documents touching the window, tokens in
    it, and fill fraction (exact integer ratio; the final window of a
    group is the only one allowed to be partial).
    """
    spans = packed.where(F.col("n_tokens") > 0).select(
        F.col(group_by),
        F.col("start_offset"),
        (F.col("start_offset") + F.col("n_tokens")).alias("end_offset"),
        F.explode(F.sequence("chunk_start", "chunk_end")).alias("chunk_id"),
    )
    tokens_in_chunk = F.least(
        F.col("end_offset"), (F.col("chunk_id") + 1) * budget
    ) - F.greatest(F.col("start_offset"), F.col("chunk_id") * budget)
    return (
        spans.withColumn("chunk_tokens", tokens_in_chunk)
        .groupBy(group_by, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chunk_tokens").alias("n_tokens"),
        )
        .withColumn("fill", F.col("n_tokens").cast("double") / budget)
    )


def shuffled_shards(
    df: DataFrame,
    key_column: str,
    *,
    num_shards: int = 64,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, position) address from a content hash — the reproducible
    equivalent of "shuffle the corpus then split into N shard files"
    that trainers need for run-to-run comparable data order.

    shard = hash bucket (rows land uniformly, independent of input
    order or partitioning); position = rank of a SECOND, independent
    hash within the shard. Writing is then `repartition(shard).sortWithin
    Partitions(position)` — each shard file sorts locally, there is no
    global sort barrier; at 100 TB this is N independent
    spill-friendly sorts instead of one cluster-wide total order.
    Identical keys always produce the identical address, so a re-run
    (or a different engine) rebuilds byte-identical shards.
    """
    shard = hash_bucket(key_column, salt=salt, buckets=num_shards)
    pos_key = hash_bucket(key_column, salt=salt + ":pos", buckets=1 << 31)
    w = Window.partitionBy("shard").orderBy(
        F.col("__pos_key").asc(), F.col(key_column).asc()
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("__pos_key", pos_key)
        .withColumn("position", F.row_number().over(w).cast("long"))
        .drop("__pos_key")
    )


def epoch_plan(
    manifest: DataFrame,
    *,
    group_by: str = "source",
    shard_column: str = "shard_id",
    weight_column: str = "n_tokens",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Deterministic interleaved shard schedule for one training epoch:
    a global order over shards in which each group (source) recurs with
    frequency proportional to its total weight — stride scheduling /
    weighted-fair-queueing virtual time, the classic deterministic
    alternative to "shuffle shards and hope the mixture averages out".

    Each shard's virtual time is the normalized midpoint of its own
    group's token mass: ``vt = (2*cum_incl - w_shard) * scale DIV
    (2 * w_group)`` where cum_incl is the group's running
    ``weight_column`` total through this shard (in ``shard_column``
    order) and w_group the group total — i.e., every group traverses
    (0, scale) through its OWN tokens, so all groups finish the epoch
    together and any schedule prefix contains each group's tokens in
    proportion to its share (the WFQ fairness bound; pacing groups by
    raw weight instead would exhaust heavy groups early and bunch the
    tail). Pure integer arithmetic — any engine reproduces the
    schedule bit-for-bit.

    Output: (position bigint — 1-based global order, group, shard_id,
    vt bigint). The final global rank runs over the MANIFEST (one row
    per shard, ~corpus_tokens / tokens_per_shard rows — at 100 TB with
    0.5 GB shards that is ~200k rows), not the corpus; a single-task
    sort of a manifest is deliberate and cheap.
    """
    w_tbl = manifest.groupBy(F.col(group_by).alias("grp")).agg(
        F.sum(F.col(weight_column)).alias("w")
    )
    cum = Window.partitionBy(F.col(group_by)).orderBy(
        F.col(shard_column).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = manifest.select(
        F.col(group_by).alias("grp"),
        F.col(shard_column).alias("shard_id"),
        F.col(weight_column).alias("tok"),
        F.sum(F.col(weight_column)).over(cum).alias("cum_incl"),
    )
    vt = seq.join(F.broadcast(w_tbl), "grp").select(
        "grp",
        "shard_id",
        F.expr(
            f"(2 * cum_incl - tok) * CAST({scale} AS BIGINT) div (2 * w)"
        ).alias("vt"),
    )
    order = Window.orderBy(F.col("vt").asc(), F.col("grp").asc(), F.col("shard_id").asc())
    return vt.select(
        F.row_number().over(order).cast("long").alias("position"),
        F.col("grp").alias(group_by),
        "shard_id",
        "vt",
    )


def length_buckets(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    boundaries: list[int] | None = None,
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed batch planning for model inference: group rows
    into token-length buckets so fixed-size inference batches pad to
    the BUCKET maximum instead of the global maximum — the classic
    serving optimization for the reference's batch-LLM workload
    (sutro-sh/sutro ships whole column batches to the API; a
    length-sorted batch plan cuts padded-token volume, which is what
    the provider bills and the GPU executes).

    ``boundaries`` are bucket upper bounds in tokens (ascending;
    lengths above the last bound share a final open bucket).
    Per bucket, the report gives the batch count at ``batch_size``
    and two exact-integer padded-token totals:

        padded_bucket = n * max_len_in_bucket      (bucketed batches)
        padded_global = n * global_max_len         (naive batching)

    Their difference over the whole table is the padding the bucket
    plan saves. Real serving pads per BATCH, not per bucket; bucket
    max is the worst batch in the bucket, so the saving reported here
    is a LOWER bound on the true saving — documented conservatism,
    not optimism.

    Plan: one token-count projection, one combinable per-bucket
    aggregate, a 1-row global-max broadcast. Output: (bucket,
    upper_bound, n_rows, n_batches, max_len, sum_len, padded_bucket,
    padded_global) — one row per non-empty bucket.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    bounds = sorted(boundaries or [64, 128, 256, 512, 1024])
    if any(b < 1 for b in bounds):
        raise ValueError("boundaries must be positive")
    from sutro_spark.functions.text import token_count

    lens = df.select(
        F.col(id_column).alias("id"),
        token_count(F.coalesce(F.col(text_column), F.lit(""))).alias("len"),
    )
    bucket = F.lit(len(bounds))
    for i, b in reversed(list(enumerate(bounds))):
        bucket = F.when(F.col("len") <= b, F.lit(i)).otherwise(bucket)
    gmax = lens.agg(F.max("len").cast("long").alias("gmax"))
    upper = F.element_at(
        F.array(*[F.lit(b).cast("long") for b in bounds], F.lit(None).cast("long")),
        F.col("bucket").cast("int") + 1,
    )
    return (
        lens.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max("len").cast("long").alias("max_len"),
            F.sum("len").cast("long").alias("sum_len"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "bucket",
            upper.alias("upper_bound"),
            "n_rows",
            F.expr(f"CAST((n_rows + {batch_size - 1}) div {batch_size} AS BIGINT)")
            .alias("n_batches"),
            "max_len",
            "sum_len",
            (F.col("n_rows") * F.col("max_len")).cast("long").alias("padded_bucket"),
            (F.col("n_rows") * F.col("gmax")).cast("long").alias("padded_global"),
        )
        .orderBy("bucket")
    )


def ffd_pack(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    budget: int = 128,
    group_size: int = 64,
) -> DataFrame:
    """Whole-document context packing: first-fit-decreasing bin packing,
    blocked for scale.

    :func:`pack_contexts` is concat-and-chunk — every window is full but
    documents straddle window boundaries. Training recipes that must
    not truncate documents (Ding et al. 2024, "Fewer Truncations
    Improve Language Modeling", use exactly this best-fit/first-fit
    packing) instead assign each WHOLE document to a context bin of
    capacity ``budget`` and pad the remainder. FFD (sort by size
    descending, place each item in the first bin it fits) is the
    classic 11/9·OPT + 6/9 heuristic.

    Spark-first, 100 TB shape:
    - global (n_tokens desc, id asc) rank via ``with_row_id`` — a
      range exchange + parallel per-partition windows, never an
      Exchange SinglePartition;
    - contiguous blocks of ``group_size`` ranked docs pack
      INDEPENDENTLY (``applyInPandas`` per block — bounded O(G²)
      work and O(G) state per task, embarrassingly parallel);
    - bins never cross blocks, so the only FFD-vs-blocked-FFD loss is
      at block seams: within a block every bin except possibly one
      ends > budget/2 full (two half-empty bins would have merged —
      the classic first-fit argument), so waste is bounded by one
      half-empty bin per ``group_size`` docs. Larger groups buy fill
      at no memory risk (state is one fill integer per open bin).

    Documents longer than ``budget`` can never pack: they are flagged
    with ``grp = -1, bin = -1`` (the caller decides whether to split
    them with :func:`pack_contexts` — the two operators compose).

    Determinism: the rank order, the block split, and first-fit itself
    are all exact integer rules — any engine (and the DuckDB oracle's
    recursive CTE, which replays first-fit carrying the bin-fill list
    as row state) reproduces the assignment bit-for-bit.

    Output: (grp, bin, doc id, n_tokens) — ``(grp, bin)`` is the
    global bin key.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if group_size <= 0:
        raise ValueError(f"group_size must be positive, got {group_size}")
    from sutro_spark.sources.ingest import ROW_ID, with_row_id

    sized = df.select(
        F.col(id_column).cast("long").alias("doc_id"),
        token_count(F.col(text_column)).alias("n_tokens"),
    )
    overlong = sized.where(F.col("n_tokens") > budget).select(
        F.lit(-1).cast("long").alias("grp"),
        F.lit(-1).cast("long").alias("bin"),
        "doc_id",
        "n_tokens",
    )
    eligible = sized.where(F.col("n_tokens") <= budget).withColumn(
        "__neg", -F.col("n_tokens")
    )
    ranked = with_row_id(eligible, order_by=["__neg", "doc_id"]).withColumn(
        "grp", F.expr(f"{ROW_ID} div {group_size}")
    )

    def _ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        bins: list[int] = []
        for size in pdf["n_tokens"]:
            size = int(size)
            for j, fill in enumerate(fills):
                if fill + size <= budget:
                    fills[j] = fill + size
                    bins.append(j)
                    break
            else:
                bins.append(len(fills))
                fills.append(size)
        return pd.DataFrame(
            {
                "grp": pdf["grp"],
                "bin": pd.Series(bins, dtype="int64"),
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
            }
        )

    packed = ranked.select("grp", "doc_id", "n_tokens").groupBy("grp").applyInPandas(
        _ffd, "grp long, bin long, doc_id long, n_tokens long"
    )
    return packed.unionByName(overlong)


def ffd_stats(
    packed: DataFrame,
    *,
    budget: int = 128,
) -> DataFrame:
    """Fill/waste report over :func:`ffd_pack` output — the honesty
    number for the packing: one row with the bin count against the
    ceil(total/budget) lower bound, overflow and half-empty-bin
    checks (at most one bin <= budget/2 per group, see
    :func:`ffd_pack`), and integer per-mille occupancy. Pure
    aggregates — one map-side-combinable groupBy over the (already
    tiny) per-doc assignment table.

    Output: (n_docs, n_overlong, total_tokens, n_bins, lb_bins,
    fill_per_mille, n_overflow_bins, n_halfempty_bins, n_groups,
    bound_ok).
    """
    pk = packed.where(F.col("bin") >= 0)
    bins = pk.groupBy("grp", "bin").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n_docs")
    )
    per_bin = bins.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.when(F.col("fill") > budget, 1).otherwise(0))
        .cast("long")
        .alias("n_overflow_bins"),
        F.sum(F.when(F.col("fill") * 2 <= budget, 1).otherwise(0))
        .cast("long")
        .alias("n_halfempty_bins"),
        F.count_distinct(F.col("grp")).cast("long").alias("n_groups"),
    )
    docs = packed.agg(
        F.sum(F.when(F.col("bin") >= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs"),
        F.sum(F.when(F.col("bin") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_overlong"),
        F.coalesce(
            F.sum(F.when(F.col("bin") >= 0, F.col("n_tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("total_tokens"),
    )
    return docs.crossJoin(per_bin).select(
        "n_docs",
        "n_overlong",
        "total_tokens",
        "n_bins",
        F.expr(f"(total_tokens + {budget - 1}) div {budget}").alias("lb_bins"),
        F.when(
            F.col("n_bins") > 0,
            F.expr(f"total_tokens * 1000 div (n_bins * {budget})"),
        ).alias("fill_per_mille"),
        "n_overflow_bins",
        "n_halfempty_bins",
        "n_groups",
        (
            (F.col("n_overflow_bins") == 0)
            & (F.col("n_halfempty_bins") <= F.col("n_groups"))
        ).alias("bound_ok"),
    )
