"""Streaming online first-fit packing (streaming/packing) — parity
with a sequential Python replay over the same micro-batch sequence,
plus the bounded-state and over-budget contracts."""

import glob
import os

from pyspark.sql import functions as F

from sutro_spark.functions.sampling import hash_bucket
from sutro_spark.streaming.packing import streaming_ffd


def _replay(files, spark, shard_of, budget, open_bins):
    """Pure-Python replay: per file (Spark's batch order), per shard,
    docs in id order, online first-fit with the close-fullest rule."""
    state = {}
    rows = {}
    for f in files:
        batch = sorted(
            (int(r["doc_id"]), r["text"])
            for r in spark.read.parquet(f).collect()
        )
        per_shard = {}
        for doc, text in batch:
            toks = len([w for w in (text or "").split() if w])
            per_shard.setdefault(shard_of[doc], []).append((doc, toks))
        for s, docs in per_shard.items():
            bins, nxt = state.get(s, ([], 0))
            bins = list(bins)
            for doc, tok in docs:
                if tok > budget:
                    rows[(s, doc)] = (tok, -1)
                    continue
                placed = None
                for i, (b, fl) in enumerate(bins):
                    if fl + tok <= budget:
                        bins[i] = (b, fl + tok)
                        placed = b
                        break
                if placed is None:
                    placed = nxt
                    bins.append((nxt, tok))
                    nxt += 1
                    if len(bins) > open_bins:
                        bins.remove(max(bins, key=lambda t: (t[1], -t[0])))
                rows[(s, doc)] = (tok, placed)
            state[s] = (bins, nxt)
    return rows


def test_streaming_ffd_matches_sequential_replay(spark, sf_dir, tmp_path):
    budget, shards, open_bins = 96, 2, 3
    raw = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(120)
    )
    src = str(tmp_path / "ffd_src")
    for i in range(3):  # three sequential micro-batches, one file each
        raw.where((F.col("doc_id") % 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_ffd(
                stream,
                budget=budget,
                shards=shards,
                open_bins=open_bins,
            )
            .writeStream.format("memory")
            .queryName("ffd_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ffd_ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {
        (r["shard"], r["id"]): (r["n_tokens"], r["bin"])
        for r in spark.sql("select * from ffd_stream").collect()
    }

    # FileStreamSource orders by modification time (ms), path ties —
    # mirror that exactly so the replay sees Spark's batch order
    files = sorted(
        glob.glob(f"{src}/part-*.parquet"),
        key=lambda p: (int(os.path.getmtime(p) * 1000), p),
    )
    shard_of = {
        int(r["doc_id"]): r["shard"]
        for r in raw.select(
            "doc_id",
            hash_bucket(
                F.col("doc_id").cast("string"), salt="ffd", buckets=shards
            )
            .cast("long")
            .alias("shard"),
        ).collect()
    }
    expected = _replay(files, spark, shard_of, budget, open_bins)
    assert got == expected
    # every packed bin respects the budget; assignment is exhaustive
    fills = {}
    for (s, _doc), (tok, b) in got.items():
        if b >= 0:
            fills[(s, b)] = fills.get((s, b), 0) + tok
    assert fills and all(v <= budget for v in fills.values())
    assert len(got) == raw.count()


def test_streaming_ffd_state_stays_bounded(spark, sf_dir, tmp_path):
    # the open-bin set never exceeds open_bins: with a tiny cap and
    # many docs, closed bins are forgotten but assignments survive in
    # the per-trigger output; distinct bins >> open_bins proves churn.
    budget, open_bins = 96, 2
    raw = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(200)
    )
    src = str(tmp_path / "ffdb_src")
    raw.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_ffd(
            stream, budget=budget, shards=1, open_bins=open_bins
        )
        .writeStream.format("memory")
        .queryName("ffdb_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ffdb_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select * from ffdb_stream").collect()
    n_bins = len({r["bin"] for r in out if r["bin"] >= 0})
    assert n_bins > open_bins  # state cap forced closes, packing went on
    import pytest

    with pytest.raises(ValueError):
        streaming_ffd(raw, open_bins=0)
