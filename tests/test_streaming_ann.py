"""Streaming IVF-BQ append (streaming/ann.py): stream == batch at
frozen parameters, and the partitioned serving layout prunes."""

import os

from pyspark.sql import functions as F

from sutro_spark.operators.similarity import ivf_bq_index, ivf_bq_route
from sutro_spark.streaming.ann import read_codes, streaming_ivf_append


def _write_vector_batches(spark, emb, tmp_path, mods):
    """Split the held-out quarter into one parquet file per mod class,
    mtime-ordered so Spark's file source replays them as batches."""
    src = tmp_path / "src"
    src.mkdir()
    for i, m in enumerate(mods):
        df = emb.where((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 12 == m))
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"b{i}"))
        part = next(
            p for p in os.listdir(tmp_path / f"b{i}") if p.endswith(".parquet")
        )
        dst = src / f"{i}.parquet"
        os.rename(tmp_path / f"b{i}" / part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def test_streaming_append_equals_batch_route(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 4 != 0)
    _, cents, thr = ivf_bq_index(base, coarse_k=8, coarse_iters=2)

    src = _write_vector_batches(spark, emb, tmp_path, mods=[0, 4, 8])
    codes_dir = str(tmp_path / "codes")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_ivf_append(stream, codes_dir, cents, thr)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in read_codes(spark, codes_dir).collect())
    want = sorted(
        tuple(r)
        for r in ivf_bq_route(
            emb.where(F.col("vec_id") % 4 == 0), cents, thr
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streamed_codes_dir_is_cluster_partitioned(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 4 != 0)
    _, cents, thr = ivf_bq_index(base, coarse_k=8, coarse_iters=2)
    src = _write_vector_batches(spark, emb, tmp_path, mods=[0])
    codes_dir = str(tmp_path / "codes")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_ivf_append(stream, codes_dir, cents, thr)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # serving layout: hive-style cluster= directories on disk, and a
    # cluster-filtered read prunes at the scan (PartitionFilters —
    # the test_scale_layout discipline)
    assert any(d.startswith("cluster=") for d in os.listdir(codes_dir))
    one = read_codes(spark, codes_dir).where(F.col("cluster") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cluster" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
