"""Streaming online perceptron == sequential driver replay of the same
per-batch update (the strongest equality a single-pass online
algorithm admits)."""

import os

from pyspark.sql import functions as F


def _write_batches(spark, tmp_path, batches, schema):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"b{i}"))
        part = next(
            p for p in os.listdir(tmp_path / f"b{i}") if p.endswith(".parquet")
        )
        dst = src / f"{i}.parquet"
        os.rename(tmp_path / f"b{i}" / part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def test_streaming_scorer_equals_sequential_replay(spark, tmp_path):
    from sutro_spark.operators.quality import hashed_token_features
    from sutro_spark.streaming.quality import (
        current_weights,
        streaming_scorer_update,
    )

    batches = [
        [(1, "good clean prose", "en"), (2, "zzz spam garbage", "de")],
        [(3, "clean structured prose here", "en"), (4, "spam click zzz", "fr")],
        [(5, "prose with meaning", "en"), (6, "garbage noise click", "zh")],
        # within-batch bucket sharing with opposite labels: only the
        # SYNCHRONOUS (batch-start-weights) update semantics reproduce
        # this batch — a doc-by-doc replay would diverge here
        [(7, "prose spam prose spam", "en"), (8, "prose spam garbage", "de")],
    ]
    schema = "doc_id long, text string, lang string"
    src = _write_batches(spark, tmp_path, batches, schema)
    label = F.when(F.col("lang") == "en", 1).otherwise(-1)

    model_dir = str(tmp_path / "model")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_scorer_update(stream, model_dir, label, dim=128)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        r.bucket: r.w
        for r in current_weights(spark, model_dir, dim=128).collect()
        if r.w != 0
    }

    # sequential replay: identical per-batch math, driver-side loop.
    # IMPORTANT: the update is SYNCHRONOUS within a batch — every doc
    # is scored under the batch-START weights and the corrections are
    # applied as one sum (mini-batch perceptron), exactly like the
    # distributed version's single groupBy
    w = {}
    for rows in batches:
        df = spark.createDataFrame(rows, schema)
        feats = hashed_token_features(df, dim=128).collect()
        labels = {r.doc_id: (1 if r.lang == "en" else -1) for r in df.collect()}
        by_doc = {}
        for r in feats:
            by_doc.setdefault(r.id, []).append((r.bucket, r.cnt))
        deltas = {}
        for doc, fs in by_doc.items():
            s = sum(cnt * w.get(b, 0) for b, cnt in fs)
            y = labels[doc]
            err = 1 if (y == 1 and s <= 0) else (-1 if (y == -1 and s > 0) else 0)
            if err:
                for b, cnt in fs:
                    deltas[b] = deltas.get(b, 0) + err * cnt
        for b, d in deltas.items():
            w[b] = w.get(b, 0) + d
    expected = {b: v for b, v in w.items() if v != 0}
    assert got == expected
    assert expected  # the model actually learned something


def test_streaming_scorer_empty_model_reader(spark, tmp_path):
    from sutro_spark.streaming.quality import current_weights

    w = current_weights(spark, str(tmp_path / "nope"))
    assert w.count() == 0
    assert w.columns == ["bucket", "w"]
