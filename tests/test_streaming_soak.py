"""Bounded-state soak: ~100 micro-batches through the streaming CMS
sketch, asserting from the engine's own stateOperators metrics that
state row count saturates at the sketch's constant bound (depth*width)
instead of growing with the stream. The stream==batch equality tests
prove correctness on small fixtures; this proves the 100 TB claim —
that the state plane is O(sketch), not O(keys) or O(triggers).
"""

from pyspark.sql import functions as F

from sutro_spark.streaming.sketches import streaming_cms

DEPTH, WIDTH = 3, 64


def test_cms_state_saturates_over_100_triggers(spark, tmp_path):
    # 100 single-row-group files, one per trigger under
    # maxFilesPerTrigger=1 → ~100 micro-batches without wall-clock
    # dependence (the rate source would need real seconds per trigger)
    src = str(tmp_path / "keys")
    (
        spark.range(0, 10_000)
        .select((F.col("id") % 500).alias("k"))
        .repartition(100)
        .write.mode("overwrite")
        .parquet(src)
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_cms(stream, "k", depth=DEPTH, width=WIDTH)
            .writeStream.format("memory")
            .queryName("cms_soak")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        progresses = [
            p for p in q.recentProgress if p["stateOperators"]
        ]
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert len(progresses) >= 90  # ~one progress per file
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    bound = DEPTH * WIDTH
    # constant bound: never exceeds depth*width at ANY trigger
    assert max(totals) <= bound, (max(totals), bound)
    # saturation: with 500 keys over 192 cells every cell is hit early;
    # the back half of the run must add ZERO state rows
    half = len(totals) // 2
    assert max(totals[half:]) == totals[-1] == max(totals)
    assert len(set(totals[half:])) == 1
