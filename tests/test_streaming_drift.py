"""Streaming drift monitor state == batch histogram_drift(range_on=
'old') over everything ingested."""

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


def test_streaming_drift_equals_batch(spark, tmp_path):
    from sutro_spark.functions.stats import histogram_drift
    from sutro_spark.streaming.drift import (
        drift_from_counts,
        reference_histogram,
        streaming_bin_counts,
    )

    reference = spark.createDataFrame(
        [(float(v),) for v in range(0, 1000, 7)], ["v"]
    )
    batches = [
        [(float(v),) for v in range(0, 300, 5)],
        [(float(v),) for v in range(300, 600, 3)],
        [(float(v),) for v in range(600, 1400, 11)],  # mass past the range
    ]
    schema = "v double"
    src = _write_batches(spark, tmp_path, batches, schema)

    rng, ref_counts = reference_histogram(reference, "v", bins=10)
    rng = rng.localCheckpoint(eager=True)  # freeze: every batch, same bins
    ref_counts = ref_counts.localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_bin_counts(stream, rng, "v")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("drift_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = spark.table("drift_state")
    got = drift_from_counts(state, ref_counts).first()

    all_new = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    want = histogram_drift(reference, all_new, "v", bins=10, range_on="old").first()
    assert got["drift_milli"] == want["drift_milli"]
    assert got["l1_scaled"] == want["l1_scaled"]
    assert (got["n_old"], got["n_new"]) == (want["n_old"], want["n_new"])
    assert got["drift_milli"] > 0  # the shifted stream is visibly off


def test_below_range_mass_floor_bins(spark):
    """Below-range values get their own NEGATIVE bins (floor
    semantics): a stream shifted wholly below the frozen reference
    range must NOT collapse into the reference's bin 0 — trunc-toward-
    zero would map (lo-w, lo) onto bin 0 and underestimate drift."""
    from sutro_spark.functions.stats import histogram_drift
    from sutro_spark.streaming.drift import (
        drift_from_counts,
        reference_histogram,
        streaming_bin_counts,
    )

    # reference occupies [100, 199] cents-scale; 10 bins of width 10
    reference = spark.createDataFrame(
        [(v / 100.0,) for v in range(100, 200)], ["v"]
    )
    rng, ref_counts = reference_histogram(reference, "v", bins=10)
    row = rng.first()
    assert (row["lo"], row["w"]) == (100, 10)

    # new data wholly below range: cents 95 (in (lo-w, lo) -> bin -1)
    # and cents 75 (-> bin -3, floor(-25/10) = -3, NOT trunc's -2)
    new = spark.createDataFrame([(0.95,), (0.75,)], ["v"])
    bins = {
        r["bin"]: r["c_new"]
        for r in streaming_bin_counts(new, rng, "v").collect()
    }
    assert bins == {-1: 1, -3: 1}

    # disjoint histograms -> maximal drift (2000 milli-L1), and the
    # batch op under range_on="old" agrees exactly
    got = drift_from_counts(
        streaming_bin_counts(new, rng, "v"), ref_counts
    ).first()
    want = histogram_drift(
        reference, new, "v", bins=10, range_on="old"
    ).first()
    assert got["drift_milli"] == want["drift_milli"] == 2000
    assert got["l1_scaled"] == want["l1_scaled"]


def test_streaming_psi_equals_batch(spark, tmp_path):
    """psi_from_counts over the stream's final frozen-bin state ==
    psi_drift(reference, everything_ingested, range_on='old'),
    including the out-of-range mass rule (batch 3 extends past the
    reference range, so above-range bins carry PSI mass)."""
    from sutro_spark.functions.stats import psi_drift
    from sutro_spark.streaming.drift import (
        psi_from_counts,
        reference_histogram,
        streaming_bin_counts,
    )

    reference = spark.createDataFrame(
        [(float(v),) for v in range(0, 1000, 7)], ["v"]
    )
    batches = [
        [(float(v),) for v in range(0, 300, 5)],
        [(float(v),) for v in range(300, 600, 3)],
        [(float(v),) for v in range(600, 1400, 11)],  # mass past the range
    ]
    schema = "v double"
    src = _write_batches(spark, tmp_path, batches, schema)

    rng, ref_counts = reference_histogram(reference, "v", bins=10)
    rng = rng.localCheckpoint(eager=True)
    ref_counts = ref_counts.localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_bin_counts(stream, rng, "v")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("psi_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = psi_from_counts(spark.table("psi_state"), ref_counts).first()
    all_new = spark.createDataFrame([r for b in batches for r in b], schema)
    want = psi_drift(reference, all_new, "v", bins=10, range_on="old").first()
    for c in ("n_old", "n_new", "n_bins_observed", "psi_nano", "band"):
        assert got[c] == want[c], c
    assert got["psi_log2"] == want["psi_log2"]
    assert got["psi_nano"] > 0  # the shifted stream is visibly off


def test_psi_from_counts_identical_shape_near_zero(spark):
    """Same shape at the same volume -> psi_nano 0, band stable."""
    from sutro_spark.streaming.drift import psi_from_counts

    ref = spark.createDataFrame([(0, 10), (1, 20)], ["bin", "c_ref"])
    new = spark.createDataFrame([(0, 10), (1, 20)], ["bin", "c_new"])
    row = psi_from_counts(new, ref).first()
    assert row["psi_nano"] == 0
    assert row["band"] == "stable"


def test_drift_from_counts_identical_histograms(spark):
    from sutro_spark.streaming.drift import drift_from_counts

    ref = spark.createDataFrame([(0, 10), (1, 20)], ["bin", "c_ref"])
    new = spark.createDataFrame([(0, 1), (1, 2)], ["bin", "c_new"])
    # same SHAPE at different volume: proportions equal -> zero drift
    assert drift_from_counts(new, ref).first()["drift_milli"] == 0
