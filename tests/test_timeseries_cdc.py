"""Unit tests for the CDC merge, time-series, fuzzy-join, sampling, and
stats operators added in round 3. Small hand-built frames with known
answers; the oracle gate covers the testdata-scale behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from sutro_spark.operators.cdc import latest_changes, merge_upsert
from sutro_spark.operators.joins import fuzzy_join
from sutro_spark.operators.timeseries import (
    funnel_stages,
    resample_ffill,
    retention_cohorts,
)
from sutro_spark.functions.sampling import weighted_topk
from sutro_spark.functions.stats import winsorize, zscore_outliers


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k bigint, s string, x double"
    )


def test_merge_upsert_latest_wins(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            (2, "b", 99.0, "U", 2),  # winner for k=2
            (2, "b", 55.0, "U", 1),  # stale — must lose
            (3, "c", 30.0, "D", 1),  # delete k=3
            (4, "d", 40.0, "I", 1),  # insert new k=4
        ],
        "k bigint, s string, x double, op string, v int",
    )
    out = {r["k"]: r["x"] for r in merge_upsert(base, changes, ["k"], order_column="v").collect()}
    assert out == {1: 10.0, 2: 99.0, 4: 40.0}


def test_latest_changes_tie_break_deterministic(spark):
    changes = spark.createDataFrame(
        [(1, "D", 1), (1, "U", 1)], "k bigint, op string, v int"
    )
    # same version: op desc → 'U' beats 'D', deterministically
    got = latest_changes(changes, ["k"], order_column="v").collect()
    assert len(got) == 1 and got[0]["op"] == "U"


def test_resample_ffill_gaps(spark):
    ev = spark.createDataFrame(
        [(1, 0, 1.0), (1, 7200, 2.0)], "user_id bigint, sec bigint, value double"
    )
    rows = {
        r["bucket"]: (r["n_events"], r["sum_cents"], r["filled_cents"])
        for r in resample_ffill(ev, bucket_seconds=3600).collect()
    }
    # bucket 3600 is a gap: zero events, zero sum, forward-filled 100
    assert rows == {0: (1, 100, 100), 3600: (0, 0, 100), 7200: (1, 200, 200)}


def test_funnel_requires_order(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),  # full funnel
            (2, 10, "click"), (2, 20, "signup"),  # click BEFORE signup → stops at 1
            (3, 5, "signup"), (3, 6, "purchase"),  # no click → stops at 1
        ],
        "user_id bigint, sec bigint, event_type string",
    )
    out = {r["stage"]: r["n_users"] for r in
           funnel_stages(ev, ["signup", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 1, 3: 1}


def test_retention_offsets(spark):
    day = 86400
    ev = spark.createDataFrame(
        [(1, 0), (1, day), (1, 3 * day), (2, day)], "user_id bigint, sec bigint"
    )
    out = {(r["cohort"], r["offset"]): r["n_users"] for r in
           retention_cohorts(ev, period_seconds=day).collect()}
    assert out == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (day, 0): 1}


def test_fuzzy_join_blocked_pairs(spark):
    left = spark.createDataFrame([(1, "kitten"), (2, "apple")], "id bigint, a string")
    right = spark.createDataFrame(
        [(10, "kitte"), (11, "sitting"), (12, "zzz")], "rid bigint, b string"
    )
    out = {(r["id"], r["rid"]): r["distance"] for r in
           fuzzy_join(left, right, left_text="a", right_text="b", max_distance=2).collect()}
    # kitten→kitte d=1 (same prefix, |Δlen|=1); kitten→sitting d=3 excluded;
    # prefix blocking also rules out cross-prefix pairs
    assert out == {(1, 10): 1}


def test_weighted_topk_prefers_heavy(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 50 else 1000) for i in range(100)], "doc_id bigint, w bigint"
    )
    got = weighted_topk(df, "doc_id", "w", 10)
    rows = got.collect()
    assert len(rows) == 10
    heavy = sum(1 for r in rows if r["w"] == 1000)
    assert heavy >= 8  # weight-1000 rows ~1000× likelier
    # deterministic across invocations
    again = weighted_topk(df, "doc_id", "w", 10).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)


def test_weighted_topk_rejects_nonpositive_weights(spark):
    import pytest

    bad = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 3)], "doc_id bigint, w bigint"
    )
    with pytest.raises(Exception, match="strictly positive"):
        weighted_topk(bad, "doc_id", "w", 2).collect()
    null_w = spark.createDataFrame(
        [(1, 5), (2, None)], "doc_id bigint, w bigint"
    )
    with pytest.raises(Exception, match="strictly positive"):
        weighted_topk(null_w, "doc_id", "w", 2).collect()
    # hash bucket 0 must not produce priority 0: every priority is
    # strictly positive, so no row is unconditionally sampled
    ok = spark.createDataFrame(
        [(i, 7) for i in range(1000)], "doc_id bigint, w bigint"
    )
    from sutro_spark.functions.sampling import _weighted_priority

    mn = (
        ok.select(_weighted_priority("doc_id", "w", salt="weighted", buckets=3).alias("p"))
        .agg(F.min("p").alias("m"))
        .collect()[0]["m"]
    )
    assert mn > 0.0


def test_winsorize_clips_to_group_bounds(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "grp string, x double"
    )
    out = winsorize(df, "x", "grp", lo=0.05, hi=0.95)
    xs = [r["clipped"] for r in out.collect()]
    assert min(xs) == 5.95 and max(xs) == 95.05  # (n-1)*p interpolation
    assert len(xs) == 100


def test_zscore_flags_planted_outlier(spark):
    rows = [(i, "g", 10.0) for i in range(99)] + [(99, "g", 1000.0)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = zscore_outliers(df, "v", "grp", "id", threshold=3.0).collect()
    assert [r["id"] for r in out] == [99]


def test_fuzzy_join_plan_no_cartesian(spark):
    left = spark.createDataFrame([(1, "alpha")], "id bigint, a string")
    right = spark.createDataFrame([(2, "alphb")], "rid bigint, b string")
    out = fuzzy_join(left, right, left_text="a", right_text="b", max_distance=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert out.collect()[0]["distance"] == 1


def test_snapshot_diff_classifies(spark):
    from sutro_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, payload string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k bigint, payload string"
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged → absent


def test_scd2_history_compresses_and_chains(spark):
    from datetime import datetime

    from sutro_spark.operators.cdc import scd2_history

    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    rows = [
        (1, t(1), "bronze"),
        (1, t(2), "bronze"),   # re-assertion: compresses away
        (1, t(3), "silver"),
        (1, t(5), "gold"),
        (2, t(4), "gold"),
        (1, t(3), "silver"),   # exact duplicate: deduped
    ]
    df = spark.createDataFrame(rows, ["entity", "ts", "state"])
    got = {
        (r["entity"], r["version"]): r
        for r in scd2_history(df).collect()
    }
    assert len(got) == 4  # 3 episodes for entity 1, 1 for entity 2
    e11, e12, e13 = got[(1, 1)], got[(1, 2)], got[(1, 3)]
    assert [e11["state"], e12["state"], e13["state"]] == [
        "bronze", "silver", "gold"
    ]
    # half-open chain: each valid_to is the next valid_from, no gaps
    assert e11["valid_from"] == t(1) and e11["valid_to"] == t(3)
    assert e12["valid_from"] == t(3) and e12["valid_to"] == t(5)
    assert e13["valid_to"] is None and e13["is_current"]
    assert not e11["is_current"] and not e12["is_current"]
    assert got[(2, 1)]["is_current"]


def test_scd2_history_null_observations_dropped(spark):
    from datetime import datetime

    from sutro_spark.operators.cdc import scd2_history

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), None),
            (1, datetime(2024, 1, 2), "a"),
            (1, None, "ghost"),
        ],
        ["entity", "ts", "state"],
    )
    rows = scd2_history(df).collect()
    assert len(rows) == 1
    assert rows[0]["state"] == "a" and rows[0]["version"] == 1
