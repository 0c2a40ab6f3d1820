"""Temporal joins: as-of and range (operators/joins.py)."""

from pyspark.sql import functions as F

from sutro_spark.operators.joins import asof_join, range_join


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3"), (3, 5, "t4")],
        "key long, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 101.0), (1, 20, 102.0), (2, 20, 200.0)],
        "key long, q long, px double",
    )
    return trades, quotes


def test_asof_join_left_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on="key", left_ts="t", right_ts="q", value_columns=["px"]
    )
    got = {r["trade"]: r["px"] for r in out.collect()}
    # t1@10 → quote@8; t2@20 → quote@20 (inclusive); t3@15 → none prior
    assert got == {"t1": 100.0, "t2": 102.0, "t3": None, "t4": None}


def test_asof_join_inner_drops_unmatched(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on="key", left_ts="t", right_ts="q",
        value_columns=["px"], how="inner",
    )
    assert {r["trade"] for r in out.collect()} == {"t1", "t2"}


def test_range_join_window_pairs(spark):
    trades, quotes = _frames(spark)
    out = range_join(trades, quotes, on="key", left_ts="t", right_ts="q", window=10)
    pairs = {(r["trade"], r["q"]) for r in out.collect()}
    # [t, t+10): t1@10 → quotes 15; t2@20 → quote 20; t3@15 → quote 20
    assert pairs == {("t1", 15), ("t2", 20), ("t3", 20)}


def test_range_join_matches_inequality_join(spark, sf_dir):
    from sutro_spark.streaming.progress import epoch_seconds

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select(
        "user_id", epoch_seconds(raw, "ts").alias("sec"), "event_id"
    ).limit(2000)
    a = ev.select("user_id", F.col("sec").alias("a_sec"), F.col("event_id").alias("a_id"))
    b = ev.select("user_id", F.col("sec").alias("b_sec"), F.col("event_id").alias("b_id"))
    fast = range_join(a, b, on="user_id", left_ts="a_sec", right_ts="b_sec", window=600)
    slow = a.join(b, "user_id").where(
        (F.col("b_sec") >= F.col("a_sec")) & (F.col("b_sec") < F.col("a_sec") + 600)
    )
    assert fast.count() == slow.count()
    assert fast.exceptAll(slow).count() == 0


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [("k", 10, "a"), ("k", 50, "b"), ("k", 100, "c")], "key string, t long, tag string"
    )
    right = spark.createDataFrame(
        [("k", 12, 1.0), ("k", 60, 2.0)], "key string, q long, v double"
    )
    fwd = {r["tag"]: r["v"] for r in asof_join(
        left, right, on="key", left_ts="t", right_ts="q",
        value_columns=["v"], direction="forward",
    ).collect()}
    # a@10 → q12; b@50 → q60; c@100 → nothing ahead
    assert fwd == {"a": 1.0, "b": 2.0, "c": None}

    tol = {r["tag"]: r["v"] for r in asof_join(
        left, right, on="key", left_ts="t", right_ts="q",
        value_columns=["v"], direction="forward", tolerance=5,
    ).collect()}
    # b@50 → q60 is 10 away > 5 → null
    assert tol == {"a": 1.0, "b": None, "c": None}

    back_tol = {r["tag"]: r["v"] for r in asof_join(
        left, right, on="key", left_ts="t", right_ts="q",
        value_columns=["v"], direction="backward", tolerance=5,
    ).collect()}
    # a@10: no prior within 5 (q12 is future); b@50: q12 is 38 back > 5;
    # c@100: q60 is 40 back > 5
    assert back_tol == {"a": None, "b": None, "c": None}

    inclusive_probe = {r["tag"]: r["v"] for r in asof_join(
        left.where(F.col("t") == 50),
        spark.createDataFrame([("k", 50, 9.0)], "key string, q long, v double"),
        on="key", left_ts="t", right_ts="q",
        value_columns=["v"], direction="forward",
    ).collect()}
    assert inclusive_probe == {"b": 9.0}  # equal ts matches in forward mode too


def test_asof_nullable_value_columns_come_from_matched_row(spark):
    """merge_asof parity: the matched (nearest) right row's values are
    emitted as-is — a NULL value in that row must NOT be replaced by an
    older row's value, and the tolerance gate must judge the matched
    row's timestamp, not mix rows."""
    left = spark.createDataFrame([("k", 100, "x")], "key string, t long, tag string")
    right = spark.createDataFrame(
        [("k", 10, 7.0), ("k", 99, None)], "key string, q long, v double"
    )
    # no tolerance: nearest-prior row is q99 whose v is NULL → NULL
    plain = asof_join(
        left, right, on="key", left_ts="t", right_ts="q", value_columns=["v"]
    ).collect()
    assert plain[0]["v"] is None
    # tolerance=5 covers q99 but not q10: the old bug carried v=7.0 from
    # q10 while taking the timestamp from q99, emitting an out-of-tolerance
    # value. Correct answer is NULL.
    tol = asof_join(
        left, right, on="key", left_ts="t", right_ts="q",
        value_columns=["v"], tolerance=5,
    ).collect()
    assert tol[0]["v"] is None
    # two value columns: both must come from the same matched row
    right2 = spark.createDataFrame(
        [("k", 10, 7.0, "old"), ("k", 99, None, "new")],
        "key string, q long, v double, lbl string",
    )
    both = asof_join(
        left, right2, on="key", left_ts="t", right_ts="q",
        value_columns=["v", "lbl"],
    ).collect()
    assert both[0]["v"] is None and both[0]["lbl"] == "new"


def test_sorted_neighborhood_finds_cross_block_match(spark):
    from sutro_spark.operators.joins import sorted_neighborhood_pairs

    # "smith jon"/"smith john" sort adjacent though a first-letter
    # blocking key would separate neither — and "smyth john" would be
    # MISSED by blocking on the first 3 chars ("smi" vs "smy") but is
    # within the sorted window here.
    df = spark.createDataFrame(
        [(1, "smith john"), (2, "smith jon"), (3, "smyth john"),
         (4, "zzz abc"), (5, "aaa")],
        ["rid", "name"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in sorted_neighborhood_pairs(
            df, "name", "rid", window=2, max_edit=2
        ).collect()
    }
    assert pairs == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_sorted_neighborhood_window_bounds_candidates(spark):
    from sutro_spark.operators.joins import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(i, f"k{i:03d}") for i in range(10)], ["rid", "name"]
    )
    out = sorted_neighborhood_pairs(df, "name", "rid", window=3)
    # exactly sum over gaps 1..3 of (n - gap) pairs, all gaps <= 3
    rows = out.collect()
    assert len(rows) == (10 - 1) + (10 - 2) + (10 - 3)
    assert all(1 <= r["rank_gap"] <= 3 for r in rows)


def test_sorted_neighborhood_validation(spark):
    import pytest

    from sutro_spark.operators.joins import sorted_neighborhood_pairs

    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(None, "k", "id", window=0)
