"""Data-quality expectations (operators/validate.py)."""

import pytest

from sutro_spark.operators.validate import expect, validate


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", 100),
            (2, -5.0, "B", 100),     # violates min(0)
            (2, 3.0, "zz", None),    # duplicate id, bad regex, null fk ok
            (None, 2.0, "C", 999),   # null id, orphan fk
        ],
        "id long, price double, status string, cust long",
    )


def test_row_level_checks_one_scan(spark):
    df = _df(spark)
    out = {
        (r.column_name, r.check_name): r
        for r in validate(
            df,
            [
                expect("id", "not_null"),
                expect("price", "min", value=0),
                expect("status", "regex", pattern="^[A-Z]$"),
            ],
        ).collect()
    }
    assert out[("id", "not_null")].n_violations == 1
    assert out[("price", "min(0)")].n_violations == 1
    assert out[("status", "regex(^[A-Z]$)")].n_violations == 1
    assert all(r.n_rows == 4 for r in out.values())
    assert out[("id", "not_null")].passed == 0


def test_unique_and_foreign_key(spark):
    df = _df(spark)
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    out = {
        (r.column_name, r.check_name): r
        for r in validate(
            df,
            [
                expect("id", "unique"),
                expect("cust", "foreign_key", ref=ref, ref_column="k"),
            ],
        ).collect()
    }
    # id 2 appears twice -> 1 extra; nulls don't count toward unique
    assert out[("id", "unique")].n_violations == 1
    fk = out[("cust", "foreign_key(k)")]
    assert fk.n_rows == 3 and fk.n_violations == 1  # 999 is an orphan


def test_in_set_and_nulls_skip_bounds(spark):
    df = _df(spark)
    out = validate(df, [expect("status", "in_set", values=["A", "B", "C"])]).collect()[0]
    assert out.n_violations == 1  # only 'zz'; NULLs would be skipped


def test_all_green_passes(spark):
    df = _df(spark).where("id = 1")
    rep = validate(df, [expect("id", "not_null"), expect("id", "unique")])
    assert all(r.passed == 1 for r in rep.collect())


def test_empty_expectations_raise(spark):
    with pytest.raises(ValueError):
        validate(_df(spark), [])


def test_unknown_check_raises(spark):
    with pytest.raises(ValueError):
        validate(_df(spark), [expect("id", "between")])


def test_table_profile_exact_counts(spark):
    from sutro_spark.operators.validate import table_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, None), (None, "c")], "id long, s string"
    )
    out = {r.column_name: r for r in table_profile(df).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 1
    assert out["id"].n_distinct == 2 and out["id"].min_value == "1"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].max_value == "c"


def test_table_profile_all_null_column(spark):
    from sutro_spark.operators.validate import table_profile

    df = spark.createDataFrame([(None,), (None,)], "x string")
    r = table_profile(df).collect()[0]
    assert r.n_nulls == 2 and r.n_distinct == 0
    assert r.min_value == "" and r.max_value == ""


def test_json_key_profile_counts_and_presence(spark):
    from sutro_spark.operators.validate import json_key_profile

    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x"}',),
            ('{"a": 2.5, "c": -3}',),
            ('{"a": "not a number"}',),
            (None,),               # counts in the denominator
            ("not json at all",),  # ditto
        ],
        ["props"],
    )
    rows = {r["key"]: r for r in json_key_profile(df, "props").collect()}
    assert set(rows) == {"a", "b", "c"}
    assert (rows["a"]["n_present"], rows["a"]["n_numeric"]) == (3, 2)
    assert (rows["b"]["n_present"], rows["b"]["n_numeric"]) == (1, 0)
    assert (rows["c"]["n_present"], rows["c"]["n_numeric"]) == (1, 1)
    # presence over ALL rows (5), including the broken ones
    assert rows["a"]["presence_milli"] == 600
    assert rows["b"]["presence_milli"] == 200
