"""Property-based checks (hypothesis): operator semantics vs a plain
Python model on adversarial strings (nulls, unicode, whitespace)."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from sutro_spark.functions.prompt import concat_prompt
from sutro_spark.functions.text import token_count
from sutro_spark.operators.unpack import unpack_json_outputs

texts = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    ),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
def test_concat_prompt_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id long, a string, b string"
    )
    out = {
        r["id"]: r["p"]
        for r in df.select("id", concat_prompt(df, ["<", "a", "|", "b", ">"]).alias("p")).collect()
    }
    for i, (a, b) in enumerate(rows):
        expected = f"<{a or ''}|{b or ''}>"
        assert out[i] == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=" \t\na bc", max_size=30), min_size=1, max_size=8))
def test_token_count_matches_python_split(spark, rows):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "id long, t string")
    out = {r["id"]: r["n"] for r in df.select("id", token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(rows):
        assert out[i] == len(t.split())


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["x", "y", "z"]),
            st.one_of(st.integers(-1000, 1000), st.text(max_size=10)),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_unpack_roundtrips_json(spark, dicts):
    import json

    # normalize: all rows carry the same key set (schema comes from row 0)
    keys = sorted({k for d in dicts for k in d})
    norm = [{k: d.get(k) for k in keys} for d in dicts]
    schema = {
        "type": "object",
        "properties": {
            k: {"type": "integer" if all(isinstance(d[k], int) or d[k] is None for d in norm) else "string"}
            for k in keys
        },
    }
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(norm)], "id long, outputs string"
    )
    out = unpack_json_outputs(df, "outputs", schema)
    got = {r["id"]: {k: r[k] for k in keys} for r in out.collect()}
    for i, d in enumerate(norm):
        for k in keys:
            expect = d[k]
            actual = got[i][k]
            if isinstance(expect, int) and not all(
                isinstance(x[k], int) or x[k] is None for x in norm
            ):
                expect = str(expect)  # mixed column coerced to string schema
            if isinstance(expect, str) and isinstance(actual, str):
                assert actual == expect
            else:
                assert actual == expect
