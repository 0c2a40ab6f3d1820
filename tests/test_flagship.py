"""End-to-end slice: scan → row_id → prompt concat → stub llm_transform →
JSON unpack → ordered results (SURVEY.md §7 step 1)."""

import json

from pyspark.sql import functions as F

from sutro_spark.functions.prompt import concat_prompt
from sutro_spark.operators.results import order_results
from sutro_spark.operators.transform import llm_transform
from sutro_spark.operators.unpack import unpack_json_outputs
from sutro_spark.sources.ingest import ROW_ID, with_row_id


SCHEMA = {
    "type": "object",
    "properties": {
        "summary": {"type": "string"},
        "quality": {"type": "integer", "minimum": 1, "maximum": 5},
    },
}


def test_flagship_pipeline(spark, documents):
    df = with_row_id(documents, order_by=["doc_id"])
    df = df.withColumn("prompt", concat_prompt(df, ["Summarize: ", "text", " [", "lang", "]"]))
    out = llm_transform(df, "prompt", output_schema=SCHEMA, include_logprobs=True)
    out = unpack_json_outputs(out, "outputs", SCHEMA)
    res = order_results(out, "summary", include_logprobs=True)
    rows = res.limit(5).collect()
    assert len(rows) == 5
    first = rows[0]
    # stub rule: string field idx 0 = upper(prompt[0:12])
    assert first["summary"] == first["prompt"][:12].upper()
    assert 1 <= first["quality"] <= 5
    assert first["cumulative_logprobs"] == -len(first["prompt"]) / 100.0


def test_plain_generation_and_order(spark, documents):
    df = with_row_id(documents, order_by=["doc_id"])
    out = llm_transform(df, "text")
    rows = out.orderBy(ROW_ID).limit(3).collect()
    for r in rows:
        assert r["outputs"] == "ECHO: " + r["text"][:32].upper()
    ids = [r[ROW_ID] for r in rows]
    assert ids == [0, 1, 2]


def test_unpack_collision_raises(spark, documents):
    df = documents.withColumn("summary", F.lit("x"))
    out = llm_transform(df, "text", output_schema=SCHEMA)
    try:
        unpack_json_outputs(out, "outputs", SCHEMA)
        assert False, "expected collision ValueError"
    except ValueError as e:
        assert "collide" in str(e)


def test_unpack_sniffs_schema_without_declaration(spark):
    data = [(i, json.dumps({"a": i, "b": f"s{i}"})) for i in range(4)]
    df = spark.createDataFrame(data, "id long, outputs string")
    out = unpack_json_outputs(df, "outputs")
    assert set(out.columns) == {"id", "a", "b"}
    assert out.count() == 4


def test_unpack_noop_on_undecodable(spark):
    df = spark.createDataFrame([(1, "not json")], "id long, outputs string")
    out = unpack_json_outputs(df, "outputs")
    assert out.columns == ["id", "outputs"]


def test_unpack_reasoning_content_flatten(spark):
    payload = json.dumps(
        {"content": {"answer": "42", "why": "because"}, "reasoning_content": "hmm"}
    )
    df = spark.createDataFrame([(1, payload)], "id long, outputs string")
    out = unpack_json_outputs(df, "outputs")
    assert set(out.columns) == {"id", "answer", "why", "reasoning_content"}
    row = out.first()
    assert row["answer"] == "42" and row["reasoning_content"] == "hmm"
