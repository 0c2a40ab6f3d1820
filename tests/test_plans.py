"""Plan-shape regression guards: the optimizations the engine relies on
at scale must stay visible in the physical plans."""

from pyspark.sql import functions as F

import __spark_entry__ as entry
from sutro_spark.operators.transform import llm_transform


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(entry.queries()["tpch_q1"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # only the 6 needed columns reach the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q3_uses_broadcast_joins(spark, sf_dir):
    plan = _plan(entry.queries()["tpch_q3"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_top_orders_is_topk_not_full_sort(spark, sf_dir):
    plan = _plan(entry.queries()["top_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_text_profile_stays_jvm_side(spark, sf_dir):
    # pure Catalyst expressions: no Python evaluation nodes in the plan
    plan = _plan(entry.queries()["text_profile"](spark, sf_dir))
    assert "Python" not in plan and "mapInPandas" not in plan


def test_similarity_topk_broadcasts_queries(spark, sf_dir):
    plan = _plan(entry.queries()["similarity_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_llm_transform_prompt_truncation(spark, documents):
    out = llm_transform(documents.limit(3), "text", truncate_chars=5)
    for r in out.collect():
        assert r["outputs"] == "ECHO: " + r["text"][:5].upper()


def test_llm_transform_streaming(spark, documents, tmp_path):
    # the transform is a plain mapInPandas — it must run unchanged on a
    # Structured Streaming source (continuous ingest pipelines)
    src = str(tmp_path / "docs")
    documents.limit(20).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        llm_transform(stream, "text")
        .writeStream.format("memory")
        .queryName("llm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from llm_stream").collect()
    assert len(rows) == 20
    assert all(r["outputs"].startswith("ECHO: ") for r in rows)
