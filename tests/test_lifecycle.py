"""Job lifecycle, cost estimation, traces, progress, streaming, CLI."""

import time

import pytest
from pyspark.sql import functions as F

from sutro_spark.cli import format_jobs_table
from sutro_spark.observability import complete_traces, create_traces, open_traces
from sutro_spark.operators.results import read_result_cache, write_result_cache
from sutro_spark.operators.transform import llm_transform
from sutro_spark.plans.cost import estimate_cost
from sutro_spark.plans.jobs import JobRegistry, JobStatus
from sutro_spark.streaming.progress import (
    ProgressTracker,
    streaming_event_stats,
    windowed_event_stats,
)


def test_job_submit_await_results(spark, documents):
    reg = JobRegistry(spark)
    out = llm_transform(documents, "text")
    job_id = reg.submit(out, name="test-job", model="stub-echo")
    res = reg.await_job_completion(job_id, timeout=120)
    assert reg.get_job_status(job_id) is JobStatus.SUCCEEDED
    assert res is not None and res.count() == documents.count()
    job = reg.jobs[job_id]
    assert job.rows_completed == documents.count()
    assert job.datetime_completed is not None


def test_job_durable_materialization_and_progress(spark, documents, tmp_path, monkeypatch):
    monkeypatch.setenv("SUTRO_SPARK_CACHE", str(tmp_path))
    reg = JobRegistry(spark)
    acc = reg.make_progress_accumulator()
    out = llm_transform(documents, "text", progress_accumulator=acc)
    job_id = reg.submit(out, name="durable", durable=True, progress_accumulator=acc)
    res = reg.await_job_completion(job_id, timeout=120)
    n = documents.count()
    assert res.count() == n
    assert acc.value >= n  # every batch reported progress
    # durable: results live in the parquet cache, not executor memory
    from sutro_spark.operators.results import cache_path
    import os

    assert os.path.isdir(cache_path(job_id))


def test_job_validation_and_failure(spark, documents):
    reg = JobRegistry(spark)
    with pytest.raises(ValueError, match="45"):
        reg.submit(documents, name="x" * 46)
    with pytest.raises(ValueError, match="512"):
        reg.submit(documents, description="x" * 513)
    # a plan that fails at execution time → FAILED with a reason
    bad = documents.withColumn("boom", F.expr("raise_error('kaboom')"))
    job_id = reg.submit(bad, name="failing")
    assert reg.await_job_completion(job_id, timeout=120) is None
    assert reg.get_job_status(job_id) is JobStatus.FAILED
    assert "kaboom" in (reg.get_failure_reason(job_id) or "")


def test_quota_check(spark):
    reg = JobRegistry(spark)
    with pytest.raises(ValueError, match="quota"):
        reg.check_quota(0, rows=10_000_000, tokens=0)
    reg.check_quota(0, rows=10, tokens=10)


def test_jobs_table_and_cli_format(spark, documents):
    reg = JobRegistry(spark)
    job_id = reg.submit(documents.limit(5), name="fmt")
    reg.await_job_completion(job_id, timeout=120)
    table = format_jobs_table(reg.jobs_table())
    row = table.first()
    assert row["job_id"] == job_id
    assert row["cost"].startswith("$")
    assert row["created"]  # formatted string


def test_cost_estimate_prefix_sample(spark, documents):
    est = estimate_cost(documents, "text", model="stub-echo")
    assert est["rows"] == documents.count()
    assert est["sampled_rows"] <= est["rows"]
    assert est["input_tokens"] > 0 and est["cost"] > 0


def test_traces_roundtrip(spark, documents):
    docs = documents.limit(10)
    traces = create_traces(docs, "job-t1", "text")
    assert open_traces(traces).count() == 10
    results = llm_transform(docs, "text")
    done = complete_traces(traces, results, "job-t1", total_tokens=1000)
    rows = done.collect()
    assert len(rows) == 10
    assert all(r["outputs"].startswith("ECHO: ") for r in rows)
    assert all(r["tokens_estimate"] == 100 for r in rows)
    assert open_traces(done).count() == 0
    # deterministic id: same (job, row) → same trace id across builds
    t2 = {r["row_id"]: r["trace_id"] for r in create_traces(docs, "job-t1", "text").collect()}
    assert all(t2[r["row_id"]] == r["trace_id"] for r in rows)


def test_progress_monotonic():
    p = ProgressTracker(rows_total=100)
    assert p.update_rows(10) and not p.update_rows(5)  # late update ignored
    assert p.rows_completed == 10
    p.update_tokens(input_tokens=50)
    p.update_tokens(input_tokens=40)  # stale → ignored
    assert p.tokens["input_tokens"] == 50


def test_result_cache_superset_rule(spark, documents, tmp_path, monkeypatch):
    monkeypatch.setenv("SUTRO_SPARK_CACHE", str(tmp_path))
    out = llm_transform(documents.limit(5), "text")
    write_result_cache(out, "job-c1")
    hit = read_result_cache(spark, "job-c1", ["doc_id", "outputs"])
    assert hit is not None and hit.count() == 5
    miss = read_result_cache(spark, "job-c1", ["doc_id", "outputs", "not_there"])
    assert miss is None


def test_streaming_event_stats_matches_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats(events).collect()
    }
    # the raw testdata uses nanosecond timestamps (read as long nanos);
    # rewrite with a proper timestamp column for the streaming source
    from sutro_spark.streaming.progress import event_timestamp

    stream_src = str(tmp_path / "events")
    events.withColumn("ts", event_timestamp(events)).write.mode("overwrite").parquet(stream_src)
    q = (
        streaming_event_stats(spark, stream_src)
        .writeStream.format("memory")
        .queryName("evstats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from evstats").collect()
    }
    assert stream == batch
