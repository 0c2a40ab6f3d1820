"""Per-row observability traces (SURVEY.md §2.7 O1-O4).

Reference (/root/reference/sutro/observability.py): one trace record per
input row with a deterministic id derived from (job_id, row_index),
created "open" at submit time and completed later by re-deriving the
same ids and attaching outputs plus per-row token estimates
(total_tokens // num_rows, observability.py:173-185).

Spark mapping: traces are a DataFrame keyed by (job_id, __row_id) with
trace_id = sha2(job_id || '-' || row_id) — deterministic like the
reference's uuid5, so completion is a plain equi-join, never a lookup
service. At scale this is an append-only parquet table partitioned by
job_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sutro_spark.sources.ingest import ROW_ID, with_row_id


def trace_id_col(job_id: str) -> F.Column:
    return F.sha2(F.concat(F.lit(f"{job_id}-"), F.col(ROW_ID).cast("string")), 256)


def create_traces(df: DataFrame, job_id: str, prompt_column: str) -> DataFrame:
    """O1 — open one trace per input row (deterministic ids, no state)."""
    src = with_row_id(df)
    return src.select(
        F.lit(job_id).alias("job_id"),
        F.col(ROW_ID).alias("row_id"),
        trace_id_col(job_id).alias("trace_id"),
        F.col(prompt_column).alias("inputs"),
        F.current_timestamp().alias("start_ts"),
        F.lit(None).cast("timestamp").alias("end_ts"),
        F.lit(None).cast("string").alias("outputs"),
        F.lit(None).cast("long").alias("tokens_estimate"),
    )


def complete_traces(
    traces: DataFrame,
    results: DataFrame,
    job_id: str,
    output_column: str = "outputs",
    total_tokens: int | None = None,
) -> DataFrame:
    """O2 — reattach by the deterministic id and fill outputs + per-row
    token estimate (reference: integer division of the job total across
    rows, observability.py:173-185)."""
    res = with_row_id(results)
    n = res.count()
    per_row = (total_tokens // n) if (total_tokens and n) else None
    out = res.select(
        F.col(ROW_ID).alias("row_id"),
        F.col(output_column).cast("string").alias("__new_outputs"),
    )
    joined = traces.where(F.col("job_id") == job_id).join(out, on="row_id", how="left")
    return joined.select(
        "job_id",
        "row_id",
        "trace_id",
        "inputs",
        "start_ts",
        F.current_timestamp().alias("end_ts"),
        F.col("__new_outputs").alias("outputs"),
        F.lit(per_row).cast("long").alias("tokens_estimate"),
    )


def open_traces(traces: DataFrame) -> DataFrame:
    """O3 — probe for traces still open (end_ts null)."""
    return traces.where(F.col("end_ts").isNull())
