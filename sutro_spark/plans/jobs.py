"""Job lifecycle / control plane (SURVEY.md §2.6 C1-C15).

Reference semantics (/root/reference/sutro/sdk.py, interfaces.py:69-91):
jobs are async units with an id, validated name/description, a priority
class, a status FSM, token/cost counters and timestamps; clients submit,
poll status every 5 s (timeout 7200 s), stream progress, cancel, and
check per-priority quotas.

Spark mapping: a driver-side registry backed by a plain dict (exposed
as a DataFrame for relational queries); execution is an async Spark
action tagged with a job group so ``cancel`` maps to
``sc.cancelJobGroup``; priorities map to FAIR scheduler pools.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum

from pyspark.sql import DataFrame, SparkSession

MAX_NAME_LEN = 45  # sdk.py:38
MAX_DESCRIPTION_LEN = 512  # sdk.py:39
POLL_INTERVAL_S = 5.0  # sdk.py:1664
DEFAULT_TIMEOUT_S = 7200.0  # sdk.py:1646


class JobStatus(str, Enum):
    """Status FSM (reference: interfaces.py:69-91)."""

    UNKNOWN = "UNKNOWN"
    QUEUED = "QUEUED"
    STARTING = "STARTING"
    RUNNING = "RUNNING"
    SUCCEEDED = "SUCCEEDED"
    CANCELLING = "CANCELLING"
    CANCELLED = "CANCELLED"
    FAILED = "FAILED"

    @property
    def is_terminal(self) -> bool:
        return self in (JobStatus.SUCCEEDED, JobStatus.CANCELLED, JobStatus.FAILED)


@dataclass
class Job:
    job_id: str
    name: str | None = None
    description: str | None = None
    model: str = "stub-echo"
    priority: int = 0  # 0 = prototyping (default), 1 = production
    status: JobStatus = JobStatus.QUEUED
    rows_total: int = 0
    rows_completed: int = 0
    input_tokens: int = 0
    output_tokens: int = 0
    cost_estimate: float = 0.0
    failure_reason: str | None = None
    datetime_created: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )
    datetime_completed: datetime | None = None


@dataclass
class Quota:
    max_rows: int
    max_tokens: int


DEFAULT_QUOTAS = {0: Quota(max_rows=5_000_000, max_tokens=2_000_000_000),
                  1: Quota(max_rows=500_000_000, max_tokens=200_000_000_000)}


class JobRegistry:
    """Driver-side job table + async execution (C1-C10)."""

    def __init__(self, spark: SparkSession, quotas: dict[int, Quota] | None = None):
        self.spark = spark
        self.jobs: dict[str, Job] = {}
        self.quotas = quotas or dict(DEFAULT_QUOTAS)
        self._threads: dict[str, threading.Thread] = {}
        self._results: dict[str, DataFrame] = {}
        self._progress: dict[str, object] = {}  # job_id → accumulator
        self._lock = threading.Lock()

    def make_progress_accumulator(self):
        """Rows-completed accumulator to thread into ``llm_transform``
        (C5 — the progress stream analog; pass to ``submit`` too)."""
        return self.spark.sparkContext.accumulator(0)

    # --- C1: submit -------------------------------------------------------
    def submit(
        self,
        df: DataFrame,
        *,
        name: str | None = None,
        description: str | None = None,
        model: str = "stub-echo",
        priority: int = 0,
        rows_total: int | None = None,
        materialize: bool = True,
        durable: bool = False,
        progress_accumulator=None,
    ) -> str:
        """Validate, register, and launch the plan as an async action in
        its own job group (cancellable). Submission is never retried —
        a failed launch surfaces immediately (reference analog:
        sdk.py:247-252, max_retries=0 on POST /batch-inference).

        ``durable=True`` materializes straight into the parquet result
        cache instead of Spark block-manager memory — the scale-safe
        setting (results can exceed cluster memory; the reference
        similarly lands results in its parquet cache, sdk.py:1233-1235).
        """
        if name is not None and len(name) > MAX_NAME_LEN:
            raise ValueError(f"name must be <= {MAX_NAME_LEN} characters")
        if description is not None and len(description) > MAX_DESCRIPTION_LEN:
            raise ValueError(f"description must be <= {MAX_DESCRIPTION_LEN} characters")
        if priority not in self.quotas:
            raise ValueError(f"unknown priority {priority}; have {sorted(self.quotas)}")
        job_id = f"job-{uuid.uuid4().hex[:12]}"
        job = Job(
            job_id=job_id,
            name=name,
            description=description,
            model=model,
            priority=priority,
            rows_total=rows_total or 0,
        )
        with self._lock:
            self.jobs[job_id] = job
            if progress_accumulator is not None:
                self._progress[job_id] = progress_accumulator

        def run() -> None:
            sc = self.spark.sparkContext
            sc.setJobGroup(job_id, name or job_id, interruptOnCancel=True)
            # C9: priority classes → FAIR scheduler pools
            sc.setLocalProperty(
                "spark.scheduler.pool", "production" if priority == 1 else "prototyping"
            )
            job.status = JobStatus.RUNNING
            try:
                if materialize and durable:
                    from sutro_spark.operators.results import cache_path

                    path = cache_path(job_id)
                    df.write.mode("overwrite").parquet(path)
                    out = self.spark.read.parquet(path)
                    n = out.count()
                elif materialize:
                    out = df.cache()
                    n = out.count()
                if materialize:
                    job.rows_completed = n
                    if not job.rows_total:
                        job.rows_total = n
                    with self._lock:
                        self._results[job_id] = out
                # Terminal transition under the lock: a cancel_job() racing
                # in after the last Spark action must win (CANCELLING →
                # CANCELLED, never SUCCEEDED).
                with self._lock:
                    if job.status == JobStatus.CANCELLING:
                        job.status = JobStatus.CANCELLED
                    else:
                        job.status = JobStatus.SUCCEEDED
            except Exception as e:  # noqa: BLE001 - failure_reason capture (C12)
                with self._lock:
                    if job.status == JobStatus.CANCELLING:
                        job.status = JobStatus.CANCELLED
                    else:
                        job.status = JobStatus.FAILED
                        job.failure_reason = str(e)[:500]
            finally:
                job.datetime_completed = datetime.now(timezone.utc)

        job.status = JobStatus.STARTING
        t = threading.Thread(target=run, name=job_id, daemon=True)
        self._threads[job_id] = t
        t.start()
        return job_id

    # --- C8: quotas pre-check --------------------------------------------
    def check_quota(self, priority: int, rows: int, tokens: int) -> None:
        q = self.quotas[priority]
        if rows > q.max_rows:
            raise ValueError(f"row quota exceeded for priority {priority}: {rows} > {q.max_rows}")
        if tokens > q.max_tokens:
            raise ValueError(
                f"token quota exceeded for priority {priority}: {tokens} > {q.max_tokens}"
            )

    # --- C2/C12: status ---------------------------------------------------
    def get_job_status(self, job_id: str) -> JobStatus:
        job = self.jobs.get(job_id)
        if job is None:
            return JobStatus.UNKNOWN
        acc = self._progress.get(job_id)
        if acc is not None and job.status is JobStatus.RUNNING:
            # live rows-completed with the monotonic-max rule (A5:
            # never move progress backwards on late/dup updates)
            if acc.value > job.rows_completed:
                job.rows_completed = acc.value
        return job.status

    def get_failure_reason(self, job_id: str) -> str | None:
        job = self.jobs.get(job_id)
        return job.failure_reason if job else None

    # --- C3: poll-await ---------------------------------------------------
    def await_job_completion(
        self,
        job_id: str,
        timeout: float = DEFAULT_TIMEOUT_S,
        poll_interval: float = POLL_INTERVAL_S,
    ) -> DataFrame | None:
        """Poll until terminal status or timeout (reference defaults:
        5 s poll, 7200 s timeout; sdk.py:1643-1718)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            status = self.get_job_status(job_id)
            if status.is_terminal:
                if status is JobStatus.SUCCEEDED:
                    return self._results.get(job_id)
                return None
            # local threads finish fast; poll finely but honor the contract
            self._threads[job_id].join(timeout=min(poll_interval, 0.05))
            if not self._threads[job_id].is_alive():
                continue
        raise TimeoutError(f"job {job_id} did not complete within {timeout}s")

    # --- C4: await start --------------------------------------------------
    def await_job_start(self, job_id: str, timeout: float = 60.0) -> JobStatus:
        deadline = time.time() + timeout
        while time.time() < deadline:
            status = self.get_job_status(job_id)
            if status in (JobStatus.RUNNING, JobStatus.STARTING) or status.is_terminal:
                return status
            time.sleep(0.02)
        raise TimeoutError(f"job {job_id} did not start within {timeout}s")

    # --- C7: cancel -------------------------------------------------------
    def cancel_job(self, job_id: str) -> None:
        job = self.jobs.get(job_id)
        if job is None:
            return
        with self._lock:
            if job.status.is_terminal:
                return
            job.status = JobStatus.CANCELLING
        self.spark.sparkContext.cancelJobGroup(job_id)

    # --- list_jobs as a DataFrame (feeds the CLI relational ops) ---------
    def jobs_table(self) -> DataFrame:
        rows = [
            (
                j.job_id,
                j.name,
                j.status.value,
                j.model,
                j.priority,
                j.rows_total,
                j.rows_completed,
                j.input_tokens,
                j.output_tokens,
                float(j.cost_estimate),
                j.datetime_created.replace(tzinfo=None),
                j.datetime_completed.replace(tzinfo=None) if j.datetime_completed else None,
            )
            for j in self.jobs.values()
        ]
        schema = (
            "job_id string, name string, status string, model string, priority int,"
            " rows_total long, rows_completed long, input_tokens long, output_tokens long,"
            " cost_estimate double, datetime_created timestamp, datetime_completed timestamp"
        )
        return self.spark.createDataFrame(rows, schema)

    def get_job_results(self, job_id: str) -> DataFrame | None:
        return self._results.get(job_id)
