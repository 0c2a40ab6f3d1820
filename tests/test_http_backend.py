"""HttpBackend wire-protocol tests against a fake transport — the
offline mirror of the reference's mock-patched requests suite
(/root/reference/tests/test_sdk.py:258-306): 524s never retried on
submit, retried with exponential backoff on idempotent GETs, results
fetch linearly retried, outputs positionally aligned."""

from __future__ import annotations

import pandas as pd
import pytest

from sutro_spark.operators.backends import (
    HttpBackend,
    HttpClient,
    HttpStatusError,
    RetryPolicy,
)


class FakeTransport:
    """Scripted transport: pops (status, body) per endpoint, records calls."""

    def __init__(self, script: dict[str, list[tuple[int, dict]]]):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls: list[tuple[str, str, dict | None]] = []

    def request(self, method, url, *, headers, json=None):
        endpoint = url.split("/", 3)[-1].split("/")[0]
        self.calls.append((method, url, json))
        assert headers["Authorization"].startswith("Key ")
        queue = self.script[endpoint]
        return queue.pop(0) if len(queue) > 1 else queue[0]


def _sleeps():
    log = []
    return log, log.append


def make_backend(script, **kw):
    t = FakeTransport(script)
    log, sleep = _sleeps()
    b = HttpBackend("https://api.example.test/", "k", transport=t, sleep=sleep, **kw)
    return b, t, log


def test_submit_never_retried_after_524():
    b, t, _ = make_backend({"batch-inference": [(524, {"error": "timeout"})]})
    with pytest.raises(HttpStatusError) as e:
        b.submit(b.build_payload(["x"], model="m"))
    assert e.value.status_code == 524
    assert len(t.calls) == 1  # reference: mock_post.assert_called_once()


def test_zero_retry_budget_reraises_initial_524():
    t = FakeTransport({"job-status": [(524, {})]})
    log, sleep = _sleeps()
    c = HttpClient("https://api.example.test", "k", transport=t, sleep=sleep)
    with pytest.raises(HttpStatusError):
        c.do_request("GET", "job-status/test-job", max_retries=0)
    assert len(t.calls) == 1 and log == []


def test_get_retries_after_524_with_backoff():
    t = FakeTransport({"job-status": [(524, {}), (200, {"results": "SUCCEEDED"})]})
    log, sleep = _sleeps()
    c = HttpClient("https://api.example.test", "k", transport=t, sleep=sleep)
    body = c.do_request("GET", "job-status/test-job", max_retries=1)
    assert body == {"results": "SUCCEEDED"}
    assert len(t.calls) == 2
    assert log == [1]  # reference: mock_sleep.assert_called_once_with(1)


def test_exponential_backoff_sequence_then_raise():
    t = FakeTransport({"job-status": [(524, {})]})
    log, sleep = _sleeps()
    c = HttpClient("https://api.example.test", "k", transport=t, sleep=sleep)
    with pytest.raises(HttpStatusError):
        c.do_request("GET", "job-status/j", max_retries=3)
    assert len(t.calls) == 4
    assert log == [1, 2, 4]


def test_non_524_error_never_retried():
    t = FakeTransport({"job-status": [(500, {"error": "boom"})]})
    log, sleep = _sleeps()
    c = HttpClient("https://api.example.test", "k", transport=t, sleep=sleep)
    with pytest.raises(HttpStatusError) as e:
        c.do_request("GET", "job-status/j", max_retries=5)
    assert e.value.status_code == 500
    assert len(t.calls) == 1 and log == []


def test_results_fetch_linear_retry_on_write_race():
    b, t, log = make_backend(
        {
            "job-results": [
                (404, {}),
                (404, {}),
                (200, {"results": {"outputs": ["a"], "cumulative_logprobs": [-0.1]}}),
            ]
        }
    )
    res = b.fetch_results("job-1")
    assert res["outputs"] == ["a"]
    assert len(t.calls) == 3
    assert log == [b.retry.fetch_interval] * 2  # linear, not exponential


def test_generate_end_to_end_positional_alignment():
    b, t, _ = make_backend(
        {
            "batch-inference": [(200, {"results": "job-42"})],
            "job-status": [(200, {"results": "RUNNING"}), (200, {"results": "SUCCEEDED"})],
            "job-results": [
                (
                    200,
                    {
                        "results": {
                            "outputs": ["o1", "o2", "o3"],
                            "cumulative_logprobs": [-0.1, -0.2, -0.3],
                        }
                    },
                )
            ],
        }
    )
    prompts = pd.Series(["p1", "p2", "p3"], index=[7, 3, 5])
    out = b.generate(prompts, model="gpt-oss-20b", system_prompt="sys")
    # Aligned to the incoming index, in order.
    assert list(out.index) == [7, 3, 5]
    assert out["outputs"].tolist() == ["o1", "o2", "o3"]
    assert out["cumulative_logprobs"].tolist() == [-0.1, -0.2, -0.3]
    # Payload shape matches the reference submission (sdk.py:216-232).
    submit_call = next(c for c in t.calls if "batch-inference" in c[1])
    payload = submit_call[2]
    assert payload["model"] == "gpt-oss-20b"
    assert payload["inputs"] == ["p1", "p2", "p3"]
    assert payload["system_prompt"] == "sys"
    assert set(payload) == {
        "model", "inputs", "job_priority", "json_schema", "system_prompt",
        "cost_estimate", "sampling_params", "random_seed_per_input",
        "truncate_rows", "name", "description",
    }


def test_generate_rejects_misaligned_outputs():
    b, _, _ = make_backend(
        {
            "batch-inference": [(200, {"results": "job-9"})],
            "job-status": [(200, {"results": "SUCCEEDED"})],
            "job-results": [(200, {"results": {"outputs": ["only-one"]}})],
        }
    )
    with pytest.raises(RuntimeError, match="positional alignment"):
        b.generate(pd.Series(["a", "b"]), model="m")


def test_generate_raises_on_failed_job():
    b, _, _ = make_backend(
        {
            "batch-inference": [(200, {"results": "job-f"})],
            "job-status": [(200, {"results": "FAILED"})],
        }
    )
    with pytest.raises(RuntimeError, match="FAILED"):
        b.generate(pd.Series(["a"]), model="m")


def test_retry_policy_shared_between_client_and_fetch():
    b, _, _ = make_backend({}, retry=RetryPolicy(max_retries=2, fetch_retries=3))
    assert b.retry.max_retries == 2
    assert b.client._sleep.__self__ is b.retry  # one clock for all waits


class ConcurrentFakeTransport:
    """Thread-safe fake serving each submitted job its own inputs back
    (output = 'OUT:' + input), with real per-request latency so tests
    can MEASURE overlap, and optionally N injected 524s on each job's
    first polls to prove the retry contract survives concurrency."""

    def __init__(self, latency: float = 0.03, poll_524s: int = 0):
        import threading

        self.lock = threading.Lock()
        self.jobs: dict[str, list] = {}
        self.names: list = []
        self.submits = 0
        self.active = 0
        self.max_active = 0
        self.latency = latency
        self.poll_524s = poll_524s
        self.poll_fail_left: dict[str, int] = {}

    def request(self, method, url, *, headers, json=None):
        import time

        with self.lock:
            self.active += 1
            self.max_active = max(self.max_active, self.active)
        try:
            time.sleep(self.latency)
            path = url.split("/", 3)[-1]
            if path == "batch-inference":
                with self.lock:
                    jid = f"job-{len(self.jobs)}"
                    self.jobs[jid] = list(json["inputs"])
                    self.names.append(json.get("name"))
                    self.submits += 1
                    self.poll_fail_left[jid] = self.poll_524s
                return 200, {"results": jid}
            if path.startswith("job-status/"):
                jid = path.split("/")[1]
                with self.lock:
                    if self.poll_fail_left.get(jid, 0) > 0:
                        self.poll_fail_left[jid] -= 1
                        return 524, {}
                return 200, {"results": "SUCCEEDED"}
            if path == "job-results":
                ins = self.jobs[json["job_id"]]
                return 200, {
                    "results": {
                        "outputs": [f"OUT:{x}" for x in ins],
                        "cumulative_logprobs": [-float(len(x)) for x in ins],
                    }
                }
            raise AssertionError(f"unexpected endpoint {path}")
        finally:
            with self.lock:
                self.active -= 1


def test_concurrent_sub_batches_overlap_and_preserve_order():
    import time

    prompts = pd.Series([f"p{i:02d}" for i in range(8)])
    # serial baseline: 1 worker, same sub-batching -> 4 jobs x 3 calls
    t0 = ConcurrentFakeTransport()
    b0 = HttpBackend(
        "https://api.example.test", "k", transport=t0, sleep=lambda s: None,
        max_concurrency=1, sub_batch_size=2,
    )
    start = time.monotonic()
    r0 = b0.generate(prompts, model="m")
    serial = time.monotonic() - start
    assert t0.max_active == 1

    t = ConcurrentFakeTransport()
    b = HttpBackend(
        "https://api.example.test", "k", transport=t, sleep=lambda s: None,
        max_concurrency=4, sub_batch_size=2,
    )
    start = time.monotonic()
    r = b.generate(prompts, model="m")
    concurrent = time.monotonic() - start
    # genuine overlap: >=2 requests in flight at once, >=2x faster
    assert t.max_active >= 2
    assert concurrent < serial / 2, (serial, concurrent)
    # ordered reassembly: output i belongs to prompt i, exactly
    assert list(r["outputs"]) == [f"OUT:p{i:02d}" for i in range(8)]
    assert list(r["outputs"]) == list(r0["outputs"])
    assert list(r["cumulative_logprobs"]) == list(r0["cumulative_logprobs"])
    # one submit per sub-batch with a deterministic idempotency name:
    # same call (same inputs) -> identical names both runs, and the
    # digest base distinguishes this batch from any other batch's parts
    assert t.submits == 4
    import re

    # the thread pool may SUBMIT parts in any order — sort by part
    # index before checking; what must be deterministic is the NAME
    # each part carries, not the wall-clock submission order
    by_part = sorted(t.names, key=lambda n: n.rsplit("#part-", 1)[-1])
    assert all(
        re.fullmatch(rf"batch-[0-9a-f]{{16}}#part-{i}/4", n)
        for i, n in enumerate(by_part)
    ), t.names
    assert sorted(t.names) == sorted(t0.names)  # retry of same inputs dedups
    t_other = ConcurrentFakeTransport()
    b_other = HttpBackend(
        "https://api.example.test", "k", transport=t_other,
        sleep=lambda s: None, max_concurrency=4, sub_batch_size=2,
    )
    b_other.generate(pd.Series([f"z{i:02d}" for i in range(8)]), model="m")
    assert set(t_other.names).isdisjoint(t.names)  # distinct batches never collide
    # same TEXTS but different parameters are a different request
    # identity: a name-deduping server must not coalesce them
    t_model = ConcurrentFakeTransport()
    HttpBackend(
        "https://api.example.test", "k", transport=t_model,
        sleep=lambda s: None, max_concurrency=4, sub_batch_size=2,
    ).generate(prompts, model="m2")
    assert set(t_model.names).isdisjoint(t.names)
    t_samp = ConcurrentFakeTransport()
    HttpBackend(
        "https://api.example.test", "k", transport=t_samp,
        sleep=lambda s: None, max_concurrency=4, sub_batch_size=2,
    ).generate(prompts, model="m", sampling_params={"temperature": 0.7})
    assert set(t_samp.names).isdisjoint(t.names)


def test_concurrent_order_preserved_under_injected_524s():
    prompts = pd.Series([f"q{i}" for i in range(6)])
    t = ConcurrentFakeTransport(latency=0.005, poll_524s=2)
    b = HttpBackend(
        "https://api.example.test", "k", transport=t, sleep=lambda s: None,
        max_concurrency=3, sub_batch_size=2,
    )
    r = b.generate(prompts, model="m")
    assert list(r["outputs"]) == [f"OUT:q{i}" for i in range(6)]
    # every job really absorbed its two 524s through the retry path
    assert t.poll_fail_left == {f"job-{i}": 0 for i in range(3)}
    # and submits were never retried: exactly one per sub-batch
    assert t.submits == 3


def test_concurrency_validation():
    with pytest.raises(ValueError):
        HttpBackend("https://x", transport=FakeTransport({}), max_concurrency=0)
    # sub_batch_size=0 must not silently disable sub-batching, and
    # negatives must not surface as a confusing pandas length error
    for bad in (0, -2):
        with pytest.raises(ValueError):
            HttpBackend(
                "https://x", transport=FakeTransport({}), sub_batch_size=bad
            )
