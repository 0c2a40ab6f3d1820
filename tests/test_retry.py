"""Retry policy semantics (SURVEY.md §2.6 C10/C11, mirroring the
reference's tested behaviors: submission never retried, idempotent GETs
retried with exponential backoff, zero-budget re-raise)."""

import pytest

from sutro_spark.operators.backends import RetryPolicy, RetryableError


def make_flaky(fail_times: int):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise RetryableError("524")
        return "ok"

    return fn, calls


def test_idempotent_retries_with_exponential_backoff():
    sleeps = []
    policy = RetryPolicy(max_retries=5, sleep=sleeps.append)
    fn, calls = make_flaky(3)
    assert policy.call(fn, idempotent=True) == "ok"
    assert calls["n"] == 4
    assert sleeps == [1.0, 2.0, 4.0]


def test_non_idempotent_never_retried():
    sleeps = []
    policy = RetryPolicy(max_retries=5, sleep=sleeps.append)
    fn, calls = make_flaky(1)
    with pytest.raises(RetryableError):
        policy.call(fn, idempotent=False)
    assert calls["n"] == 1 and sleeps == []


def test_exhausted_budget_reraises():
    policy = RetryPolicy(max_retries=2, sleep=lambda s: None)
    fn, calls = make_flaky(10)
    with pytest.raises(RetryableError):
        policy.call(fn, idempotent=True)
    assert calls["n"] == 3  # initial + 2 retries


def test_fetch_linear_retry():
    sleeps = []
    policy = RetryPolicy(fetch_retries=20, fetch_interval=5.0, sleep=sleeps.append)
    fn, calls = make_flaky(7)
    assert policy.fetch(fn) == "ok"
    assert calls["n"] == 8
    assert sleeps == [5.0] * 7


def test_fetch_budget_exhausted():
    policy = RetryPolicy(fetch_retries=3, fetch_interval=0.0, sleep=lambda s: None)
    fn, calls = make_flaky(10)
    with pytest.raises(RetryableError):
        policy.fetch(fn)
    assert calls["n"] == 4
