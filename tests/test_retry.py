"""Warm-up retry/backoff policy (sources/retry.py) — pure unit tests with an
injected clock, mirroring the reference constants at src/cacheBuilding.ts:90-131."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.sources.retry import (
    WarmupRetryExhausted,
    backoff_schedule_ms,
    with_warmup_retries,
)


def test_backoff_schedule_doubles_and_caps():
    assert backoff_schedule_ms() == [500, 1000, 2000, 4000, 5000]


class _FakeTime:
    def __init__(self):
        self.now = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.now

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.now += s


def test_succeeds_after_transient_failures():
    ft = _FakeTime()
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("broker not ready")
        return "seeded"

    out = with_warmup_retries(flaky, clock=ft.clock, sleep=ft.sleep)
    assert out == "seeded"
    assert ft.sleeps == [0.5, 1.0]  # first two backoff steps only


def test_max_retries_exhausted():
    ft = _FakeTime()

    def always_fails():
        raise OSError("nope")

    with pytest.raises(WarmupRetryExhausted, match="6 attempts"):
        with_warmup_retries(always_fails, clock=ft.clock, sleep=ft.sleep)
    # full schedule slept: 0.5+1+2+4+5
    assert sum(ft.sleeps) == pytest.approx(12.5)


def test_total_budget_aborts_before_sleeping_past_it():
    ft = _FakeTime()

    def slow_fail():
        ft.now += 61.0  # one attempt burns the whole budget
        raise OSError("slow broker")

    with pytest.raises(WarmupRetryExhausted, match="budget"):
        with_warmup_retries(slow_fail, clock=ft.clock, sleep=ft.sleep)
    assert ft.sleeps == []  # aborted before the first sleep would overrun
