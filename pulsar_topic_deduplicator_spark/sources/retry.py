"""Warm-up retry/backoff — the reference's cache-rebuild retry semantics.

``src/cacheBuilding.ts:90-131``: a failed warm-up read is retried with
exponential backoff 500 ms · 2ⁿ capped at 5 s, at most 5 retries, and a
60 s total budget; exhausting either limit fails startup (fail-fast, the
service restarts and tries again).

In Spark, *task-level* transient failures are already retried by the
scheduler (``spark.task.maxFailures``); this utility carries the same
semantics for DRIVER-side warm-up actions that sit outside task retry —
e.g. materializing the seed-digest frame from an output table that a
concurrent writer may be mid-commit on. Injectable clock/sleep keep it
deterministic under test.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")

#: ``src/cacheBuilding.ts:90-93`` constants
INITIAL_BACKOFF_MS = 500
BACKOFF_CAP_MS = 5_000
MAX_RETRIES = 5
TOTAL_BUDGET_MS = 60_000


class WarmupRetryExhausted(RuntimeError):
    """Raised when retries or the total time budget run out — the analog of
    the reference's fail-fast startup abort (``src/cacheBuilding.ts:125-130``)."""


def backoff_schedule_ms(n_retries: int = MAX_RETRIES) -> list[int]:
    """The deterministic backoff sequence: 500, 1000, 2000, 4000, 5000 (ms)
    — doubling, capped at 5 s (``src/cacheBuilding.ts:107-113``)."""
    return [
        min(INITIAL_BACKOFF_MS * (2**i), BACKOFF_CAP_MS) for i in range(n_retries)
    ]


def with_warmup_retries(
    action: Callable[[], T],
    *,
    max_retries: int = MAX_RETRIES,
    total_budget_ms: int = TOTAL_BUDGET_MS,
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``action`` with the reference's warm-up retry policy; returns its
    result, or raises ``WarmupRetryExhausted`` carrying the last error."""
    start = clock()
    schedule = backoff_schedule_ms(max_retries)
    last_err: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            return action()
        except Exception as exc:  # noqa: BLE001 — policy wraps any failure
            last_err = exc
        if attempt >= max_retries:
            break
        wait_ms = schedule[attempt]
        elapsed_ms = (clock() - start) * 1000.0
        if elapsed_ms + wait_ms > total_budget_ms:
            raise WarmupRetryExhausted(
                f"warm-up retry budget ({total_budget_ms} ms) exhausted after "
                f"{attempt + 1} attempts"
            ) from last_err
        sleep(wait_ms / 1000.0)
    raise WarmupRetryExhausted(
        f"warm-up failed after {max_retries + 1} attempts"
    ) from last_err
