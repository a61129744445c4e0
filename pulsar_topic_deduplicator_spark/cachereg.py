"""Bounded registry for operator-internal persists.

Several operators persist an intermediate that BOTH the in-function
consumers and the RETURNED DataFrame's lineage read (shingle frames,
Bloom warm sets, SemDeDup cell assignments). The function cannot
unpersist before returning — the caller has not materialized yet — so in
a long verify/bench session those cached relations used to accumulate
without bound: exactly the executor-heap pressure BASELINE.md documents
as causing 3x timing swings (ADVICE r5 item 1).

``persist_scoped`` keeps a FIFO window of live handles: registering a new
persist evicts the oldest beyond ``MAX_LIVE``. The sequential
query-then-collect pattern of the verify driver and bench means an
evicted cache belongs to an already-materialized earlier query; should a
caller re-collect an old frame anyway, Spark just recomputes — eviction
is a performance decision, never a correctness one. ``release_all()`` is
the explicit drain for harnesses that want a cold cache between timings.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

#: window of simultaneously-live operator persists; large enough that one
#: composed pipeline's internal persists never self-evict
MAX_LIVE = 8

_live: deque[DataFrame] = deque()


def persist_scoped(df: DataFrame) -> DataFrame:
    """persist() with bounded lifetime: the oldest registered handle is
    unpersisted once more than MAX_LIVE are live."""
    df = df.persist()
    _live.append(df)
    while len(_live) > MAX_LIVE:
        old = _live.popleft()
        try:
            old.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def release_all() -> None:
    """Unpersist every registered handle (bench/test hygiene hook)."""
    while _live:
        old = _live.popleft()
        try:
            old.unpersist()
        except Exception:
            pass
