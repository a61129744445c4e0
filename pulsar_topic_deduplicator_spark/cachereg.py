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

import logging
import threading
from collections import deque

from pyspark.sql import DataFrame

#: window of simultaneously-live operator persists; large enough that one
#: composed pipeline's internal persists never self-evict
MAX_LIVE = 8

#: live handles as (registration ordinal, frame) — the ordinal is a global
#: monotonic registration counter, the age yardstick for eviction telemetry
_live: deque[tuple[int, DataFrame]] = deque()
_lock = threading.Lock()
_log = logging.getLogger(__name__)

#: diagnostic counters: total evictions, and YOUNG evictions — a handle
#: evicted within one registration window of the head (ADVICE r7: ordinal
#: distance, not registrations-since-drain, so every eviction in a burst is
#: assessed, not just the first after a drain). A young-evicted handle may
#: still be feeding an un-materialized returned DataFrame — the persist
#: silently degrades to recompute; correctness survives, timings skew.
#: Under a saturated FIFO every eviction IS within one window of the head,
#: which is the honest reading: without an intervening `release_all()`
#: drain there is no evidence the registering query has materialized.
#: Sessions that drain between queries (bench/verify hygiene) never evict.
n_evicted = 0
n_evicted_young = 0
_ordinal = 0


def persist_scoped(df: DataFrame) -> DataFrame:
    """persist() with bounded lifetime: the oldest registered handle is
    unpersisted once more than MAX_LIVE are live. Thread-safe (the registry
    is module-global; a concurrent driver — async quarantine pass beside a
    stateful run — may register from two threads)."""
    global n_evicted, n_evicted_young, _ordinal
    df = df.persist()
    to_evict: list[DataFrame] = []
    with _lock:
        _ordinal += 1
        _live.append((_ordinal, df))
        while len(_live) > MAX_LIVE:
            born, old = _live.popleft()
            to_evict.append(old)
            n_evicted += 1
            # evicted within one window of the current registration head ⇒
            # younger than one query cycle: surface it (every burst member,
            # not only the first eviction after a drain)
            if _ordinal - born <= MAX_LIVE + 1:
                n_evicted_young += 1
                _log.warning(
                    "persist_scoped evicted a young handle (<1 query cycle);"
                    " its consumers will recompute — raise MAX_LIVE or drain"
                    " with release_all() between queries"
                )
    for old in to_evict:
        try:
            old.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def release_all() -> None:
    """Unpersist every registered handle (bench/test hygiene hook)."""
    with _lock:
        handles = [df for _, df in _live]
        _live.clear()
    for old in handles:
        try:
            old.unpersist()
        except Exception:
            pass
