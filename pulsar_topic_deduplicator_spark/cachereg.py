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

_live: deque[DataFrame] = deque()
_lock = threading.Lock()
_log = logging.getLogger(__name__)

#: eviction telemetry. A bounded FIFO makes every eviction "young" BY
#: CONSTRUCTION: the popped head is always exactly MAX_LIVE registrations
#: old, so any ordinal/age predicate on it is a constant (the round-7
#: registrations-since-drain test flagged only the first post-drain
#: eviction; its ordinal-distance replacement was provably always-true —
#: two shapes of the same degenerate signal). The honest reading stands:
#: without an intervening `release_all()` drain there is no evidence the
#: evicted handle's query has materialized, so EVERY eviction may silently
#: degrade a live persist to recompute (correctness survives, timings
#: skew) and every one is logged. `n_evicted` is therefore the one real
#: counter; `n_evicted_young` is kept as its alias for telemetry-schema
#: stability and documented as such. Sessions that call `release_all()`
#: between queries never evict at all (bench.py does exactly that
#: alongside clearCache; clearCache ALONE does not drain this registry).
n_evicted = 0
n_evicted_young = 0


def persist_scoped(df: DataFrame) -> DataFrame:
    """persist() with bounded lifetime: the oldest registered handle is
    unpersisted once more than MAX_LIVE are live. Thread-safe (the registry
    is module-global; a concurrent driver — async quarantine pass beside a
    stateful run — may register from two threads)."""
    global n_evicted, n_evicted_young
    df = df.persist()
    to_evict: list[DataFrame] = []
    with _lock:
        _live.append(df)
        while len(_live) > MAX_LIVE:
            to_evict.append(_live.popleft())
            n_evicted += 1
            n_evicted_young += 1  # alias: see counter docstring
            _log.warning(
                "persist_scoped evicted a handle within one query cycle;"
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
        handles = list(_live)
        _live.clear()
    for old in handles:
        try:
            old.unpersist()
        except Exception:
            pass
