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

#: diagnostic counters: total evictions, and evictions that fired while the
#: registry was still filling its very first window (a handle evicted that
#: young is likely still feeding an un-materialized returned DataFrame — the
#: persist silently degrades to recompute; correctness survives, timings
#: skew). `release_all()` resets the young-signal baseline.
n_evicted = 0
n_evicted_young = 0
_registered_since_drain = 0


def persist_scoped(df: DataFrame) -> DataFrame:
    """persist() with bounded lifetime: the oldest registered handle is
    unpersisted once more than MAX_LIVE are live. Thread-safe (the registry
    is module-global; a concurrent driver — async quarantine pass beside a
    stateful run — may register from two threads)."""
    global n_evicted, n_evicted_young, _registered_since_drain
    df = df.persist()
    to_evict: list[DataFrame] = []
    with _lock:
        _live.append(df)
        _registered_since_drain += 1
        while len(_live) > MAX_LIVE:
            to_evict.append(_live.popleft())
            n_evicted += 1
            # fewer than one full window registered since the last drain ⇒
            # the evicted handle is younger than one query cycle: surface it
            if _registered_since_drain <= MAX_LIVE + 1:
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
    global _registered_since_drain
    with _lock:
        handles = list(_live)
        _live.clear()
        _registered_since_drain = 0
    for old in handles:
        try:
            old.unpersist()
        except Exception:
            pass
