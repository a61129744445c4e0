"""Bounded persist registry (``cachereg``): FIFO eviction beyond MAX_LIVE,
drain semantics, and the ADVICE-r6 eviction telemetry (young-handle
evictions are counted and logged — they mean an un-materialized consumer
will silently recompute)."""

from __future__ import annotations

import pulsar_topic_deduplicator_spark.cachereg as cachereg


def _reset():
    cachereg.release_all()
    cachereg.n_evicted = 0
    cachereg.n_evicted_young = 0


def test_fifo_eviction_beyond_window(spark):
    _reset()
    frames = [
        cachereg.persist_scoped(spark.range(i + 1)) for i in range(cachereg.MAX_LIVE)
    ]
    assert cachereg.n_evicted == 0
    extra = cachereg.persist_scoped(spark.range(100))
    assert cachereg.n_evicted == 1
    # the evicted handle is the OLDEST registration
    assert frames[0].storageLevel.useMemory is False
    # newer handles and the new registration stay persisted
    assert extra.storageLevel.useMemory is True
    assert frames[-1].storageLevel.useMemory is True
    _reset()


def test_young_eviction_counted_and_logged(spark, caplog):
    _reset()
    import logging

    with caplog.at_level(logging.WARNING, logger="pulsar_topic_deduplicator_spark.cachereg"):
        for i in range(cachereg.MAX_LIVE + 1):
            cachereg.persist_scoped(spark.range(i + 1))
    # the first eviction after a drain is counted and logged
    assert cachereg.n_evicted_young == 1
    assert any("within one query cycle" in r.message for r in caplog.records)
    _reset()


def test_burst_evictions_all_counted_young(spark):
    """ADVICE r7: LATER evictions in the same burst (registrations
    MAX_LIVE+2..N with no intervening drain) must be counted too — the old
    registrations-since-drain rule flagged only the first one. The honest
    resolution: in a bounded FIFO the popped head is ALWAYS exactly one
    window old (any age predicate is a constant), so every eviction counts
    and the alias invariant n_evicted_young == n_evicted is pinned here by
    design, not by coincidence."""
    _reset()
    burst = cachereg.MAX_LIVE + 3
    for i in range(burst):
        cachereg.persist_scoped(spark.range(i + 1))
    assert cachereg.n_evicted == burst - cachereg.MAX_LIVE == 3
    assert cachereg.n_evicted_young == cachereg.n_evicted  # none missed
    _reset()


def test_release_all_drains_everything(spark):
    _reset()
    frames = [cachereg.persist_scoped(spark.range(i + 1)) for i in range(3)]
    cachereg.release_all()
    for f in frames:
        assert f.storageLevel.useMemory is False
    _reset()
