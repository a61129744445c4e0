"""Shuffle-key advisor and rendezvous-placement invariants."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators import skew


def test_skew_report_flags_the_hot_key(spark, sf_dir):
    rows = {r["key"]: r for r in skew.key_skew_report(spark, sf_dir).collect()}
    assert set(rows) == {f"{t}.{c}" for t, c in skew.SKEW_KEYS}
    et = rows["events.event_type"]
    # 5 event types: hottest holds ~1/5 of all rows — always flags
    assert et["n_keys"] == 5 and et["needs_salting"]
    assert et["max_share_ppm"] >= 190_000
    for r in rows.values():
        assert r["max_key_rows"] * 1_000_000 // r["n_rows"] == r["max_share_ppm"]


def test_rendezvous_moves_only_to_the_new_worker(spark, sf_dir):
    rows = {r["worker"]: r for r in skew.rendezvous_assignment(spark, sf_dir).collect()}
    # a worker that wins no key in EITHER fleet has no row (15 users at
    # sf0.001 can leave a slot empty); the new worker must be present
    assert set(rows) <= set(range(skew.HRW_W + 1))
    new = rows[skew.HRW_W]
    # the minimal-movement guarantee: every mover lands on the new worker
    assert new["n_keys_w5"] == 0
    assert new["n_arrivals"] == new["n_keys_w6"] > 0
    for w in range(skew.HRW_W):
        if w in rows:
            assert rows[w]["n_arrivals"] == 0, w
    # conservation across both fleets
    assert sum(r["n_keys_w5"] for r in rows.values()) == sum(
        r["n_keys_w6"] for r in rows.values()
    )


def test_join_size_estimator_reconciles(spark, sf_dir):
    """The exact join size must equal the count-frame product sum, the
    estimate must be R x the sampled products (deterministic under the
    seeded hash), and the sample must be a real subset."""
    from pulsar_topic_deduplicator_spark.operators.dedup import (
        JSE_R,
        join_size_estimate,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    r = join_size_estimate(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    od = load_table(spark, sf_dir, "orders").groupBy("o_custkey").count()
    exact = sum(
        a["count"] * b["count"]
        for a in ev.collect()
        for b in od.collect()
        if a["user_id"] == b["o_custkey"]
    )
    assert r["join_rows_exact"] == exact
    assert 0 <= r["n_keys_sampled"] <= r["n_keys_shared"]
    assert r["join_rows_est"] % JSE_R == 0
