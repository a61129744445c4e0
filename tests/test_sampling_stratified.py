"""Exact-k stratified sampling invariants (the Bernoulli operators are
pinned by oracle parity; this pins the exact-count contract)."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators import sampling
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_stratified_exact_k_per_stratum(spark, sf_dir):
    out = sampling.stratified_sample_events(spark, sf_dir)
    got = {r["event_type"]: r["count"] for r in out.groupBy("event_type").count().collect()}
    totals = {
        r["event_type"]: r["count"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert set(got) == set(totals)
    for et, n in totals.items():
        assert got[et] == min(n, sampling.STRATUM_K), et


def test_stratified_sample_is_deterministic(spark, sf_dir):
    a = {tuple(r) for r in sampling.stratified_sample_events(spark, sf_dir).collect()}
    b = {tuple(r) for r in sampling.stratified_sample_events(spark, sf_dir).collect()}
    assert a == b
