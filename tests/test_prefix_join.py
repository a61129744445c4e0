"""Completeness of the prefix-filtered exact Jaccard join (AllPairs/PPJoin
bound): the filtered plan must lose no pair vs brute force. The DuckDB
oracle re-proves this cross-engine every round (the oracle IS the
brute-force SQL); this pins it within Spark, plus the bound arithmetic on
a hand-built corner case."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators.neardup import (
    jaccard_join_prefix_filtered,
    ngram_jaccard_pairs,
)


def test_prefix_filtered_join_equals_brute_force(spark, sf_dir):
    fast = {
        tuple(r)
        for r in jaccard_join_prefix_filtered(spark, sf_dir).collect()
    }
    brute = {tuple(r) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    assert fast == brute and len(fast) > 0
