"""Large-star/small-star connected components: parity with min-label
propagation on the real near-dup graph, correctness + O(log n) behavior on
adversarial chain graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators.neardup import (
    connected_components_lss,
    near_dup_clusters,
    near_dup_clusters_lss,
)


def test_lss_matches_propagation_on_corpus(spark, sf_dir):
    a = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in near_dup_clusters(spark, sf_dir).collect()
    }
    b = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in near_dup_clusters_lss(spark, sf_dir).collect()
    }
    assert a == b
    assert a  # graph is non-empty at sf0.001


def test_lss_long_chain_and_mixed_graph(spark):
    """A 60-node path (diameter 59 — the propagation worst case) plus a
    separate triangle and an isolated pair: every node must get its
    component minimum, well inside the max_rounds = 20 ≫ log2(60) guard."""
    chain = [(i, i + 1) for i in range(100, 160)]
    triangle = [(500, 501), (501, 502), (502, 500)]
    pair = [(900, 901)]
    edges = spark.createDataFrame(chain + triangle + pair, "src long, dst long")
    labels = {
        r["id"]: r["label"] for r in connected_components_lss(edges).collect()
    }
    assert all(labels[i] == 100 for i in range(100, 161))
    assert all(labels[i] == 500 for i in (500, 501, 502))
    assert labels[900] == labels[901] == 900
    assert len(labels) == 61 + 3 + 2


def test_lss_handles_reversed_and_duplicate_edges(spark):
    edges = spark.createDataFrame(
        [(5, 3), (3, 5), (5, 3), (1, 2), (2, 3)], "src long, dst long"
    )
    labels = {
        r["id"]: r["label"] for r in connected_components_lss(edges).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 5: 1}
