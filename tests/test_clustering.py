"""Integer fixed-point k-means: seed selection, well-separated group
recovery, tie-break to the smaller cluster id, emptied-cluster centroid
retention, and run-to-run determinism — on hand-built 2-dim corpora."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.operators.clustering import (
    KMEANS_K,
    kmeans_assign,
    kmeans_centroids,
)


def _write(spark, path, vecs):
    spark.createDataFrame(
        [(i, [float(a), float(b)], 0) for i, (a, b) in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(path / "embeddings.parquet"))
    return str(path)


@pytest.fixture(scope="module")
def separated_dir(spark, tmp_path_factory):
    # four well-separated groups; the K seeds (vec_ids 0..3) land one per
    # group, members 4..7 join them
    vecs = [
        (0, 0), (100, 0), (0, 100), (100, 100),  # seeds
        (0, 1), (100, 1), (0, 101), (100, 101),  # one member per group
    ]
    return _write(spark, tmp_path_factory.mktemp("km_sep"), vecs)


@pytest.fixture(scope="module")
def empties_dir(spark, tmp_path_factory):
    # seeds 0 and 1 are IDENTICAL and cluster 0's membership is exactly
    # the two origin points, so its centroid never drifts off (0, 0):
    # every round the origin points tie between clusters 0 and 1 and the
    # smaller-k tie-break starves cluster 1 permanently
    vecs = [
        (0, 0), (0, 0), (100, 0), (0, 100),  # seeds; 1 duplicates 0
        (100, 1), (1, 100),
    ]
    return _write(spark, tmp_path_factory.mktemp("km_empty"), vecs)


def test_recovers_separated_groups(spark, separated_dir):
    assert KMEANS_K == 4  # the fixtures encode this
    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(spark, separated_dir).collect()
    }
    assert len(assign) == 8
    # each member lands with its seed, seeds keep their own cluster
    for seed, member in [(0, 4), (1, 5), (2, 6), (3, 7)]:
        assert assign[member] == assign[seed] == seed


def test_emptied_cluster_keeps_seed_centroid(spark, empties_dir):
    assign_rows = kmeans_assign(spark, empties_dir).collect()
    assigned = {r["cluster_id"] for r in assign_rows}
    # cluster 1 never wins a tie → no members
    assert 1 not in assigned
    assert {0, 2, 3} <= assigned
    cents = {
        (r["k"], r["dim"]): r["c"]
        for r in kmeans_centroids(spark, empties_dir).collect()
    }
    # the starved cluster's centroid row SURVIVES every update (the
    # left-join coalesce path — a dropped row here would shrink the model
    # to 3 clusters) and keeps its quantized seed value: vec 1 is (0, 0)
    # and the per-dim minima are 0 → q = (0, 0)
    assert {k for k, _ in cents} == {0, 1, 2, 3}
    assert cents[(1, 0)] == 0 and cents[(1, 1)] == 0


def test_assignment_deterministic_across_runs(spark, separated_dir):
    a = sorted(map(tuple, kmeans_assign(spark, separated_dir).collect()))
    b = sorted(map(tuple, kmeans_assign(spark, separated_dir).collect()))
    assert a == b


def test_assign_plan_broadcasts_centroids_no_cartesian(spark, separated_dir):
    from pulsar_topic_deduplicator_spark.plans import formatted_plan

    plan = formatted_plan(kmeans_assign(spark, separated_dir))
    # the KB-sized centroid frame must ride as a broadcast, and the
    # vec×K inflation must come from that hash join — never a cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
