"""Merkle snapshot-diff semantics: the differing-bucket set is exactly the
set of buckets containing drift, and re-syncing ONLY those buckets repairs
the replica — the anti-entropy contract that makes the summary exchange
sufficient."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators import cdc


def test_diff_buckets_cover_exactly_the_drift(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.functions.hashing import stable_uint60
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    diff_leaves = {
        r["leaf"] for r in cdc.snapshot_merkle_diff(spark, sf_dir).collect()
    }
    assert diff_leaves, "fixture must produce drift"
    drifted = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") % cdc._DRIFT_UPDATE_MOD == 0)
            | (F.col("o_orderkey") % cdc._DRIFT_DELETE_MOD == 0)
        )
        .select(
            (
                stable_uint60(F.col("o_orderkey").cast("string"))
                % cdc.MERKLE_LEAVES
            ).alias("leaf")
        )
    )
    expected = {r["leaf"] for r in drifted.distinct().collect()}
    # completeness AND precision: every drifted key's bucket flagged, no
    # clean bucket flagged (XOR collisions of distinct 60-bit fingerprint
    # sets inside one bucket are the only theoretical false-negative and
    # don't occur on this fixture)
    assert diff_leaves == expected


def test_resyncing_diff_buckets_repairs_the_replica(spark, sf_dir):
    base = cdc._orders_fingerprints(spark, sf_dir)
    remote = cdc._refingerprint(
        base.filter(F.col("o_orderkey") % cdc._DRIFT_DELETE_MOD != 0)
        .withColumn("d", F.col("o_orderkey") % cdc._DRIFT_UPDATE_MOD == 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("d"), F.col("o_totalprice") + 10.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("d"), F.lit("U")).otherwise(F.col("o_orderstatus")),
        )
        .drop("d")
    )
    leaves = cdc.snapshot_merkle_diff(spark, sf_dir).select("leaf")
    # repair = drop local rows in differing buckets, ship remote's rows for
    # those buckets only
    repaired = base.join(leaves, "leaf", "anti").unionByName(
        remote.join(leaves, "leaf", "semi")
    )
    a = {tuple(r) for r in repaired.select("o_orderkey", "fp").collect()}
    b = {tuple(r) for r in remote.select("o_orderkey", "fp").collect()}
    assert a == b
