"""FIXTURES.md §A.4 end-to-end: stream a duplicate-injected corpus through
the dedup pipeline; injected duplicates (same content, shifted timestamp,
extra IGNORED property) are dropped iff the ignore list is configured."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.sources.inject import events_with_duplicates
from pulsar_topic_deduplicator_spark.streaming.dedup import dedup_stream
from pulsar_topic_deduplicator_spark.streaming.source import events_message_stream


@pytest.fixture(scope="module")
def injected_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inject") / "events_dup")
    df = events_with_duplicates(spark, sf_dir, add_ignored_prop=True)
    df.write.mode("overwrite").parquet(path)
    n_total = df.count()
    n_orig = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    return path, n_orig, n_total - n_orig


def _run(spark, src, tmp, ignored):
    deduped = dedup_stream(
        events_message_stream(spark, src), ignored=ignored
    ).select("message_id", "digest")
    name = f"inj_{abs(hash((src, ignored))) % 10**8}"
    query = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def test_duplicates_dropped_with_ignore_list(spark, injected_dir, tmp_path):
    src, n_orig, n_dups = injected_dir
    assert n_dups > 0, "injector produced no duplicates"
    out = _run(spark, src, tmp_path / "ck1", ignored=("dupMarker",))
    # every injected duplicate suppressed: one survivor per original content
    # (original rows may themselves contain duplicate content — compare
    # against the distinct digest count, not the raw original count)
    # survivors are exactly one row per distinct content digest
    assert out.count() == out.select("digest").distinct().count()
    # and every injected (negative-id) row lost to its original: originals
    # have the earlier timestamp
    neg = out.filter(F.col("message_id").startswith("-")).count()
    assert neg == 0, f"{neg} injected duplicates survived"


def test_duplicates_survive_without_ignore_list(spark, injected_dir, tmp_path):
    src, n_orig, n_dups = injected_dir
    out = _run(spark, src, tmp_path / "ck2", ignored=())
    # the dupMarker property now participates in the digest -> injected rows
    # are NOT duplicates of their originals and must survive
    neg = out.filter(F.col("message_id").startswith("-")).count()
    assert neg == n_dups, (neg, n_dups)
