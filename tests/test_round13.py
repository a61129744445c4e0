"""Round-13 additions: the bounded streaming shuffle-width pin
(VERDICT r12 items 3+4 — streaming plans get no AQE coalescing, so a
default 200-partition session paid 200/400-task stages per micro-batch
for KB-sized monitor state)."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.streaming.source import (
    bounded_shuffle_width,
)

_KEY = "spark.sql.shuffle.partitions"


def test_width_pin_narrows_to_cluster_and_restores(spark):
    """Inside the context the width is min(cores, configured) clamped to
    ≥ 4; the previous session value is restored on exit (and on error)."""
    old = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, "200")
        cores = spark.sparkContext.defaultParallelism
        with bounded_shuffle_width(spark) as w:
            assert w == max(4, min(cores, 200))
            assert spark.conf.get(_KEY) == str(w)
        assert spark.conf.get(_KEY) == "200"
        # explicit width wins
        with bounded_shuffle_width(spark, width=7) as w:
            assert w == 7 and spark.conf.get(_KEY) == "7"
        assert spark.conf.get(_KEY) == "200"
        # restore also on error
        try:
            with bounded_shuffle_width(spark):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert spark.conf.get(_KEY) == "200"
    finally:
        spark.conf.set(_KEY, old)


def test_width_pin_never_raises_a_tuned_session(spark):
    """A session already configured BELOW the cluster's core count keeps
    its narrower width — the helper only ever narrows, INCLUDING a
    session tuned below the 4-partition floor (the floor must not widen
    a deliberate width-2 fixture session)."""
    old = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, "4")
        with bounded_shuffle_width(spark) as w:
            assert w == 4
        assert spark.conf.get(_KEY) == "4"
        spark.conf.set(_KEY, "2")
        with bounded_shuffle_width(spark) as w:
            assert w == 2
        assert spark.conf.get(_KEY) == "2"
    finally:
        spark.conf.set(_KEY, old)


def test_state_store_partition_count_is_the_pinned_width(
    spark, tmp_path, sf_dir
):
    """HARD pin: the state-store partition count a streaming query bakes
    into its checkpoint equals the pinned width, not the session default.
    The checkpoint layout is one numbered subdirectory per state
    partition under state/0/ — count them."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_raw_stream,
    )

    old = spark.conf.get(_KEY)
    ckpt = str(tmp_path / "ck_width_pin")
    name = f"widthpin_{uuid.uuid4().hex[:6]}"
    try:
        spark.conf.set(_KEY, "200")
        ev = events_raw_stream(spark, sf_dir, glob_filter="events.parquet")
        counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        with bounded_shuffle_width(spark) as w:
            q = (
                counts.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        parts = [
            d for d in os.listdir(os.path.join(ckpt, "state", "0"))
            if d.isdigit()
        ]
        assert len(parts) == w, (len(parts), w)
        cores = spark.sparkContext.defaultParallelism
        assert w == min(200, max(4, min(cores, 200)))
    finally:
        spark.conf.set(_KEY, old)


def test_streaming_monitor_runs_at_pinned_width(spark, tmp_path, sf_dir):
    """End-to-end: a bounded monitor run under a 200-partition session
    default must complete correctly AND leave the session conf exactly
    as it found it (the pin is scoped to the run)."""
    from pulsar_topic_deduplicator_spark.streaming.drift import (
        run_stream_ks_drift_bounded,
    )

    old = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, "200")
        out = run_stream_ks_drift_bounded(
            spark, sf_dir, glob_filter="events.parquet"
        )
        assert out.count() > 0
        # the session default must be untouched after the run
        assert spark.conf.get(_KEY) == "200"
    finally:
        spark.conf.set(_KEY, old)
