"""Timestamp-encoding migration guard (round-4 regression).

The driver's events.parquet migrated from parquet TIMESTAMP(NANOS) (which
Spark 4 reads as ns-longs under ``nanosAsLong``) to ``timestamp[us]`` with
isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). The round-3
repo assumed the ns-long encoding and silently mis-scaled every streaming
event timestamp by 1000x, zeroing two window queries. These tests pin the
contract: every loader normalizes ``ts`` to TIMESTAMP (LTZ, UTC session
zone) regardless of the physical encoding, and the bounded streaming
harnesses emit nonzero output on the real driver parquet.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.sources.io import load_table, messages_view


def test_real_events_parquet_ts_normalized(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # unix_micros (the sessionize/range-frame dependency) must resolve
    n = ev.select(F.unix_micros("ts").alias("us")).filter("us > 0").count()
    assert n == ev.count() > 0


def test_messages_view_event_ts_is_timestamp(spark, sf_dir):
    mv = messages_view(spark, sf_dir)
    types = dict(mv.dtypes)
    assert types["event_ts"] == "timestamp"
    assert types["publish_ts"] == "timestamp"


def _write_us_ntz(path: str) -> pd.DataFrame:
    """A timestamp[us] (isAdjustedToUTC=false -> NTZ) events file, the
    current driver encoding."""
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 01:00:00"]
            ).astype("datetime64[us]"),
            "user_id": [1, 2],
            "event_type": ["click", "view"],
            "value": [1.0, 2.0],
            "props": ['{"k": 1}', '{"k": 2}'],
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    assert table.schema.field("ts").type == pa.timestamp("us")
    pq.write_table(table, path)
    return pdf


def _write_ns_long(path: str) -> None:
    """A legacy TIMESTAMP(NANOS) events file (reads as ns-long under
    nanosAsLong)."""
    base_ns = 1_704_067_200 * 1_000_000_000  # 2024-01-01T00:00:00Z
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [base_ns, base_ns + 3_600 * 1_000_000_000], pa.timestamp("ns")
            ),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    pq.write_table(table, path)


def test_load_table_handles_both_encodings(spark, tmp_path):
    us_dir, ns_dir = tmp_path / "us", tmp_path / "ns"
    us_dir.mkdir(), ns_dir.mkdir()
    _write_us_ntz(str(us_dir / "events.parquet"))
    _write_ns_long(str(ns_dir / "events.parquet"))
    got_us = load_table(spark, str(us_dir), "events")
    got_ns = load_table(spark, str(ns_dir), "events")
    assert dict(got_us.dtypes)["ts"] == "timestamp"
    assert dict(got_ns.dtypes)["ts"] == "timestamp"
    # same logical instants from both encodings (UTC session zone)
    vals_us = sorted(r["ts"] for r in got_us.select("ts").collect())
    vals_ns = sorted(r["ts"] for r in got_ns.select("ts").collect())
    assert vals_us == vals_ns


def test_streaming_source_handles_both_encodings(spark, tmp_path):
    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_message_stream,
    )

    for sub, writer in (("us", _write_us_ntz), ("ns", _write_ns_long)):
        d = tmp_path / f"src_{sub}"
        d.mkdir()
        writer(str(d / "events.parquet"))
        # 2 rows never close a 2 h-watermark window, so assert on the raw
        # message stream: event_ts must land in 2024, not 1970 (the silent
        # 1000x mis-scale the pinned-schema bug produced)
        mv = events_message_stream(spark, str(d))
        q = (
            mv.writeStream.format("memory")
            .queryName(f"probe_{sub}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table(f"probe_{sub}").select("event_ts").collect()
        assert len(got) == 2
        assert all(r["event_ts"].year == 2024 for r in got)


def test_bounded_streaming_windows_nonzero_on_driver_parquet(spark, sf_dir):
    """The silent-zero regression gate: both window harnesses must emit rows
    against the real driver parquet (r2 levels were ~3.3k/2.5k at sf0.01;
    sf0.001 proportionally fewer but never zero)."""
    from pulsar_topic_deduplicator_spark.streaming.windows import (
        run_session_activity_bounded,
        run_windowed_counts_bounded,
    )

    wc = run_windowed_counts_bounded(spark, sf_dir, glob_filter="events.parquet")
    sa = run_session_activity_bounded(spark, sf_dir, glob_filter="events.parquet")
    assert wc.count() > 0
    assert sa.count() > 0


def test_streaming_source_starts_on_empty_directory(spark, tmp_path):
    """A file-stream consumer normally starts BEFORE the first producer
    file exists; the schema probe must fall back to the logical schema
    instead of failing stream construction, and pick up data on restart."""
    d = tmp_path / "empty_src"
    d.mkdir()
    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_message_stream,
    )

    mv = events_message_stream(spark, str(d))  # must not raise
    q = (
        mv.writeStream.format("memory")
        .queryName("empty_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("empty_probe").count() == 0
    # first file lands; a fresh bounded run must now see it
    _write_us_ntz(str(d / "events.parquet"))
    mv2 = events_message_stream(spark, str(d))
    q2 = (
        mv2.writeStream.format("memory")
        .queryName("empty_probe2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = spark.table("empty_probe2").collect()
    assert len(got) == 2
    assert all(r["event_ts"].year == 2024 for r in got)
