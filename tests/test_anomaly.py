"""Trailing-window spike detection: a planted 10x burst is flagged, flat
traffic and the cold-start prefix are not, and dips never alias into
spikes (the integer z-test squares its deviation, so the sign guard is
load-bearing)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pulsar_topic_deduplicator_spark.operators.analytics import (
    ANOM_MIN_HIST,
    ANOM_WINDOW,
    hourly_anomaly_flags,
)

HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def anomaly_dir(spark, tmp_path_factory):
    # type "flat": 5 events every hour for 40 h.
    # type "burst": 5/hour, except hour 30 has 50 (the spike) and hour 35
    # has 0 events (a dip — absent bucket, must not flag anything).
    rows = []
    eid = 0
    for h in range(40):
        for _ in range(5):
            rows.append((eid, h * 3600, "flat")); eid += 1
        n = 50 if h == 30 else (0 if h == 35 else 5)
        for _ in range(n):
            rows.append((eid, h * 3600, "burst")); eid += 1
    path = tmp_path_factory.mktemp("anom")
    spark.createDataFrame(
        rows, "event_id long, sec long, event_type string"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("sec") + 1_700_000_000).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))
    return str(path)


def test_planted_spike_flagged_and_nothing_else(spark, anomaly_dir):
    rows = hourly_anomaly_flags(spark, anomaly_dir).collect()
    spikes = [(r["event_type"], r["bucket_us"]) for r in rows if r["is_spike"]]
    base = (1_700_000_000 * 1_000_000 // HOUR_US) * HOUR_US
    assert spikes == [("burst", base + 30 * HOUR_US)]
    # flat traffic: zero variance AND zero deviation — never flagged
    assert not [s for s in spikes if s[0] == "flat"]


def test_cold_start_never_flags(spark, anomaly_dir):
    rows = hourly_anomaly_flags(spark, anomaly_dir).collect()
    for r in rows:
        if r["hist_n"] < ANOM_MIN_HIST:
            assert not r["is_spike"]
        assert r["hist_n"] <= ANOM_WINDOW
