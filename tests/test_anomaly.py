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


@pytest.fixture(scope="module")
def seasonal_dir(spark, tmp_path_factory):
    # 20 days of hour-of-day-seasonal traffic: hour 12 always carries 20
    # events, every other hour carries 5 — EXCEPT day 10 hour 3 spikes to
    # 20 (rush-hour volume at 3 am: invisible to a seasonal noon baseline,
    # flagrant vs the 3 am baseline) and day 10 hour 12 carries its normal
    # 20 (a trailing window would flag nothing here either way; the
    # seasonal baseline must stay quiet for it).
    rows = []
    eid = 0
    for d in range(20):
        for h in range(24):
            n = 20 if h == 12 else 5
            if d == 10 and h == 3:
                n = 20
            for _ in range(n):
                rows.append((eid, (d * 24 + h) * 3600)); eid += 1
    path = tmp_path_factory.mktemp("seasonal")
    spark.createDataFrame(
        rows, "event_id long, sec long"
    ).select(
        "event_id",
        # 1_700_006_400 = 19676 days exactly: midnight-aligned, so the
        # fixture's hour h IS the UTC hour-of-day
        F.timestamp_seconds(F.col("sec") + 1_700_006_400).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))
    return str(path)


def test_seasonal_spike_flagged_against_same_hour_baseline(
    spark, seasonal_dir
):
    """The 3 am burst is flagged (20 vs a 19-day 3 am baseline of 5); the
    identical count at noon is NOT (20 IS the noon baseline) — exactly
    the separation the hour-of-day baseline exists for."""
    from pulsar_topic_deduplicator_spark.operators.analytics import (
        seasonal_anomaly_flags,
    )

    out = seasonal_anomaly_flags(spark, seasonal_dir)
    spikes = out.filter("is_spike").collect()
    assert len(spikes) == 1
    [s] = spikes
    assert s["hour_of_day"] == 3 and s["n_events"] == 20
    # leave-one-out baseline: 19 other days at 5 events
    assert (s["hist_n"], s["hist_sum"]) == (19, 19 * 5)
    # all noon buckets (including day 10's) stay quiet
    noon = out.filter("hour_of_day = 12")
    assert noon.count() == 20 and noon.filter("is_spike").count() == 0
