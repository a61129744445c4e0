"""Semantics + plan shape for the bucketized point-in-interval join
(`operators/asof.py::interval_join`) — oracle parity for the named query is
covered by test_oracle_parity; these pin what parity can't: multi-bucket
coverage, boundary semantics, pair uniqueness, and the no-NLJ plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators import asof
from pulsar_topic_deduplicator_spark.plans import formatted_plan

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=seconds)


def test_interval_join_boundaries_and_multibucket(spark):
    """start inclusive, end exclusive; an interval spanning many buckets
    still matches points in every covered bucket exactly once."""
    points = spark.createDataFrame(
        [(i, _ts(i)) for i in (0, 1, 5, 10, 59, 60, 61, 3599, 3600)],
        "pid long, p_ts timestamp",
    )
    # one short interval [5, 60) and one long interval [0, 3600) that
    # covers 360 buckets at a 10 s bucket width
    intervals = spark.createDataFrame(
        [(100, _ts(5), _ts(60)), (200, _ts(0), _ts(3600))],
        "iid long, s_ts timestamp, e_ts timestamp",
    )
    out = asof.interval_join(
        points,
        intervals,
        point_ts="p_ts",
        start_ts="s_ts",
        end_ts="e_ts",
        bucket_us=10_000_000,
    )
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {
        # [5, 60): 5 and 10 and 59 in; 60 excluded (end-exclusive)
        (5, 100),
        (10, 100),
        (59, 100),
        # [0, 3600): everything but 3600 (end-exclusive); 0 in (inclusive)
        (0, 200),
        (1, 200),
        (5, 200),
        (10, 200),
        (59, 200),
        (60, 200),
        (61, 200),
        (3599, 200),
    }
    # exactly once per (point, interval): no bucket-explosion duplicates
    assert out.count() == len(pairs)


def test_interval_join_key_scoping(spark):
    """With keys, a point only matches intervals sharing the key."""
    points = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "b", _ts(10))],
        "pid long, k string, p_ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, "a", _ts(0), _ts(60))],
        "iid long, k string, s_ts timestamp, e_ts timestamp",
    )
    out = asof.interval_join(
        points,
        intervals,
        point_ts="p_ts",
        start_ts="s_ts",
        end_ts="e_ts",
        keys=("k",),
        bucket_us=60_000_000,
    )
    assert {(r["pid"], r["iid"]) for r in out.collect()} == {(1, 100)}


def test_purchase_attribution_no_nlj(spark, sf_dir):
    """The range predicate must ride the bucketed equi-join — never a
    BroadcastNestedLoopJoin or cartesian product."""
    df = asof.purchase_attribution_events(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # window self-attribution: every purchase matches its own window
    purchases = df.filter(
        F.col("event_id") == F.col("window_id")
    ).count()
    n_purch = (
        df.select("window_id").distinct().count()
    )
    assert purchases == n_purch


def test_stream_attribution_matches_batch_range_join(spark, sf_dir):
    """The bounded stream-static run must emit exactly the batch
    range-join's rows (stateless inner join — parity by construction)."""
    from pulsar_topic_deduplicator_spark.streaming.attribution import (
        run_stream_attribution_bounded,
    )

    got = {
        (r["event_id"], r["window_id"])
        for r in run_stream_attribution_bounded(
            spark, sf_dir, glob_filter="events.parquet"
        ).collect()
    }
    want = {
        (r["event_id"], r["window_id"])
        for r in asof.purchase_attribution_events(spark, sf_dir).collect()
    }
    assert got == want and got


def test_band_join_no_nlj_and_matches_naive(spark, sf_dir):
    """The bucketized band join must plan as an equi-join (no NLJ or
    cartesian) and return exactly the naive non-equi predicate's pairs."""
    from pyspark.sql import functions as F

    from pulsar_topic_deduplicator_spark.operators.asof import (
        PRICE_BAND_DECI,
        band_self_join_prices,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    df = band_self_join_prices(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    got = {(r["part_a"], r["part_b"]) for r in df.collect()}

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 10).cast("bigint").alias("u"),
    )
    a, b = part.alias("a"), part.alias("b")
    naive = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("b.p_partkey") < F.col("a.p_partkey"))
        & (F.abs(F.col("a.u") - F.col("b.u")) <= PRICE_BAND_DECI),
    ).select(
        F.col("a.p_partkey").alias("pa"), F.col("b.p_partkey").alias("pb")
    )
    want = {(r["pa"], r["pb"]) for r in naive.collect()}
    assert got == want and got


def test_hourly_rollup_hierarchical_reuse_equals_direct(spark, sf_dir):
    """Re-rolling the minutely aggregate must equal aggregating the raw
    events straight to hourly buckets — the lossless-decomposition
    property continuous aggregates depend on."""
    from pulsar_topic_deduplicator_spark.operators.relational import (
        _HOUR_US,
        _time_bucket,
        dec2,
        hourly_rollup_from_minutely,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    via_minutely = {
        (r["bucket_hour"], r["event_type"]): (
            r["n"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in hourly_rollup_from_minutely(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r["bucket_hour"], r["event_type"]): (
            r["n"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in ev.groupBy(
            _time_bucket("ts", _HOUR_US).alias("bucket_hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert via_minutely == direct and via_minutely


def test_interval_join_ignores_degenerate_intervals(spark):
    """end <= start can never contain a point (half-open); such intervals
    must be dropped before the bucket explode — a far-negative length
    would otherwise generate a huge descending bucket sequence."""
    points = spark.createDataFrame(
        [(1, _ts(10))], "pid long, p_ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(10), _ts(10)),  # zero-length at the point
            (200, _ts(3600), _ts(0)),  # inverted, 1h long
            (300, _ts(0), _ts(60)),  # sane: matches
        ],
        "iid long, s_ts timestamp, e_ts timestamp",
    )
    out = asof.interval_join(
        points,
        intervals,
        point_ts="p_ts",
        start_ts="s_ts",
        end_ts="e_ts",
        bucket_us=10_000_000,
    )
    assert {(r["pid"], r["iid"]) for r in out.collect()} == {(1, 300)}


def test_interval_join_randomized_vs_naive(spark):
    """Seeded randomized equivalence: the bucketized join must return
    exactly the naive range predicate's pairs over boundary-heavy random
    data (points planted AT starts/ends/bucket edges, degenerate and
    multi-bucket intervals, several keys, bucket width coprime to the
    interval grid)."""
    import random

    rng = random.Random(0xC0FFEE)
    keys = ["a", "b", "c"]
    intervals, points = [], []
    for iid in range(60):
        s = rng.randrange(0, 5000)
        length = rng.choice([0, 1, 7, 60, 400, 1500, -300])
        intervals.append((iid, rng.choice(keys), _ts(s), _ts(s + length)))
    for pid in range(300):
        iv = rng.choice(intervals)
        base = int((iv[2] - _T0).total_seconds())
        end = int((iv[3] - _T0).total_seconds())
        sec = rng.choice(
            [base, end, end - 1, base - 1, rng.randrange(0, 5600)]
        )
        points.append((pid, rng.choice(keys), _ts(max(sec, 0))))
    iv_df = spark.createDataFrame(
        intervals, "iid long, k string, s_ts timestamp, e_ts timestamp"
    )
    pt_df = spark.createDataFrame(
        points, "pid long, k string, p_ts timestamp"
    )
    # bucket width 13 s: coprime to every interval length above, so bucket
    # edges fall everywhere relative to interval edges
    got = {
        (r["pid"], r["iid"])
        for r in asof.interval_join(
            pt_df,
            iv_df,
            point_ts="p_ts",
            start_ts="s_ts",
            end_ts="e_ts",
            keys=("k",),
            bucket_us=13_000_000,
        ).collect()
    }
    want = {
        (p[0], i[0])
        for p in points
        for i in intervals
        if p[1] == i[1] and i[2] <= p[2] < i[3]
    }
    assert got == want and want


def test_session_overlap_no_nlj_and_self_containment(spark, sf_dir):
    """The overlap predicate must ride the bucketed equi-join (no NLJ /
    cartesian), and every purchase window must overlap the session that
    contains its purchase event."""
    df = asof.session_purchase_overlaps(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # each window's purchase lies inside some session of its user, and
    # that session starts at-or-before the purchase: the window [ts,
    # ts+30min) overlaps it — so every window id must appear
    n_windows = df.select("window_id").distinct().count()
    n_purch = asof.purchase_windows(spark, sf_dir).count()
    assert n_windows == n_purch


def test_overlap_join_randomized_vs_naive(spark):
    """Seeded randomized equivalence for the interval×interval OVERLAP
    join: exactly the naive predicate's pairs (left closed, right
    half-open), each pair exactly once even when the overlap spans many
    shared buckets."""
    import random

    rng = random.Random(0xBEEF)
    keys = ["a", "b"]
    lefts, rights = [], []
    for lid in range(80):
        s = rng.randrange(0, 4000)
        length = rng.choice([0, 1, 13, 60, 700, 2000])
        lefts.append((lid, rng.choice(keys), _ts(s), _ts(s + length)))
    for rid in range(80):
        s = rng.randrange(0, 4000)
        length = rng.choice([0, 1, 7, 90, 500, 2500, -100])
        rights.append((rid, rng.choice(keys), _ts(s), _ts(s + length)))
    l_df = spark.createDataFrame(
        lefts, "lid long, k string, ls timestamp, le timestamp"
    )
    r_df = spark.createDataFrame(
        rights, "rid long, k string, rs timestamp, re timestamp"
    )
    out = asof.interval_overlap_join(
        l_df,
        r_df,
        l_start="ls",
        l_end="le",
        r_start="rs",
        r_end="re",
        keys=("k",),
        bucket_us=17_000_000,  # coprime to every length above
    )
    got = [(r["lid"], r["rid"]) for r in out.collect()]
    want = {
        (l[0], r[0])
        for l in lefts
        for r in rights
        if l[1] == r[1] and r[3] > r[2] and l[2] < r[3] and r[2] <= l[3]
    }
    assert set(got) == want and want
    # first-shared-bucket rule: duplicate-free without a distinct pass
    assert len(got) == len(set(got))


def test_minutely_rollup_incremental_refresh(spark, sf_dir):
    """Splitting the corpus at a time cutoff, rolling each slice, and
    merging must equal rolling everything at once — the decomposable-
    aggregate identity incremental materialized-view refresh relies on."""
    from pulsar_topic_deduplicator_spark.operators.relational import (
        merge_minutely_rollups,
        rollup_events_minutely,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        F.percentile_approx("ts", 0.7).alias("c")
    ).collect()[0]["c"]
    old = rollup_events_minutely(ev.filter(F.col("ts") < cutoff))
    new = rollup_events_minutely(ev.filter(F.col("ts") >= cutoff))
    merged = {
        (r["bucket_minute"], r["event_type"]): (
            r["n"],
            float(r["dsum"]),
            r["min_value"],
            r["max_value"],
        )
        for r in merge_minutely_rollups(old, new).collect()
    }
    direct = {
        (r["bucket_minute"], r["event_type"]): (
            r["n"],
            float(r["dsum"]),
            r["min_value"],
            r["max_value"],
        )
        for r in rollup_events_minutely(ev).collect()
    }
    assert merged == direct and merged



def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    """The bounded watermarked stream-stream join must emit exactly the
    batch range join's pairs (single-batch inner join — deterministic)."""
    from pulsar_topic_deduplicator_spark.streaming.join import (
        run_stream_stream_attribution_bounded,
    )

    got = {
        (r["event_id"], r["window_id"])
        for r in run_stream_stream_attribution_bounded(
            spark, sf_dir, glob_filter="events.parquet"
        ).collect()
    }
    want = {
        (r["event_id"], r["window_id"])
        for r in asof.purchase_attribution_events(spark, sf_dir).collect()
    }
    assert got == want and got
