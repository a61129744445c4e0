"""Product-analytics tier semantics (operators/analytics.py). DuckDB value
parity is pinned in test_oracle_parity; these pin the invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators import analytics
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_funnel_is_monotone_and_bounded(spark, sf_dir):
    rows = {
        r["step"]: r["n_users"]
        for r in analytics.funnel_steps(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3] >= 0
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[1] <= n_users


def test_funnel_requires_order_not_just_presence(spark, sf_dir):
    """A user owning all three event types but never in funnel order must
    not reach step 3 — count users with all three types and require the
    funnel's step-3 count to be no larger (strictness of the ts-order
    condition vs a bag-of-types count)."""
    ev = load_table(spark, sf_dir, "events")
    with_all = (
        ev.filter(F.col("event_type").isin(analytics.FUNNEL_STEPS))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 3)
        .count()
    )
    step3 = {
        r["step"]: r["n_users"]
        for r in analytics.funnel_steps(spark, sf_dir).collect()
    }[3]
    assert step3 <= with_all


def test_cohort_offsets_start_at_zero(spark, sf_dir):
    coh = analytics.weekly_cohort_retention(spark, sf_dir).cache()
    try:
        assert coh.filter(F.col("week_offset") < 0).count() == 0
        # every cohort has an offset-0 row, and it is the cohort's max
        # (a user is active in their own first week by definition)
        base = coh.filter(F.col("week_offset") == 0).select(
            "cohort_week", F.col("n_users").alias("base")
        )
        j = coh.join(base, "cohort_week")
        assert j.filter(F.col("n_users") > F.col("base")).count() == 0
        # offset-0 rows cover every user exactly once across cohorts
        n_users = (
            load_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        total0 = (
            coh.filter(F.col("week_offset") == 0)
            .agg(F.sum("n_users"))
            .collect()[0][0]
        )
        assert total0 == n_users
    finally:
        coh.unpersist()


def test_histogram_partitions_the_table(spark, sf_dir):
    hist = analytics.value_histogram(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert hist.agg(F.sum("n")).collect()[0][0] == ev.count()
    assert hist.filter(F.col("bin_lo") != F.col("bin") * 25.0).count() == 0
    # bins really bound their values
    joined = ev.join(
        hist.select("event_type", "bin"),
        (F.floor(F.col("value") / 25.0) == F.col("bin"))
        & (ev["event_type"] == hist["event_type"]),
        "left_anti",
    )
    assert joined.count() == 0


def test_event_transitions_hand_pinned(spark, tmp_path_factory):
    """Markov transitions: per-user lead order (ts, then event_id for ties),
    cross-user isolation, exact ppb row normalization."""
    from pulsar_topic_deduplicator_spark.operators.analytics import (
        event_transitions,
    )

    # user 1: A B A C (same-ts pair (2,3) ordered by event_id: B then A);
    # user 2: C A — isolated from user 1's chain
    rows = [
        (1, 1, "A", 1_000_000, 1.0, "{}"),
        (2, 1, "B", 2_000_000, 1.0, "{}"),
        (3, 1, "A", 2_000_000, 1.0, "{}"),
        (4, 1, "C", 3_000_000, 1.0, "{}"),
        (5, 2, "C", 1_000_000, 1.0, "{}"),
        (6, 2, "A", 2_000_000, 1.0, "{}"),
    ]
    path = tmp_path_factory.mktemp("trans")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, tus long,"
        " value double, props string",
    ).selectExpr(
        "event_id", "timestamp_micros(tus) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))

    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob_ppb"])
        for r in event_transitions(spark, str(path)).collect()
    }
    assert got == {
        ("A", "B"): (1, 500_000_000),   # A row: A→B, A→C (1 each of 2)
        ("A", "C"): (1, 500_000_000),
        ("B", "A"): (1, 1_000_000_000),  # tie at ts=2s: event_id 2 < 3
        ("C", "A"): (1, 1_000_000_000),  # user 2's chain, isolated
    }


def test_histogram_quantile_brackets_true_percentile(spark, tmp_path):
    """The merged-histogram quantile must bracket the exact percentile:
    true p-th value ∈ (est_upper − width, est_upper], with the rank math
    hand-checkable — 100 values 0.5, 25.5, 50.5, … (one per bin) make
    every quantile's crossing bin computable by eye. Data spans two days
    of hourly buckets so the daily answer genuinely MERGES hourly
    histograms."""
    import pyspark.sql.functions as F

    from pulsar_topic_deduplicator_spark.operators.analytics import (
        HIST_WIDTH,
        HQ_PERMILLES,
        histogram_quantile_rollup,
    )

    rows = []
    # day 0: values 0.5 + 25*i for i in 0..99, spread across 10 hours
    for i in range(100):
        rows.append((i, i % 10 * 3600, 0.5 + 25.0 * i))
    # day 1: constant value 12.5 → every quantile in bin 0
    for i in range(40):
        rows.append((1000 + i, 86400 + i % 4 * 3600, 12.5))
    path = tmp_path / "hq"
    spark.createDataFrame(
        rows, "event_id long, sec long, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("sec") + 1_700_006_400).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        "value",
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))

    out = {
        (r["bucket_day_us"], r["quantile_permille"]): r
        for r in histogram_quantile_rollup(spark, str(path)).collect()
    }
    day0 = 1_700_006_400 * 1_000_000
    day1 = day0 + 86_400_000_000
    # day 0: value i sits alone in bin i; rank ⌈q·100/1000⌉ crosses at bin
    # rank−1 → est_upper = rank·25
    for q in HQ_PERMILLES:
        rank = -(-100 * q // 1000)  # ceil
        r = out[(day0, q)]
        assert r["total_n"] == 100
        assert r["est_upper"] == rank * HIST_WIDTH
        true_val = 0.5 + 25.0 * (rank - 1)  # percentile_disc at rank
        assert r["est_upper"] - HIST_WIDTH < true_val <= r["est_upper"]
    # day 1: everything in bin 0 → every quantile reports 25.0
    for q in HQ_PERMILLES:
        r = out[(day1, q)]
        assert (r["total_n"], r["est_upper"]) == (40, HIST_WIDTH)


def test_ab_report_counts_reconcile(spark, sf_dir):
    """A/B readout invariants: arms partition the user pool, converters
    never exceed users, rates reproduce the exact counts, and the A/A
    z-score is finite (the AB_VALUE_MIN floor keeps pooled p strictly
    inside (0,1) — p=0 or 1 would zero the denominator)."""
    import math

    from pulsar_topic_deduplicator_spark.operators.analytics import (
        ab_test_report,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    r = ab_test_report(spark, sf_dir).collect()[0]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert r["n_c"] + r["n_t"] == n_users
    assert 0 < r["x_c"] <= r["n_c"] and 0 < r["x_t"] <= r["n_t"]
    assert r["rate_c"] == r["x_c"] / r["n_c"]
    assert r["rate_t"] == r["x_t"] / r["n_t"]
    assert math.isfinite(r["z_score"])


def test_trimmed_mean_is_outlier_robust(spark, sf_dir):
    """The trimmed mean must sit strictly inside the raw min/max, match a
    hand recomputation per group, and ignore a would-be outlier: groups
    are small enough at sf0.001 to replay in Python."""
    from pulsar_topic_deduplicator_spark.operators.analytics import (
        TRIM_PCT,
        trimmed_mean_by_type,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    got = {
        r["event_type"]: r
        for r in trimmed_mean_by_type(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", "event_id")
        .collect()
    )
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["value"], r["event_id"])
        )
    from decimal import Decimal

    for et, vals in by_type.items():
        vals.sort()
        k = len(vals) * TRIM_PCT // 100
        kept = [v for v, _ in vals[k : len(vals) - k]]
        assert got[et]["n_kept"] == len(kept)
        exact = float(
            sum(Decimal(f"{v:.2f}") for v in kept)
        ) / len(kept)
        assert abs(got[et]["trimmed_mean"] - exact) < 1e-9, et
