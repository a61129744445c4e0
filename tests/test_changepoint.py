"""CUSUM drift flags: the prefix-min closed form must equal the
sequential recursion exactly (integer reference replayed per bucket), a
sustained shift must flag while an equal-volume spike does not, and the
fixture must match the DuckDB oracle bit-for-bit."""

from __future__ import annotations

import duckdb
import pytest

from pulsar_topic_deduplicator_spark.operators.changepoint import (
    CUSUM_H,
    ORACLES,
    cusum_drift_flags,
)

HOUR_US = 3_600_000_000

# type "drift": 10/hour for 18 h, then 22/hour for 6 h — the sustained
# run accumulates past CUSUM_H average-hours of excess (S reaches 1080
# then 1296 vs threshold 936).  type "spike": 10/hour with one 40-event
# hour — a huge z-score, but its one-bucket excess (690) stays under the
# threshold (810) and decays.  type "flat": constant control.
RATES = {
    "drift": [10] * 18 + [22] * 6,
    "spike": [10] * 11 + [40] + [10] * 12,
    "flat": [10] * 24,
}


def _expected(xs: list[int]) -> list[tuple[int, bool]]:
    """The sequential definition: S_t = max(0, S_{t-1} + (n·x_t − total))."""
    n, total = len(xs), sum(xs)
    s, out = 0, []
    for x in xs:
        s = max(0, s + n * x - total)
        out.append((s, s > total * CUSUM_H))
    return out


@pytest.fixture(scope="module")
def cp_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("cusum")
    rows = []
    eid = 0
    for etype, xs in RATES.items():
        for h, x in enumerate(xs):
            for _ in range(x):
                # full events schema: the streaming source projects every
                # column even though the monitor only reads (event_type, ts)
                rows.append((eid, etype, h * HOUR_US, eid % 7, 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, tus long, user_id long,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "timestamp_micros(tus) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.mode("overwrite").parquet(str(path / "events.parquet"))
    return str(path)


def test_cusum_matches_sequential_reference(spark, cp_dir):
    got = {
        (r["event_type"], r["bucket_us"]): (r["cusum_scaled"], r["is_drift"])
        for r in cusum_drift_flags(spark, cp_dir).collect()
    }
    for etype, xs in RATES.items():
        exp = _expected(xs)
        for h, (s, flag) in enumerate(exp):
            assert got[(etype, h * HOUR_US)] == (s, flag), (etype, h)
    # the sustained shift flags, the equal-or-larger spike and the
    # control never do
    assert any(flag for (t, _), (_, flag) in got.items() if t == "drift")
    assert not any(flag for (t, _), (_, flag) in got.items() if t == "spike")
    assert not any(flag for (t, _), (_, flag) in got.items() if t == "flat")


def test_cusum_matches_oracle_on_fixture(spark, cp_dir):
    got = sorted(
        tuple(r) for r in cusum_drift_flags(spark, cp_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{cp_dir}/events.parquet/*.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(ORACLES["cusum_drift_flags"]).fetchall()
    )
    assert got == want


def test_stream_drift_equals_batch(spark, cp_dir):
    """The streamed (complete-mode, availableNow) bucket table drained over
    the fixture must produce bit-identical CUSUM flags to the batch scan."""
    from pulsar_topic_deduplicator_spark.streaming.drift import (
        run_stream_drift_bounded,
    )

    # the fixture's events.parquet is a directory of part files — stream
    # the directory itself (no file-name glob)
    got = sorted(
        tuple(r)
        for r in run_stream_drift_bounded(
            spark, f"{cp_dir}/events.parquet"
        ).collect()
    )
    batch = sorted(
        tuple(r) for r in cusum_drift_flags(spark, cp_dir).collect()
    )
    assert got == batch and len(got) == 72  # 3 types × 24 hours


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_cusum_random_series_match_sequential_reference(
    spark, tmp_path_factory, seed
):
    """Seeded random bucket series: the window-function closed form must
    equal the sequential recursion on arbitrary integer data, including
    empty-feeling flats and repeated saturations."""
    import random

    rng = random.Random(seed)
    rates = {
        f"t{k}": [rng.randint(0, 40) for _ in range(rng.randint(2, 30))]
        for k in range(4)
    }
    rows, eid = [], 0
    for etype, xs in rates.items():
        for h, x in enumerate(xs):
            for _ in range(x):
                rows.append((eid, etype, h * HOUR_US, eid % 5, 1.0, "{}"))
                eid += 1
    path = tmp_path_factory.mktemp(f"cusum_r{seed}")
    spark.createDataFrame(
        rows,
        "event_id long, event_type string, tus long, user_id long,"
        " value double, props string",
    ).selectExpr(
        "event_id", "timestamp_micros(tus) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))

    got = {
        (r["event_type"], r["bucket_us"]): (r["cusum_scaled"], r["is_drift"])
        for r in cusum_drift_flags(spark, str(path)).collect()
    }
    for etype, xs in rates.items():
        # zero-count hours carry no rows, so the operator sees only the
        # observed buckets — replay the reference over the same subset
        observed = [(h, x) for h, x in enumerate(xs) if x > 0]
        sub = [x for _, x in observed]
        exp = _expected(sub)
        assert len([k for k in got if k[0] == etype]) == len(observed)
        for (h, _), (s, flag) in zip(observed, exp):
            assert got[(etype, h * HOUR_US)] == (s, flag), (seed, etype, h)
