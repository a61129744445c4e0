"""Misra-Gries heavy hitters: unsaturated exactness, saturating-stream
guarantees (no overcount, bounded undercount, heavy-item recall), the
multi-partition merge, and the contract verdicts — on hand-built skewed
streams where the guarantees are non-vacuous."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators.heavyhitters import (
    MG_K,
    _mg_merged,
    mg_heavy_hitters,
    mg_heavy_hitters_contracts,
)

# skewed stream: user 0 dominates (50 of 140 rows = 36% > 1/16), users
# 1..30 get 3 rows each — 31 distinct users saturate the MG_K=15 counters
ROWS = [(i, 0, "click") for i in range(50)] + [
    (50 + 3 * (u - 1) + j, u, "view" if u % 2 else "click")
    for u in range(1, 31)
    for j in range(3)
]
N = len(ROWS)


@pytest.fixture(scope="module")
def hh_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("hh")
    spark.createDataFrame(
        ROWS, "event_id long, user_id long, event_type string"
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))
    return str(path)


def test_unsaturated_sketch_is_exact(spark, hh_dir):
    # 2 event types << MG_K: the sketch must equal the exact counts
    got = {
        r["item"]: r["est_count"]
        for r in mg_heavy_hitters(spark, hh_dir).collect()
    }
    assert got == {"click": 50 + 45, "view": 45}


def test_saturating_guarantees_nonvacuous(spark, hh_dir):
    assert N == 140
    row = mg_heavy_hitters_contracts(spark, hh_dir).collect()[0]
    assert row["n_events"] == N and row["k"] == MG_K
    # user 0 (50/140 = 36%) is far above n/(k+1) = 8.75: recall is a
    # real check here, not a vacuous pass
    assert row["all_heavy_present_ok"]
    assert row["no_overcount_ok"]
    assert row["undercount_bounded_ok"]
    assert row["at_most_k_ok"]


def test_multi_partition_merge_preserves_guarantees(spark):
    # same skew, forced across 8 partitions: per-partition summaries
    # merge through the offset step and every guarantee must survive
    df = spark.createDataFrame(
        [(u,) for _, u, _ in ROWS], "user_id long"
    ).repartition(8)
    mg = {
        r["item"]: r["est_count"] for r in _mg_merged(df, "user_id").collect()
    }
    true = {str(u): sum(1 for _, v, _ in ROWS if v == u) for u in range(31)}
    bound = N // (MG_K + 1)
    assert len(mg) <= MG_K
    assert "0" in mg  # the dominant user always survives
    for item, est in mg.items():
        assert est <= true[item]  # never overcounts
        assert true[item] - est <= bound  # bounded undercount
    # every heavy item (true > bound) is reported
    for item, t in true.items():
        if t > bound:
            assert item in mg


def test_weighted_unsaturated_is_exact(spark):
    # 3 items << MG_K, each row carrying a weight: the weighted sketch
    # must equal the exact weight sums on any partition layout
    df = spark.createDataFrame(
        [("a", 5), ("b", 7), ("a", 2), ("c", 1), ("b", 3)],
        "item_col string, w long",
    ).repartition(4)
    got = {
        r["item"]: r["est_count"]
        for r in _mg_merged(df, "item_col", "w").collect()
    }
    assert got == {"a": 7, "b": 10, "c": 1}


def test_weighted_saturating_guarantees_nonvacuous(spark):
    # same 31-user skew, but user 0's rows carry weight 10: W = 590,
    # bound = floor(590/16) = 36, user 0's true weight 500 >> bound —
    # recall, no-overcount and the weighted undercount bound are all
    # non-vacuous across a forced 8-partition layout
    rows = [(u, 10 if u == 0 else 1) for _, u, _ in ROWS]
    df = spark.createDataFrame(rows, "user_id long, w long").repartition(8)
    mg = {
        r["item"]: r["est_count"]
        for r in _mg_merged(df, "user_id", "w").collect()
    }
    true = {
        str(u): sum(w for v, w in rows if v == u) for u in range(31)
    }
    total = sum(w for _, w in rows)
    bound = total // (MG_K + 1)
    assert len(mg) <= MG_K
    assert "0" in mg  # the dominant weighted item always survives
    for item, est in mg.items():
        assert est <= true[item]
        assert true[item] - est <= bound
    for item, t in true.items():
        if t > bound:
            assert item in mg


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_weighted_random_streams_keep_guarantees(spark, seed):
    """Seeded random weighted streams across forced partition layouts:
    no-overcount, the W/(k+1) undercount bound, the ≤ k size bound, and
    heavy-item recall must hold for arbitrary skews."""
    import random

    rng = random.Random(seed)
    n_items = rng.randint(5, 120)  # spans unsaturated AND saturated
    rows = [
        (rng.randrange(n_items), rng.randint(1, 50))
        for _ in range(rng.randint(50, 400))
    ]
    # plant a heavy item so recall is non-vacuous under saturation
    rows += [(0, 40)] * 30
    df = spark.createDataFrame(rows, "item_col long, w long").repartition(
        rng.choice([1, 3, 8])
    )
    mg = {
        r["item"]: r["est_count"]
        for r in _mg_merged(df, "item_col", "w").collect()
    }
    true: dict[str, int] = {}
    for i, w in rows:
        true[str(i)] = true.get(str(i), 0) + w
    total = sum(w for _, w in rows)
    bound = total // (MG_K + 1)
    assert len(mg) <= MG_K
    for item, est in mg.items():
        assert est <= true[item], (seed, item)
        assert true[item] - est <= bound, (seed, item)
    for item, t in true.items():
        if t > bound:
            assert item in mg, (seed, item)


BASE_TS = 1704067200 * 1_000_000_000  # 2024-01-01 UTC in ns
NS = 1_000_000_000


def _write_full_events_file(spark, path, rows):
    """One parquet file per call in the driver events schema (the
    streaming source probes the physical schema, so the fixture must
    carry all six columns)."""
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("append").parquet(path)


def _stream_rows(u, i, etype):
    return (i, BASE_TS + i * NS, u, etype, 1.0, '{"k": "x"}')


def test_stream_heavy_hitters_unsaturated_batch_split_invariant(
    spark, tmp_path
):
    """Streaming MG over event_type (unsaturated): the accumulated
    summary equals the exact counts, and a one-file-per-trigger multi-
    batch replay produces the identical summary (no trim ever fires, so
    the cross-batch fold is plain addition)."""
    from pulsar_topic_deduplicator_spark.streaming.heavyhitters_stream import (
        run_stream_heavy_hitters_bounded,
    )

    src = str(tmp_path / "mg_stream_src")
    # 3 files, 2 event types
    _write_full_events_file(
        spark, src, [_stream_rows(1, i, "click") for i in range(6)]
    )
    _write_full_events_file(
        spark, src, [_stream_rows(2, 10 + i, "view") for i in range(4)]
    )
    _write_full_events_file(
        spark, src, [_stream_rows(3, 20 + i, "click") for i in range(5)]
    )
    uncapped = {
        r["item"]: r["est_count"]
        for r in run_stream_heavy_hitters_bounded(
            spark, src, glob_filter=None
        ).collect()
    }
    capped = {
        r["item"]: r["est_count"]
        for r in run_stream_heavy_hitters_bounded(
            spark, src, glob_filter=None, max_files_per_trigger=1
        ).collect()
    }
    assert uncapped == capped == {"click": 11, "view": 4}


def test_stream_heavy_hitters_saturating_keeps_guarantees(spark, tmp_path):
    """Streaming MG over user_id with 31 distinct users ≫ MG_K, replayed
    one file per trigger so trims fire ACROSS batches: every Misra-Gries
    guarantee must survive the batch-level fold — ≤ k rows, no overcount,
    undercount ≤ n/(k+1), and the dominant user present."""
    from pulsar_topic_deduplicator_spark.streaming.heavyhitters_stream import (
        run_stream_heavy_hitters_bounded,
    )

    src = str(tmp_path / "mg_sat_src")
    rows = [_stream_rows(0, i, "click") for i in range(50)] + [
        _stream_rows(u, 100 + 3 * (u - 1) + j, "view")
        for u in range(1, 31)
        for j in range(3)
    ]
    # split into 4 files so the cross-batch fold is exercised
    for c in range(4):
        _write_full_events_file(spark, src, rows[c * 35 : (c + 1) * 35])
    n = len(rows)
    got = {
        r["item"]: r["est_count"]
        for r in run_stream_heavy_hitters_bounded(
            spark, src, col="user_id", glob_filter=None,
            max_files_per_trigger=1,
        ).collect()
    }
    exact = {}
    for r in rows:
        exact[str(r[2])] = exact.get(str(r[2]), 0) + 1
    assert len(got) <= MG_K
    bound = n / (MG_K + 1)
    for item, est in got.items():
        assert est <= exact[item]  # no overcount
        assert exact[item] - est <= bound  # bounded undercount
    # user 0 (50/140 = 36% ≫ 1/16) must be present and dominant
    assert "0" in got and got["0"] == max(got.values())


def test_stream_heavy_hitters_fold_retry_is_idempotent(spark, tmp_path):
    """A foreachBatch RETRY re-invokes fold() with the same
    (batch_df, batch_id): the per-batch summary must overwrite its own
    batch_id-keyed slot, not double-fold into an accumulator (which
    inflated the retried batch's mass before the round-12 fix)."""
    from pulsar_topic_deduplicator_spark.streaming.heavyhitters_stream import (
        _make_fold,
        _merge_summaries,
    )

    src = str(tmp_path / "mg_retry_src")
    _write_full_events_file(
        spark,
        src,
        [_stream_rows(1, i, "click") for i in range(6)]
        + [_stream_rows(2, 10 + i, "view") for i in range(4)],
    )
    batch_df = spark.read.parquet(src)
    summaries: dict = {}
    fold = _make_fold(summaries, "event_type")
    fold(batch_df, 0)
    once = _merge_summaries(summaries)
    fold(batch_df, 0)  # the retry
    assert _merge_summaries(summaries) == once == {"click": 6, "view": 4}


def test_stream_heavy_hitters_prefix_compaction_bounds_driver_state(
    spark, tmp_path
):
    """ADVICE round 12: committed slots (batch < current) must compact
    into the ``_PREFIX_SLOT`` accumulator so driver state is O(k), not
    O(k · batches) — and the compacted merge must equal the uncompacted
    sequential fold bit-for-bit. A retry of the LIVE batch after
    compaction must still overwrite its own slot, leaving the prefix
    untouched."""
    from pulsar_topic_deduplicator_spark.streaming.heavyhitters_stream import (
        _PREFIX_SLOT,
        _make_fold,
        _merge_summaries,
    )

    src = str(tmp_path / "mg_compact_src")
    _write_full_events_file(
        spark,
        src,
        [_stream_rows(1, i, "click") for i in range(6)]
        + [_stream_rows(2, 10 + i, "view") for i in range(4)],
    )
    batch_df = spark.read.parquet(src)
    summaries: dict = {}
    fold = _make_fold(summaries, "event_type")
    for bid in range(3):
        fold(batch_df, bid)
        # only the prefix (absent on batch 0) and the live slot remain
        assert set(summaries) <= {_PREFIX_SLOT, bid}
    once = _merge_summaries(summaries)
    fold(batch_df, 2)  # retry of the live batch post-compaction
    assert _merge_summaries(summaries) == once
    assert once == {"click": 18, "view": 12}
    # the prefix holds exactly the fold state after batches 0 and 1
    assert dict(summaries[_PREFIX_SLOT]) == {"click": 12, "view": 8}


def test_merge_summaries_matches_online_fold_order(spark):
    """_merge_summaries folds slots in batch order with the identical
    add-trim-keep-positive arithmetic the online fold used — pin the
    trim path on a saturating two-batch fixture."""
    from pulsar_topic_deduplicator_spark.streaming.heavyhitters_stream import (
        _merge_summaries,
    )

    # batch 0: MG_K+1 distinct items forces a trim during the merge
    b0 = [(f"u{i}", 3) for i in range(MG_K + 1)]
    b1 = [("u0", 5), ("fresh", 2)]
    # replay the online fold by hand
    counters: dict = {}
    for batch in (b0, b1):
        for item, c in batch:
            counters[item] = counters.get(item, 0) + c
        if len(counters) > MG_K:
            off = sorted(counters.values(), reverse=True)[MG_K]
            for k in list(counters):
                v = counters[k] - off
                if v > 0:
                    counters[k] = v
                else:
                    del counters[k]
    assert _merge_summaries({0: b0, 1: b1}) == counters
    assert len(counters) <= MG_K
