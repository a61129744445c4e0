"""Streaming admission control (VERDICT r8 item 6): the reference bounds
its warm-up reader with a 10-message receive queue
(``PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE``, src/config.ts:231-235) so a
backlog replay cannot blow past client memory. The engine analog is
``maxFilesPerTrigger`` rate limiting on the file source: a capped run
processes the backlog in bounded micro-batch slices, and the dedup output
must be IDENTICAL to the uncapped single-batch run — the batch-split
invariance that makes the cap a pure memory knob, never a semantics knob.
"""

from __future__ import annotations

import pandas as pd

from pulsar_topic_deduplicator_spark.config import EngineConfig
from pulsar_topic_deduplicator_spark.service import start_dedup_service

BASE_TS = 1704067200 * 1_000_000_000  # 2024-01-01 UTC in ns
NS = 1_000_000_000


def _append_one_file(spark, path, rows):
    spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        ),
        schema=(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        ),
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, cap):
    svc = start_dedup_service(
        spark,
        EngineConfig.from_env({"CACHE_WINDOW_IN_SECONDS": "0"}),
        src,
        ckpt,
        max_files_per_trigger=cap,
    )
    try:
        svc.query.processAllAvailable()
        digests = {r["digest"] for r in svc.output().select("digest").collect()}
        n_rows = svc.output().count()
        data_batches = sum(
            1 for p in svc.query.recentProgress if p["numInputRows"] > 0
        )
    finally:
        svc.stop()
    return digests, n_rows, data_batches


def test_max_files_per_trigger_bounds_batches_and_preserves_output(
    spark, tmp_path
):
    """Four backlog files with duplicates WITHIN a file, ACROSS adjacent
    files, and ACROSS distant files. Capped at one file per trigger the
    engine must take ≥4 micro-batches (the admission bound), suppress the
    cross-batch duplicates from state (not in-batch collapse), and emit
    exactly the uncapped run's digest set."""
    src = str(tmp_path / "backlog_src")
    k = lambda i: f'{{"k": "{i}"}}'  # noqa: E731
    # content identity = (event_type, value, props); ids/ts vary per delivery
    _append_one_file(
        spark,
        src,
        [
            (1, BASE_TS + 0 * NS, 1, "click", 1.0, k(1)),
            (2, BASE_TS + 1 * NS, 1, "click", 1.0, k(1)),  # in-file dup of 1
            (3, BASE_TS + 2 * NS, 2, "view", 2.0, k(2)),
        ],
    )
    _append_one_file(
        spark,
        src,
        [
            (4, BASE_TS + 3 * NS, 2, "view", 2.0, k(2)),  # dup of 3 (adjacent)
            (5, BASE_TS + 4 * NS, 3, "purchase", 3.0, k(3)),
        ],
    )
    _append_one_file(
        spark,
        src,
        [(6, BASE_TS + 5 * NS, 4, "click", 4.0, k(4))],
    )
    _append_one_file(
        spark,
        src,
        [
            (7, BASE_TS + 6 * NS, 1, "click", 1.0, k(1)),  # dup of 1 (distant)
            (8, BASE_TS + 7 * NS, 5, "view", 5.0, k(5)),
        ],
    )

    capped, capped_rows, capped_batches = _run(
        spark, src, str(tmp_path / "ck_capped"), cap=1
    )
    uncapped, uncapped_rows, uncapped_batches = _run(
        spark, src, str(tmp_path / "ck_uncapped"), cap=None
    )

    # admission bound honored: one file per micro-batch → ≥4 data batches
    assert capped_batches >= 4
    assert uncapped_batches <= capped_batches
    # batch-split invariance: identical survivors, exactly one row per
    # distinct content digest (5 distinct contents among 8 deliveries)
    assert capped == uncapped
    assert capped_rows == uncapped_rows == len(capped) == 5


def test_capped_ingest_with_warmup_antijoin_seeding(spark, tmp_path):
    """Admission control composed with the default kernel's warm-up
    seeding (round-9 service flip): the seed set is STATIC, so a seeded
    digest is suppressed in EVERY micro-batch of a capped multi-batch
    replay — including the first — with no ordering caveat."""
    from pyspark.sql import functions as F

    from pulsar_topic_deduplicator_spark.service import (
        run_dedup_service_bounded,
    )
    from pulsar_topic_deduplicator_spark.sources.io import messages_view
    from pulsar_topic_deduplicator_spark.streaming.dedup import message_digest

    base = str(tmp_path / "warm_base")  # sf-layout dir for messages_view
    src = f"{base}/events.parquet"
    k = lambda i: f'{{"k": "{i}"}}'  # noqa: E731
    # two files; the seeded content appears in BOTH batches
    _append_one_file(
        spark,
        src,
        [
            (1, BASE_TS + 0 * NS, 1, "click", 1.0, k(1)),  # seeded content
            (2, BASE_TS + 1 * NS, 2, "view", 2.0, k(2)),
        ],
    )
    _append_one_file(
        spark,
        src,
        [
            (3, BASE_TS + 2 * NS, 1, "click", 1.0, k(1)),  # seeded again
            (4, BASE_TS + 3 * NS, 3, "purchase", 3.0, k(3)),
        ],
    )
    # prior output = message 1's content with origin lineage (the service's
    # own output topic shape)
    prior = (
        messages_view(spark, base)
        .filter(F.col("message_id") == "1")
        .withColumn("digest", message_digest())
        .select(
            "publish_ts",
            "event_ts",
            F.to_json(F.array(F.col("digest"))).alias("origin"),
        )
    )
    out = run_dedup_service_bounded(
        spark,
        EngineConfig.from_env({"CACHE_WINDOW_IN_SECONDS": "172800"}),
        src,
        str(tmp_path / "warm_ck"),
        prior_output=prior,
        now_ts="2024-01-01 01:00:00",
    )
    ids = {r["message_id"] for r in out.collect()}
    # 1 and 3 share the warm-up-seeded digest: both suppressed; 2 and 4 pass
    assert ids == {"2", "4"}


def test_quota_cap_keeps_earliest_k_and_counts_overflow(spark, tmp_path):
    """A flooding user is capped at QUOTA_K per hour window (earliest by
    (ts, event_id) kept, overflow counted); a quiet user in the same hour
    is untouched — the per-(user, window) isolation that makes quota a
    governance primitive, not a global rate limit."""
    from pulsar_topic_deduplicator_spark.operators.dedup import (
        QUOTA_K,
        quota_cap_events,
    )

    base = str(tmp_path / "quota_base")
    rows = (
        # user 1 floods hour 0 with 9 events (ids 0..8, one per minute)
        [(i, BASE_TS + i * 60 * NS, 1, "click", 1.0, '{"k":"1"}')
         for i in range(9)]
        # user 2 sends 2 events in the same hour
        + [(100, BASE_TS + 5 * 60 * NS, 2, "view", 1.0, '{"k":"2"}'),
           (101, BASE_TS + 6 * 60 * NS, 2, "view", 1.0, '{"k":"2"}')]
        # user 1 again in the NEXT hour: fresh window, 2 events kept
        + [(200, BASE_TS + 3700 * NS, 1, "click", 1.0, '{"k":"1"}'),
           (201, BASE_TS + 3800 * NS, 1, "click", 1.0, '{"k":"1"}')]
    )
    _append_one_file(spark, f"{base}/events.parquet", rows)
    out = quota_cap_events(spark, base).collect()
    kept = {r["event_id"] for r in out}
    # earliest QUOTA_K of the flood + both quiet-user events + next hour
    assert kept == set(range(QUOTA_K)) | {100, 101, 200, 201}
    flood = [r for r in out if r["user_id"] == 1 and r["event_id"] < 100]
    assert all(r["n_overflow"] == 9 - QUOTA_K for r in flood)
    assert {r["rank_in_window"] for r in flood} == set(range(1, QUOTA_K + 1))
    quiet = [r for r in out if r["user_id"] == 2]
    assert all(r["n_overflow"] == 0 for r in quiet)


def test_stream_quota_is_batch_split_invariant(spark, tmp_path):
    """Streaming quota fold (quota_stream.py): processing the backlog one
    file per trigger — with a LATE file carrying the EARLIEST rows — must
    admit exactly the global earliest-K per (user, window): the mergeable
    k-smallest summary evicts a previously admitted later event when the
    genuinely earlier straggler arrives."""
    from pulsar_topic_deduplicator_spark.operators.dedup import QUOTA_K
    from pulsar_topic_deduplicator_spark.streaming.quota_stream import (
        run_stream_quota_bounded,
    )

    src = str(tmp_path / "src")
    # one user, one hour window, 2*QUOTA_K+2 events; the earliest two rows
    # arrive LAST (straggler file)
    n = 2 * QUOTA_K + 2
    later = [
        (100 + i, BASE_TS + (i + 2) * NS, 1, "click", 1.0, "{}")
        for i in range(n - 2)
    ]
    early = [
        (1, BASE_TS, 1, "click", 1.0, "{}"),
        (2, BASE_TS + NS, 1, "click", 1.0, "{}"),
    ]
    _append_one_file(spark, src, later)
    _append_one_file(spark, src, early)

    out = run_stream_quota_bounded(
        spark,
        src,
        str(tmp_path / "w1"),
        glob_filter="*.parquet",
        max_files_per_trigger=1,
    )
    kept = sorted(r["event_id"] for r in out.collect())
    # global earliest K = the two stragglers + the first K-2 of the rest
    expected = sorted([1, 2] + [100 + i for i in range(QUOTA_K - 2)])
    assert kept == expected
    assert {r["rank_in_window"] for r in out.collect()} == set(
        range(1, QUOTA_K + 1)
    )

    # and the capped multi-batch run equals an uncapped single-batch run
    single = run_stream_quota_bounded(
        spark, src, str(tmp_path / "w2"), glob_filter="*.parquet"
    )
    assert {tuple(r) for r in single.collect()} == {
        tuple(r) for r in out.collect()
    }
