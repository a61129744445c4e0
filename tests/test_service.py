"""End-to-end service composition — the reference's main() order
(src/index.ts:107-213): env config → warm-up from the service's OWN prior
output → live dedup with the ignored-properties projection → health /
counters / graceful stop."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.config import EngineConfig
from pulsar_topic_deduplicator_spark.service import (
    run_dedup_service_bounded,
    start_dedup_service,
    warmup_seed_digests,
)

BASE_TS = 1704067200 * 1_000_000_000  # 2024-01-01 UTC in ns
NS = 1_000_000_000


def _write_events(spark, path, rows):
    sdf = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        ),
        schema=(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        ),
    )
    sdf.coalesce(1).write.mode("append").parquet(path)


def test_service_end_to_end_with_warmup_and_ignored_props(spark, tmp_path):
    """Full wiring: a prior-output table carrying origin digests seeds the
    state (op #11), so live re-deliveries of already-output messages are
    suppressed; the ignored-properties projection (op #4) makes two live
    messages differing only in an ignored key collapse to one."""
    from pulsar_topic_deduplicator_spark.streaming.dedup import message_digest

    config = EngineConfig.from_env(
        {
            "DEDUPLICATION_WINDOW_IN_SECONDS": "3600",
            "CACHE_WINDOW_IN_SECONDS": "172800",
            "DEDUPLICATION_IGNORED_PROPERTIES": '["mqttQos"]',
        }
    )
    assert config.ignored_properties == ("mqttQos",)

    sf_style_dir = str(tmp_path / "svc_src")
    src = f"{sf_style_dir}/events.parquet"  # sf-layout: a parquet dir per table
    rows = [
        # pair differing ONLY in the ignored property -> one survivor
        (1, BASE_TS + 0 * NS, 1, "click", 1.0, '{"k": "1", "mqttQos": "0"}'),
        (2, BASE_TS + 60 * NS, 1, "click", 1.0, '{"k": "1", "mqttQos": "1"}'),
        # distinct content
        (3, BASE_TS + 120 * NS, 2, "view", 2.0, '{"k": "2"}'),
        # re-delivery of a message the service already output (warm-up hit)
        (4, BASE_TS + 180 * NS, 3, "purchase", 3.0, '{"k": "3"}'),
    ]
    _write_events(spark, src, rows)

    # the service's prior output: message 4's content, with origin lineage —
    # exactly what the reference re-reads from its output topic
    from pulsar_topic_deduplicator_spark.sources.io import messages_view

    prior = (
        messages_view(spark, sf_style_dir)
        .filter(F.col("message_id") == "4")
        .withColumn("digest", message_digest(config.ignored_properties))
        .select(
            "publish_ts",
            "event_ts",
            F.to_json(F.array(F.col("digest"))).alias("origin"),
        )
    )
    out = run_dedup_service_bounded(
        spark,
        config,
        src,
        str(tmp_path / "svc_ckpt"),
        prior_output=prior,
        now_ts="2024-01-01 01:00:00",
        exact_processing_ttl=True,
        use_tws=False,
    )
    emitted = {r["message_id"] for r in out.collect() if r["message_id"]}
    # 1 wins over its ignored-prop twin 2; 3 is unique; 4 was warm-up-seeded
    assert emitted == {"1", "3"}
    # the suppressed duplicates surface in dropped telemetry rows
    n_dropped = out.agg(F.sum("n_dropped")).first()[0]
    assert n_dropped == 2

    # DEFAULT kernel (JVM watermark TTL, round-9 flip): same composition,
    # same forwarded digests — the warm-up seeding runs as a stream-static
    # anti-join, the ignored-props projection shapes the same digest, and
    # exactly one of the {1,2} ignored-prop twins survives (which one is
    # engine-arbitrary under in-batch first-seen; the EXACT kernel above
    # pins the deterministic winner)
    wm_out = run_dedup_service_bounded(
        spark,
        config,
        src,
        str(tmp_path / "svc_wm_ckpt"),
        prior_output=prior,
        now_ts="2024-01-01 01:00:00",
    )
    wm_rows = wm_out.collect()
    assert "n_dropped" not in wm_out.columns  # full-row output, no counters
    wm_ids = {r["message_id"] for r in wm_rows}
    assert len(wm_ids) == 2 and "3" in wm_ids and wm_ids & {"1", "2"}
    assert "4" not in wm_ids  # warm-up-seeded digest suppressed


def test_service_lifecycle_health_counters_stop(spark, tmp_path):
    """Ops #13-#15 through the service handle on the DEFAULT (JVM
    watermark TTL) kernel: healthy while active, graceful stop terminates,
    unhealthy afterwards."""
    src = str(tmp_path / "live_src")
    _write_events(
        spark, src, [(1, BASE_TS, 1, "click", 1.0, '{"k": "1"}')]
    )
    config = EngineConfig.from_env({"CACHE_WINDOW_IN_SECONDS": "0"})
    assert not config.warmup_enabled  # src/cacheBuilding.ts:71-77
    svc = start_dedup_service(
        spark, config, src, str(tmp_path / "live_ckpt")
    )
    try:
        svc.query.processAllAvailable()
        assert svc.health() == (204, "")
        assert svc.output().count() == 1
    finally:
        assert svc.stop()
    status, _body = svc.health()
    assert status == 500


def test_service_dq_gate_quarantines_and_counters_reconcile(spark, tmp_path):
    """VERDICT r5 item 8: the DQ gate composed as an ingest pre-filter —
    dirty rows are quarantined with their violated constraints and never
    reach the dedup state; forwarded + dropped + quarantined must equal the
    input row count exactly."""
    from pulsar_topic_deduplicator_spark.service import run_gated_service_bounded

    src = str(tmp_path / "gated_src")
    rows = [
        (1, BASE_TS + 0 * NS, 1, "click", 1.0, '{"k": "1"}'),
        (2, BASE_TS + 60 * NS, 1, "click", 1.0, '{"k": "1"}'),  # dup of 1
        (None, BASE_TS + 120 * NS, 2, "view", 2.0, '{"k": "2"}'),  # null id
        (4, BASE_TS + 180 * NS, 3, "bogus", 3.0, '{"k": "3"}'),  # bad vocab
        (5, 100 * NS, 4, "view", 4.0, '{"k": "4"}'),  # ts out of range
        (6, BASE_TS + 240 * NS, 5, "purchase", 5.0, '{"k": "5"}'),
    ]
    spark.createDataFrame(
        rows,
        schema=(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        ),
    ).coalesce(1).write.mode("append").parquet(src)

    out, quarantine, exact_n_clean = run_gated_service_bounded(
        spark,
        EngineConfig(),
        src,
        str(tmp_path / "ck_gated"),
        exact_processing_ttl=True,
        use_tws=False,
    )
    q = quarantine.collect()
    viol = {r["message_id"]: set(r["violations"]) for r in q}
    assert viol == {
        None: {"message_id_not_null"},
        "4": {"topic_in_vocab"},
        "5": {"event_ts_in_range"},
    }
    forwarded = out.filter(F.col("message_id").isNotNull()).count()
    dropped = out.agg(F.sum("n_dropped")).collect()[0][0] or 0
    assert forwarded == 2  # digest(1|2) once, digest(6) once
    assert dropped == 1  # event 2, duplicate content inside the gate
    assert forwarded + dropped + len(q) == len(rows)
    assert exact_n_clean == forwarded + dropped

    # the DEFAULT path (JVM watermark TTL kernel, round-9 flip): identical
    # gate verdicts, identical counter reconciliation — dropped derives
    # from the observe() clean-ingest counter on this kernel
    wm_out, wm_quarantine, n_clean = run_gated_service_bounded(
        spark, EngineConfig(), src
    )
    wm_viol = {
        r["message_id"]: set(r["violations"]) for r in wm_quarantine.collect()
    }
    assert wm_viol == viol
    wm_forwarded = wm_out.count()
    assert wm_forwarded == forwarded
    assert n_clean - wm_forwarded == dropped
    assert wm_forwarded + (n_clean - wm_forwarded) + len(wm_viol) == len(rows)


def test_dq_gate_with_messages_override_quarantines_same_stream(spark, tmp_path):
    """ADVICE r6 (medium) regression: combining ``dq_gate=True`` with a
    ``messages`` transport override must derive the quarantine from the
    SAME overridden stream. Before the fix the quarantine side read
    ``source_dir`` — here a placeholder path, which used to crash the side
    query (or, with a real-but-different path, desynchronize counters)."""
    from pulsar_topic_deduplicator_spark.service import start_dedup_service
    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_message_stream,
    )

    src = str(tmp_path / "override_src")
    rows = [
        (1, BASE_TS + 0 * NS, 1, "click", 1.0, '{"k": "1"}'),
        (2, BASE_TS + 60 * NS, 1, "click", 1.0, '{"k": "1"}'),  # dup of 1
        (None, BASE_TS + 120 * NS, 2, "view", 2.0, '{"k": "2"}'),  # dirty
        (6, BASE_TS + 240 * NS, 5, "purchase", 5.0, '{"k": "5"}'),
    ]
    _write_events(spark, src, rows)
    config = EngineConfig.from_env({"CACHE_WINDOW_IN_SECONDS": "0"})
    # the override is the transport; source_dir is a placeholder that MUST
    # be ignored by both the dedup and the quarantine queries
    svc = start_dedup_service(
        spark,
        config,
        str(tmp_path / "does_not_exist"),
        str(tmp_path / "override_ckpt"),
        exact_processing_ttl=True,
        use_tws=False,
        dq_gate=True,
        messages=events_message_stream(spark, src),
    )
    try:
        svc.query.processAllAvailable()
        svc.quarantine_query.processAllAvailable()
        q = svc.quarantine().collect()
        assert {r["message_id"] for r in q} == {None}  # the null-id row
        forwarded = svc.output().filter(
            F.col("message_id").isNotNull()
        ).count()
        dropped = (
            svc.output().agg(F.sum("n_dropped")).collect()[0][0] or 0
        )
        assert forwarded == 2  # digest(1|2) once, digest(6) once
        assert dropped == 1
        assert forwarded + dropped + len(q) == len(rows)
        assert svc.counters().get("n_quarantined") == 1
    finally:
        svc.stop()
