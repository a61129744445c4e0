"""Config parsing (reference src/config.ts semantics) + operational analogs
(health, observe counters, graceful stop)."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.config import ConfigError, EngineConfig


def test_defaults_match_reference():
    cfg = EngineConfig.from_env({})
    assert cfg.dedup_window_seconds == 3600.0  # config.ts:133-134
    assert cfg.cache_window_seconds == 172800.0  # config.ts:100-102
    assert cfg.ignored_properties == ()
    assert cfg.health_check_port == 8080
    assert cfg.warmup_enabled


def test_windows_parse_as_floats_not_ints():
    # the reference parses these as non-negative FLOATS (config.ts:74-84)
    cfg = EngineConfig.from_env({"DEDUPLICATION_WINDOW_IN_SECONDS": "0.5"})
    assert cfg.dedup_window_seconds == 0.5
    assert cfg.dedup_window_ms == 500


def test_negative_window_rejected():
    with pytest.raises(ConfigError):
        EngineConfig.from_env({"DEDUPLICATION_WINDOW_IN_SECONDS": "-1"})


def test_non_numeric_window_rejected():
    with pytest.raises(ConfigError):
        EngineConfig.from_env({"CACHE_WINDOW_IN_SECONDS": "soon"})


def test_zero_cache_window_disables_warmup():
    # cacheBuilding.ts:71-77: skip warm-up entirely for window <= 0
    cfg = EngineConfig.from_env({"CACHE_WINDOW_IN_SECONDS": "0"})
    assert not cfg.warmup_enabled


def test_ignored_properties_json_array():
    cfg = EngineConfig.from_env(
        {"DEDUPLICATION_IGNORED_PROPERTIES": '["mqttQos", "mqttIsRetained"]'}
    )
    assert cfg.ignored_properties == ("mqttQos", "mqttIsRetained")


@pytest.mark.parametrize(
    "raw", ['"notalist"', '["", "x"]', "[1, 2]", "not json"]
)
def test_ignored_properties_invalid_rejected(raw):
    with pytest.raises(ConfigError):
        EngineConfig.from_env({"DEDUPLICATION_IGNORED_PROPERTIES": raw})


def test_bool_parse_strict():
    assert EngineConfig.from_env(
        {"CACHE_REBUILD_DISABLE_SEEK": "true"}
    ).cache_rebuild_disable_seek
    with pytest.raises(ConfigError):
        EngineConfig.from_env({"CACHE_REBUILD_DISABLE_SEEK": "yes"})


def test_health_and_counters_and_graceful_stop(spark, tmp_path):
    """Live-query pass over ops #13-#15: health 204 while active, observe()
    counters in progress, graceful stop -> health 500."""
    from pulsar_topic_deduplicator_spark.streaming.dedup import dedup_stream
    from pulsar_topic_deduplicator_spark.streaming.ops import (
        graceful_stop,
        health_status,
        observed_counters,
    )
    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_message_stream,
    )

    from .test_streaming import BATCH1, _write_batch

    src = str(tmp_path / "ops_src")
    _write_batch(spark, src, BATCH1)
    deduped = dedup_stream(events_message_stream(spark, src))
    query = (
        deduped.writeStream.format("memory")
        .queryName("ops_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        assert health_status(query)[0] == 204
        counters = observed_counters(query)
        assert counters.get("n_forwarded") == 3  # BATCH1: 4 rows, 1 duplicate
    finally:
        assert graceful_stop(query)
    assert health_status(query)[0] == 500
