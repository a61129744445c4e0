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


def test_receiver_queue_size_parses_nonneg_int():
    # config.ts:233-235: optional non-negative integer, default 10
    assert EngineConfig.from_env({}).cache_reader_receiver_queue_size == 10
    cfg = EngineConfig.from_env(
        {"PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE": "0"}
    )
    assert cfg.cache_reader_receiver_queue_size == 0
    with pytest.raises(ConfigError):
        EngineConfig.from_env(
            {"PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE": "-1"}
        )
    with pytest.raises(ConfigError):
        EngineConfig.from_env(
            {"PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE": "many"}
        )
    # the connector option map carries it verbatim
    from pulsar_topic_deduplicator_spark.sources.formats import (
        pulsar_reader_options,
    )

    opts = pulsar_reader_options(
        "pulsar://x:6650", "persistent://t/.*", receiver_queue_size=10
    )
    assert opts["pulsar.consumer.receiverQueueSize"] == "10"


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


_OAUTH_FULL = {
    "PULSAR_OAUTH2_ISSUER_URL": "https://issuer.example",
    "PULSAR_OAUTH2_KEY_PATH": "/run/secrets/key.json",
    "PULSAR_OAUTH2_AUDIENCE": "urn:example:aud",
}


def test_oauth2_absent_when_unset():
    assert EngineConfig.from_env({}).oauth2 is None


def test_oauth2_all_three_accepted():
    cfg = EngineConfig.from_env(dict(_OAUTH_FULL))
    assert cfg.oauth2 is not None
    assert cfg.oauth2.issuer_url == "https://issuer.example"
    assert cfg.oauth2.key_path == "/run/secrets/key.json"
    assert cfg.oauth2.audience == "urn:example:aud"


@pytest.mark.parametrize("missing", sorted(_OAUTH_FULL))
def test_oauth2_all_or_none_rejects_partial(missing):
    """config.ts:142-168: any subset of the three set -> fail fast."""
    env = {k: v for k, v in _OAUTH_FULL.items() if k != missing}
    with pytest.raises(ConfigError, match="all must be defined"):
        EngineConfig.from_env(env)


@pytest.mark.parametrize("empty", sorted(_OAUTH_FULL))
def test_oauth2_empty_string_counts_as_missing(empty):
    """The reference's !v check treats '' as missing too."""
    env = dict(_OAUTH_FULL)
    env[empty] = ""
    with pytest.raises(ConfigError, match="all must be defined"):
        EngineConfig.from_env(env)


def test_pulsar_reader_option_contract():
    """Pin the emitted option names against the documented pulsar-spark
    connector surface (service.url/topicsPattern/startingOffsets, auth via
    pulsar.client.authPluginClassName+authParams) — reference consumer
    config src/config.ts:236-262, client auth src/pulsar.ts:4-16."""
    import json

    from pulsar_topic_deduplicator_spark.config import OAuth2Config
    from pulsar_topic_deduplicator_spark.sources.formats import (
        kafka_reader_options,
        pulsar_reader_options,
        pulsar_writer_options,
    )

    plain = pulsar_reader_options("pulsar://broker:6650", "persistent://t/ns/.*")
    assert plain == {
        "service.url": "pulsar://broker:6650",
        "topicsPattern": "persistent://t/ns/.*",
        "startingOffsets": "earliest",
    }

    auth = pulsar_reader_options(
        "pulsar+ssl://broker:6651",
        "persistent://t/ns/.*",
        oauth2=OAuth2Config("https://iss", "/k.json", "aud"),
    )
    assert (
        auth["pulsar.client.authPluginClassName"]
        == "org.apache.pulsar.client.impl.auth.oauth2.AuthenticationOAuth2"
    )
    assert json.loads(auth["pulsar.client.authParams"]) == {
        "type": "client_credentials",
        "issuerUrl": "https://iss",
        "privateKey": "/k.json",
        "audience": "aud",
    }

    assert pulsar_writer_options("pulsar://b:6650", "persistent://t/ns/out") == {
        "service.url": "pulsar://b:6650",
        "topic": "persistent://t/ns/out",
        "pulsar.producer.compressionType": "ZSTD",
    }

    assert kafka_reader_options("b1:9092,b2:9092", "events[.].*") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribePattern": "events[.].*",
        "startingOffsets": "earliest",
    }


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


def test_health_server_serves_real_http(spark, tmp_path):
    """The /healthz endpoint over a REAL socket: 204 while the query runs,
    500 after teardown, 404 elsewhere (reference src/healthCheck.ts:5-32)."""
    import urllib.error
    import urllib.request

    from pulsar_topic_deduplicator_spark.streaming.ops import serve_health

    state = {"up": True}

    def health():
        return (204, "") if state["up"] else (500, "streaming query not active")

    server, port = serve_health(health)
    try:
        resp = urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
        assert resp.status == 204
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/other")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        state["up"] = False
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert e.read() == b"streaming query not active"
    finally:
        server.shutdown()


def test_log_severity_bridge_matches_reference_table():
    """pino→cloud severity mapping (src/gcpLogging.ts:37-117)."""
    from pulsar_topic_deduplicator_spark.streaming.ops import (
        SEVERITY_BY_LEVEL,
        structured_log_record,
    )

    assert SEVERITY_BY_LEVEL["trace"] == "DEBUG"
    assert SEVERITY_BY_LEVEL["fatal"] == "CRITICAL"
    rec = structured_log_record("warn", "m", topic="t")
    assert rec == {"severity": "WARNING", "message": "m", "topic": "t"}
    assert structured_log_record("nope", "m")["severity"] == "DEFAULT"
