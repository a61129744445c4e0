"""RocksDB state store + changelog checkpointing on the DEFAULT watermark
TTL kernel (VERDICT r9 item 7 — the 100 TB state story SURVEY §M4
promises): at scale, dedup state lives out-of-heap in per-partition
RocksDB instances with changelog (incremental) checkpointing, not in the
default in-memory HDFS-backed provider. These tests run the bounded
service kernel under BOTH providers through a stop → new-data → restart
cycle and pin IDENTICAL output: the provider is a storage choice, never a
semantics choice.
"""

from __future__ import annotations

import pytest

from .test_streaming import BATCH1, BATCH2, _write_batch

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
_HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _run_bounded(spark, src: str, out: str, ckpt: str) -> None:
    """One availableNow run of the watermark-TTL kernel into a parquet
    sink (the restartable sink — memory sinks cannot recover state)."""
    from pulsar_topic_deduplicator_spark.streaming.dedup import (
        dedup_stream_ingest_ttl,
    )
    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_message_stream,
    )

    query = (
        dedup_stream_ingest_ttl(events_message_stream(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def _restart_cycle(spark, tmp_path, tag: str) -> set[str]:
    """start → drain BATCH1 → stop → BATCH2 arrives → restart from the
    same checkpoint; return the cumulative forwarded message ids."""
    src = str(tmp_path / f"src_{tag}")
    out = str(tmp_path / f"out_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    _write_batch(spark, src, BATCH1)
    _run_bounded(spark, src, out, ckpt)
    first = {r["message_id"] for r in spark.read.parquet(out).collect()}
    assert first == {"1", "2", "4"}, f"[{tag}] first run: {first}"
    _write_batch(spark, src, BATCH2)
    _run_bounded(spark, src, out, ckpt)
    return {r["message_id"] for r in spark.read.parquet(out).collect()}


@pytest.mark.parametrize(
    "provider, confs",
    [
        pytest.param("hdfs", {_PROVIDER_CONF: _HDFS}, id="hdfs-backed"),
        pytest.param(
            "rocksdb",
            {_PROVIDER_CONF: _ROCKSDB, _CHANGELOG_CONF: "true"},
            id="rocksdb-changelog",
        ),
    ],
)
def test_watermark_kernel_restart_survives_provider(
    spark, tmp_path, provider, confs
):
    """Dedup state must survive a stop/restart on either provider: the
    BATCH2 duplicate of message 2 stays suppressed across the restart and
    only the genuinely-new message 6 is added."""
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        rows = _restart_cycle(spark, tmp_path, provider)
        assert rows == {"1", "2", "4", "6"}, f"[{provider}] {rows}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_providers_produce_identical_output(spark, tmp_path):
    """The storage provider must never change WHAT is forwarded — run the
    same cycle under both providers and compare the full output sets."""
    results = {}
    for provider, confs in (
        ("hdfs", {_PROVIDER_CONF: _HDFS}),
        ("rocksdb", {_PROVIDER_CONF: _ROCKSDB, _CHANGELOG_CONF: "true"}),
    ):
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            results[provider] = _restart_cycle(
                spark, tmp_path, f"pair_{provider}"
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    assert results["hdfs"] == results["rocksdb"] == {"1", "2", "4", "6"}


def test_full_service_composition_restarts_on_rocksdb(spark, tmp_path):
    """Directive closure (VERDICT r9 item 7, service-level): the FULL
    bounded service composition (config → default watermark kernel) run
    under the RocksDB provider with changelog checkpointing, stopped,
    then restarted from the same checkpoint after new data arrives —
    dedup state must survive the restart (the BATCH2 duplicate stays
    suppressed; only the new message flows)."""
    from pulsar_topic_deduplicator_spark.config import EngineConfig
    from pulsar_topic_deduplicator_spark.service import (
        run_dedup_service_bounded,
    )

    confs = {_PROVIDER_CONF: _ROCKSDB, _CHANGELOG_CONF: "true"}
    saved = {k: spark.conf.get(k, None) for k in confs}
    config = EngineConfig.from_env(
        {
            "DEDUPLICATION_WINDOW_IN_SECONDS": "3600",
            "CACHE_WINDOW_IN_SECONDS": "172800",
        }
    )
    src = str(tmp_path / "svc_rocks_events")
    ckpt = str(tmp_path / "svc_rocks_ckpt")
    out = str(tmp_path / "svc_rocks_out")
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        _write_batch(spark, src, BATCH1)
        first = run_dedup_service_bounded(
            spark, config, src, ckpt, output_dir=out
        )
        assert {r["message_id"] for r in first.collect()} == {"1", "2", "4"}
        _write_batch(spark, src, BATCH2)
        second = run_dedup_service_bounded(
            spark, config, src, ckpt, output_dir=out
        )
        # the parquet sink is cumulative; the restarted query processed
        # ONLY the new file, and RocksDB state recovery suppressed the
        # duplicate of message 2 — only message 6 was added
        assert {r["message_id"] for r in second.collect()} == {
            "1", "2", "4", "6",
        }
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
