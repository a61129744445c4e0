"""Batch source/sink formats beyond parquet.

The reference's only I/O is Pulsar (ops #1–#3); an analytics engine needs
the standard lake formats. All readers take EXPLICIT schemas (no inference
— inference is a full extra pass over 100 TB and can mis-type columns), all
writers support the engine's compression knob (reference op #3's ZSTD
default, ``src/config.ts:198-214``).

Kafka/Pulsar streaming connectors: the engine's streaming surface
(streaming/source.py) reads any Structured Streaming source; the production
line is ``spark.readStream.format("pulsar"|"kafka")`` with
``topicsPattern``/``subscribePattern`` (reference op #1's regex
subscription). No broker exists in the test container, so those lines are
configuration, not code — see ``pulsar_reader_options``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_CODEC = "zstd"  # the reference's default sink compression


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", codec: str = DEFAULT_CODEC
) -> None:
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.option("compression", codec).parquet(path)
    elif fmt == "orc":
        writer.option("compression", codec).orc(path)
    elif fmt == "json":
        writer.option("compression", "gzip" if codec == "zstd" else codec).json(path)
    elif fmt == "csv":
        writer.option("header", True).option(
            "compression", "gzip" if codec == "zstd" else codec
        ).csv(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def read_table(
    spark: SparkSession, path: str, schema: T.StructType | str, fmt: str = "parquet"
) -> DataFrame:
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path)
    if fmt == "orc":
        return spark.read.schema(schema).orc(path)
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    if fmt == "csv":
        return spark.read.schema(schema).option("header", True).csv(path)
    raise ValueError(f"unsupported format: {fmt}")


def pulsar_reader_options(
    service_url: str,
    topics_pattern: str,
    start: str = "earliest",
    oauth2=None,
    receiver_queue_size: int | None = None,
) -> dict[str, str]:
    """Option map for the pulsar-spark connector mirroring the reference's
    consumer config (regex subscription, Earliest start —
    ``src/config.ts:236-239``, ``:257-262``). Usage:

        (spark.readStream.format("pulsar")
              .options(**pulsar_reader_options(url, pattern)).load())

    ``oauth2`` (a ``config.OAuth2Config``) maps the reference's
    client-credentials auth (``src/pulsar.ts:4-16``) onto the connector's
    documented ``pulsar.client.auth*`` options — the official Pulsar OAuth2
    plugin class plus its JSON params blob. ``receiver_queue_size`` is the
    reference's client-side admission bound
    (``PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE``, default 10,
    ``src/config.ts:233-235``), passed through as the connector's
    documented consumer conf."""
    opts = {
        "service.url": service_url,
        "topicsPattern": topics_pattern,
        "startingOffsets": start,
    }
    if receiver_queue_size is not None:
        opts["pulsar.consumer.receiverQueueSize"] = str(int(receiver_queue_size))
    if oauth2 is not None:
        import json

        opts["pulsar.client.authPluginClassName"] = (
            "org.apache.pulsar.client.impl.auth.oauth2.AuthenticationOAuth2"
        )
        opts["pulsar.client.authParams"] = json.dumps(
            {
                "type": "client_credentials",
                "issuerUrl": oauth2.issuer_url,
                "privateKey": oauth2.key_path,
                "audience": oauth2.audience,
            },
            sort_keys=True,
        )
    return opts


def pulsar_writer_options(
    service_url: str,
    topic: str,
    compression: str = "ZSTD",
) -> dict[str, str]:
    """Producer-side option map (reference op #3: output topic + ZSTD
    compression, ``src/config.ts:198-214``). The reference compresses at
    the broker protocol level; the connector exposes the same knob via
    producer conf."""
    return {
        "service.url": service_url,
        "topic": topic,
        "pulsar.producer.compressionType": compression,
    }


def kafka_reader_options(
    bootstrap_servers: str,
    subscribe_pattern: str,
    start: str = "earliest",
) -> dict[str, str]:
    """The same subscription shape on the built-in Kafka source (the
    connector every Spark distribution ships): regex subscription via
    ``subscribePattern``, earliest start — the drop-in alternative when the
    broker is Kafka rather than Pulsar."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribePattern": subscribe_pattern,
        "startingOffsets": start,
    }


# ─── Connector envelope mappings ────────────────────────────────────────────
#
# The piece between "reader options" and the engine's operators: each
# connector emits its own raw envelope schema, and everything downstream
# (message_digest, dedup_stream, enrichment, windows) consumes the engine's
# message schema (FIXTURES.md §A.1). These mappings are plain column
# expressions, so they work identically on a readStream DataFrame and on a
# batch DataFrame — which is what makes them testable without a broker:
# construct the connector's documented schema locally, map, and run the
# real pipeline. Switching to a live broker is then exactly one line
# (.format("kafka"|"pulsar") + the option map above).

def from_kafka_envelope(raw: DataFrame) -> DataFrame:
    """Built-in Kafka source envelope -> message schema.

    Kafka's envelope (fixed by the connector): key/value binary, topic,
    partition, offset, timestamp, headers array<struct<key,value binary>>.
    The message id is the (topic, partition, offset) coordinate — Kafka's
    identity for a record; headers carry the string properties."""
    from pyspark.sql import functions as F

    entries = F.transform(
        F.coalesce("headers", F.array()),
        lambda h: F.struct(
            h["key"].alias("key"),
            F.decode(h["value"], "UTF-8").alias("value"),
        ),
    )
    # Kafka legally repeats header keys (tracing/retry interceptors);
    # map_from_entries throws DUPLICATED_MAP_KEY on them — keep the LAST
    # occurrence per key (Kafka convention), i.e. drop any entry that a
    # later entry shadows. O(n²) but header lists are tiny.
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + 2, F.size(entries)),
            lambda later: later["key"] == e["key"],
        ),
    )
    props = F.map_from_entries(deduped)
    return raw.select(
        F.concat_ws(
            "-", "topic", F.col("partition").cast("string"),
            F.col("offset").cast("string")
        ).alias("message_id"),
        F.col("topic"),
        F.col("value"),
        props.alias("properties"),
        F.col("timestamp").alias("event_ts"),
        F.col("timestamp").alias("publish_ts"),
    )


def from_pulsar_envelope(raw: DataFrame) -> DataFrame:
    """pulsar-spark connector envelope -> message schema.

    The connector surfaces the reference's own accessors as metadata
    columns (``src/deduplication.ts:108-129`` reads the same fields via the
    client API): __messageId bytes, __topic, __eventTime, __publishTime,
    __properties map. Event time falls back to publish time when the
    producer set none — the reference's ``getEventTimestamp() || 
    getPublishTimestamp()`` fallback."""
    from pyspark.sql import functions as F

    return raw.select(
        F.hex(F.col("__messageId")).alias("message_id"),
        F.col("__topic").alias("topic"),
        F.col("value"),
        F.coalesce("__properties", F.create_map()).alias("properties"),
        F.coalesce(
            F.when(F.col("__eventTime") > F.lit(0).cast("timestamp"),
                   F.col("__eventTime")),
            F.col("__publishTime"),
        ).alias("event_ts"),
        F.col("__publishTime").alias("publish_ts"),
    )


def to_pulsar_envelope(messages: DataFrame) -> DataFrame:
    """Message schema -> the envelope the pulsar-spark SINK expects: the
    connector writes ``value`` plus the ``__topic`` / ``__key`` /
    ``__eventTime`` / ``__properties`` metadata columns; the broker assigns
    ``__messageId`` and ``__publishTime`` on publish (which is why they are
    absent here — the reference likewise sends only
    ``{data, properties, eventTimestamp}``, ``src/deduplication.ts:122-129``)."""
    from pyspark.sql import functions as F

    return messages.select(
        F.col("value"),
        F.col("topic").alias("__topic"),
        F.encode("message_id", "UTF-8").alias("__key"),
        F.col("event_ts").alias("__eventTime"),
        F.coalesce("properties", F.create_map()).alias("__properties"),
    )


def to_kafka_envelope(messages: DataFrame) -> DataFrame:
    """Message schema -> the envelope the built-in Kafka SINK expects
    (key/value binary + topic + headers); properties ride as headers so a
    Kafka round-trip preserves them (the reference forwards properties
    verbatim, ``src/deduplication.ts:122-129``)."""
    from pyspark.sql import functions as F

    headers = F.transform(
        F.map_entries(F.coalesce("properties", F.create_map())),
        lambda e: F.struct(
            e["key"].alias("key"),
            F.encode(e["value"], "UTF-8").alias("value"),
        ),
    )
    return messages.select(
        F.encode("message_id", "UTF-8").alias("key"),
        F.col("value"),
        F.col("topic"),
        headers.alias("headers"),
    )
