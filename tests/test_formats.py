"""Round-trip the driver tables through each batch format with explicit
schemas — source/sink coverage beyond parquet."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.sources.formats import read_table, write_table
from pulsar_topic_deduplicator_spark.sources.io import load_table


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_documents(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / f"docs_{fmt}")
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, src.schema, fmt=fmt)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_roundtrip_events_with_timestamps(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_rt")
    write_table(src, path, fmt="parquet")
    back = read_table(spark, path, src.schema, fmt="parquet")
    assert back.count() == src.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_pulsar_options_shape():
    from pulsar_topic_deduplicator_spark.sources.formats import (
        pulsar_reader_options,
    )

    opts = pulsar_reader_options(
        "pulsar://broker:6650", "persistent://tenant/ns/topic-.*"
    )
    assert opts["topicsPattern"].endswith("topic-.*")
    assert opts["startingOffsets"] == "earliest"


# ─── connector envelope mappings (no broker needed: the mappings are plain
#     column expressions over the connectors' documented schemas) ───────────


def _kafka_raw(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("timestampType", T.IntegerType()),
            T.StructField(
                "headers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", T.BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )
    import datetime

    rows = [
        (
            b"k1",
            b'{"event_type":"click","value":1.0}',
            "persistent://events/click",
            0,
            42,
            datetime.datetime(2024, 1, 1, 0, 0, 0),
            0,
            [("k", b"1"), ("mqttQos", b"0")],
        ),
        (
            b"k2",
            b'{"event_type":"view","value":2.0}',
            "persistent://events/view",
            1,
            7,
            datetime.datetime(2024, 1, 1, 1, 0, 0),
            0,
            None,  # headers may be absent entirely
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_kafka_envelope_maps_to_message_schema(spark):
    from pulsar_topic_deduplicator_spark.sources.formats import from_kafka_envelope
    from pulsar_topic_deduplicator_spark.streaming.dedup import message_digest

    msgs = from_kafka_envelope(_kafka_raw(spark))
    assert [f.name for f in msgs.schema.fields] == [
        "message_id", "topic", "value", "properties", "event_ts", "publish_ts",
    ]
    rows = {r["message_id"]: r for r in msgs.collect()}
    assert set(rows) == {"persistent://events/click-0-42",
                         "persistent://events/view-1-7"}
    assert rows["persistent://events/click-0-42"]["properties"] == {
        "k": "1", "mqttQos": "0",
    }
    assert rows["persistent://events/view-1-7"]["properties"] == {}
    # the mapped stream is digestible by the real dedup pipeline, and the
    # reference ignore-list strips transport noise from the hash input
    digs = msgs.withColumn("d", message_digest(("mqttQos",))).collect()
    assert all(len(r["d"]) == 64 for r in digs)


def test_kafka_envelope_round_trip_preserves_content(spark):
    from pulsar_topic_deduplicator_spark.sources.formats import (
        from_kafka_envelope,
        to_kafka_envelope,
    )

    msgs = from_kafka_envelope(_kafka_raw(spark))
    sink = to_kafka_envelope(msgs)
    assert [f.name for f in sink.schema.fields] == [
        "key", "value", "topic", "headers",
    ]
    back = {
        r["topic"]: (bytes(r["value"]), sorted((h["key"], bytes(h["value"]))
                                               for h in r["headers"]))
        for r in sink.collect()
    }
    orig = {
        r["topic"]: (bytes(r["value"]),
                     sorted((k, v.encode()) for k, v in r["properties"].items()))
        for r in msgs.collect()
    }
    assert back == orig  # payload bytes + properties survive the round trip


def test_pulsar_envelope_maps_and_falls_back_to_publish_time(spark):
    import datetime

    from pyspark.sql import types as T

    from pulsar_topic_deduplicator_spark.sources.formats import from_pulsar_envelope

    schema = T.StructType(
        [
            T.StructField("__messageId", T.BinaryType()),
            T.StructField("__topic", T.StringType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("__properties", T.MapType(T.StringType(), T.StringType())),
            T.StructField("__eventTime", T.TimestampType()),
            T.StructField("__publishTime", T.TimestampType()),
        ]
    )
    pub = datetime.datetime(2024, 1, 2, 0, 0, 0)
    evt = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (b"\x01\x02", "persistent://events/click", b"p1", {"k": "1"}, evt, pub),
        # producer set no event time (connector surfaces epoch 0) -> fallback
        (b"\x03\x04", "persistent://events/view", b"p2", None,
         datetime.datetime(1970, 1, 1, 0, 0, 0), pub),
    ]
    msgs = from_pulsar_envelope(spark.createDataFrame(rows, schema))
    got = {r["message_id"]: r for r in msgs.collect()}
    assert set(got) == {"0102", "0304"}
    assert got["0102"]["event_ts"] == evt
    assert got["0304"]["event_ts"] == pub  # the reference's || fallback
    assert got["0304"]["properties"] == {}


def test_kafka_envelope_duplicate_header_keys_keep_last(spark):
    """Kafka legally repeats header keys (tracing/retry interceptors); the
    mapping must keep the LAST occurrence instead of throwing
    DUPLICATED_MAP_KEY and killing the stream."""
    import datetime

    from pyspark.sql import types as T

    from pulsar_topic_deduplicator_spark.sources.formats import from_kafka_envelope

    schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("timestampType", T.IntegerType()),
            T.StructField(
                "headers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", T.BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (
            b"k",
            b"p",
            "t",
            0,
            1,
            datetime.datetime(2024, 1, 1),
            0,
            [("trace", b"first"), ("other", b"x"), ("trace", b"last")],
        )
    ]
    msgs = from_kafka_envelope(spark.createDataFrame(rows, schema))
    props = msgs.collect()[0]["properties"]
    assert props == {"trace": "last", "other": "x"}


def test_envelope_digest_stable_end_to_end(spark, sf_dir):
    """The last pre-broker confidence step for ops #1/#3 (VERDICT r4 item 6):
    push the whole sf corpus message view through the SINK envelope, simulate
    the broker's redelivery columns, map back through the SOURCE envelope,
    and require every message's content digest to be IDENTICAL — i.e. a
    message surviving a Kafka (and Pulsar) hop deduplicates exactly like the
    original, which is the reference's whole contract.
    """
    from pyspark.sql import functions as F

    from pulsar_topic_deduplicator_spark.sources.formats import (
        from_kafka_envelope,
        from_pulsar_envelope,
        to_kafka_envelope,
        to_pulsar_envelope,
    )
    from pulsar_topic_deduplicator_spark.sources.io import messages_view
    from pulsar_topic_deduplicator_spark.streaming.dedup import message_digest

    msgs = messages_view(spark, sf_dir)
    orig = {
        r["message_id"]: r["d"]
        for r in msgs.withColumn("d", message_digest()).collect()
    }
    assert len(orig) > 0

    # Kafka hop: sink envelope + what the broker/consumer adds on redelivery
    # (partition/offset/timestamp); message identity changes — Kafka's id is
    # the coordinate — so rejoin on the key we sent
    kafka_raw = (
        to_kafka_envelope(msgs)
        .withColumn("partition", F.lit(0))
        .withColumn("offset", F.monotonically_increasing_id())
        .withColumn("timestamp", F.current_timestamp())
    )
    back = from_kafka_envelope(kafka_raw).withColumn("d", message_digest())
    k_digests = {
        r["orig_id"]: r["d"]
        for r in back.join(
            kafka_raw.select(
                F.decode("key", "UTF-8").alias("orig_id"),
                F.concat_ws(
                    "-", "topic", F.col("partition").cast("string"),
                    F.col("offset").cast("string")
                ).alias("message_id"),
            ),
            "message_id",
        ).collect()
    }
    assert k_digests == orig

    # Pulsar hop: sink envelope + broker-assigned __messageId/__publishTime
    pulsar_raw = (
        to_pulsar_envelope(msgs)
        .withColumn("__messageId", F.col("__key"))
        .withColumn("__publishTime", F.current_timestamp())
    )
    back_p = from_pulsar_envelope(pulsar_raw).withColumn("d", message_digest())
    p_digests = {
        r["orig_id"]: r["d"]
        for r in back_p.join(
            pulsar_raw.select(
                F.decode("__key", "UTF-8").alias("orig_id"),
                F.hex("__messageId").alias("message_id"),
            ),
            "message_id",
        ).collect()
    }
    assert p_digests == orig
