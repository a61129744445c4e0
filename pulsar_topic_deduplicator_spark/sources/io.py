"""Table loaders for the driver-generated parquet test data (TESTDATA.md).

The reference consumes a Pulsar topic (``src/pulsar.ts:27-34``); the engine's
batch surface reads parquet. ``messages_view`` reshapes the ``events`` table
into the reference's message schema (FIXTURES.md §A.1) so dedup operators run
against the same shape the reference processes:
``value: binary, properties: map<string,string>, event_ts: timestamp``.

Scale note: a parquet scan here is a distributed columnar read; Catalyst
pushes filters/projections into it (tests assert ``PushedFilters`` /
``ReadSchema``), which is what makes the same code viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalize the events nanosecond timestamp.

    events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4
    cannot map to TimestampType directly; we read it as a long via
    ``spark.sql.legacy.parquet.nanosAsLong`` and truncate ns -> µs exactly the
    way DuckDB does (integer floor division), so oracle comparisons agree to
    the microsecond.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def messages_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events reshaped to the reference's message schema (FIXTURES.md §A.1).

    | message field (reference)          | here                              |
    |------------------------------------|-----------------------------------|
    | ``getData()`` payload bytes        | ``value`` = utf8(json of row)     |
    | ``getProperties()``                | ``properties`` map<string,string> |
    | ``getEventTimestamp()``            | ``event_ts``                      |
    | ``getMessageId()``                 | ``message_id``                    |
    | ``getTopicName()``                 | ``topic``                         |

    (reference reads: ``src/deduplication.ts:108-129``)
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("message_id"),
        F.concat(F.lit("persistent://events/"), F.col("event_type")).alias("topic"),
        # payload carries the business content ONLY; transport/metadata
        # properties travel in the separate properties map (the reference's
        # payload-vs-properties split, src/deduplication.ts:122-129) — a
        # replica-added property must not change the payload bytes
        F.encode(F.to_json(F.struct("event_type", "value")), "UTF-8").alias(
            "value"
        ),
        F.from_json("props", "map<string,string>").alias("properties"),
        F.col("ts").alias("event_ts"),
        F.col("ts").alias("publish_ts"),
    )
