"""Streaming range join — live events attributed to static time windows.

The streaming rendering of ``operators/asof.py::interval_join``: the
window table (purchases + their 30-minute attribution windows, derived
from the batch bootstrap scan the way op #11 derives the warm-up set) is
the STATIC side, exploded once to its covered time buckets and broadcast
into every micro-batch; each live event hashes to exactly one bucket, so
the range predicate rides a stream-static broadcast equi-join — the
stream never shuffles, no state store is needed (inner join, append
mode), and the plan is watermark-free and exactly deterministic, which is
why this harness has an EXACT SQL oracle (same text as the batch twin:
a bounded single-batch run sees every event exactly once).

At scale the static side is purchase-window-sized × ≤2 bucket rows; when
it outgrows a broadcast the same composition runs as a shuffled
stream-static join without code changes (drop the ``F.broadcast`` hint).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import ATTRIB_WINDOW_US, interval_join
from ..sources.io import load_table
from .source import events_raw_stream


def purchase_windows(spark: SparkSession, source_dir: str) -> DataFrame:
    """The static window table: one [ts, ts + 30 min) window per purchase."""
    ev = load_table(spark, source_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("window_id"),
        F.col("user_id").alias("w_user_id"),
        F.col("ts").alias("w_start"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.lit(ATTRIB_WINDOW_US)
        ).alias("w_end"),
    )


def attribute_stream(points: DataFrame, windows: DataFrame) -> DataFrame:
    """Stream-static bucketized interval join: one output row per
    (live event, containing window) pair for the same user."""
    joined = interval_join(
        points.select("event_id", "user_id", "ts", "event_type"),
        F.broadcast(windows),
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        keys=(("user_id", "w_user_id"),),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "window_id",
        "w_start",
    )


def run_stream_attribution_bounded(
    spark: SparkSession, source_dir: str, glob_filter: str | None = None
) -> DataFrame:
    """Bounded harness: static windows from the batch scan, live events
    from the file stream, availableNow single-batch run."""
    windows = purchase_windows(spark, source_dir)
    points = events_raw_stream(spark, source_dir, glob_filter=glob_filter)
    name = f"attrib_{uuid.uuid4().hex[:8]}"
    query = (
        attribute_stream(points, windows)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


#: exact oracle — the same SQL as the batch twin (`asof.ORACLES`): the
#: bounded single-batch inner join is append-only and stateless, so the
#: stream emits exactly the batch result.
ORACLES: dict[str, str] = {
    "stream_attribution_events": """
        WITH win AS (
          SELECT event_id AS window_id, user_id, ts AS w_start,
                 ts + INTERVAL 30 MINUTE AS w_end
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               w.window_id, w.w_start
        FROM events e JOIN win w
          ON e.user_id = w.user_id
         AND e.ts >= w.w_start AND e.ts < w.w_end
    """,
}
