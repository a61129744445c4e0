"""As-of join — point-in-time lookup, composed from Spark primitives.

NOT in the reference (no joins of any kind — SURVEY.md §2.3); this is the
classic time-series operator Spark lacks natively, implemented as the
union + carry-forward-window composition (brief: "composition of existing
DataFrame ops" before reaching for Pandas UDFs):

    1. tag right-side rows 0 and left-side rows 1,
    2. union on (key, ts, side),
    3. one window per key ordered by (ts, side):
       ``last(right_payload, ignorenulls=True)`` carries the most recent
       right row forward — at equal timestamps the right row sorts first,
       giving the standard ASOF ``left.ts >= right.ts`` inclusive semantics,
    4. keep the left rows.

Cost: ONE shuffle on the join key + a per-key sort — the same price as a
sort-merge join, with no range-explosion. Skewed keys behave like any
window (AQE/salting apply). Verified against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Generic inclusive as-of join: for each left row, the right row with
    the greatest ``right_ts`` ≤ ``left_ts`` within the same ``key``.

    ``payload_cols`` are the right-side columns carried onto the left rows
    (null when no right row precedes). Right side must be unique per
    (key, right_ts) — pre-aggregate if not."""
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_payload"),
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))
    )
    # right rows carry null for left-only columns; they are dropped after
    # the carry-forward window anyway
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_match.{p}").alias(p) for p in payload_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the user's most recent purchase at-or-before its
    timestamp (inclusive — a purchase event matches itself)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max(
                F.struct(
                    F.col("event_id").alias("p_event_id"),
                    F.col("value").alias("p_value"),
                )
            ).alias("p")
        )
        .select(
            "user_id",
            F.col("ts").alias("p_ts_src"),
            F.col("p.p_event_id").alias("p_event_id"),
            F.col("ts").alias("p_ts"),
            F.col("p.p_value").alias("p_value"),
        )
    )
    return asof_join(
        ev.select("event_id", "ts", "user_id", "event_type"),
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts_src",
        payload_cols=["p_event_id", "p_ts", "p_value"],
    )


ORACLES: dict[str, str] = {
    "asof_last_purchase": """
        WITH purch AS (
          SELECT user_id, ts AS p_ts,
                 max(event_id) AS p_event_id,
                 arg_max(value, event_id) AS p_value
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, ts)
        SELECT e.event_id, e.ts, e.user_id, e.event_type,
               p.p_event_id, p.p_ts, p.p_value
        FROM events e
        ASOF LEFT JOIN purch p
          ON e.user_id = p.user_id AND e.ts >= p.p_ts
    """,
}
