"""Duplicate-injection generator — FIXTURES.md §A.4 recipe.

Builds a duplicate-laden copy of the events table for dedup testing: a
deterministic ~10% sample of rows is re-emitted with a shifted event
timestamp (same content ⇒ same digest ⇒ must be dropped inside the window)
and optionally an extra IGNORED property (must still be dropped — ignore
lists exist exactly for replica-added transport noise,
``src/deduplication.test.ts:197-201``).

Determinism: sampling and shifts key off ``xxhash64(event_id)`` — no rand()
— so every run and both sides of any comparison see identical data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

INJECT_RATE = 10  # 1-in-10 rows duplicated
MAX_SHIFT_SECONDS = 300


def events_with_duplicates(
    spark: SparkSession,
    sf_dir: str,
    add_ignored_prop: bool = True,
) -> DataFrame:
    """events ∪ injected duplicates, in the raw events schema (ts kept in
    whatever physical type the source file uses — ns-long legacy or the
    current timestamp[us]/NTZ — so the output can be written back as a
    stream-source file in the same raw schema).

    Duplicate rows keep event_type/value/props (the content identity) but
    get a fresh event_id (negative, to stay collision-free), a time shift
    of 0–300 s, and — when ``add_ignored_prop`` — a ``dupMarker`` property
    that a correctly-configured ignore list must exclude from the digest."""
    apply_runtime_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = F.xxhash64("event_id")
    # shift in the column's own type: long ns for the legacy ns-long
    # encoding, SECOND timestampadd for timestamp/NTZ (works for both)
    shift_s = F.pmod(F.xxhash64("event_id"), F.lit(MAX_SHIFT_SECONDS)) + 1
    if dict(ev.dtypes).get("ts") == "bigint":
        shifted = F.col("ts") + shift_s * F.lit(1_000_000_000).cast("long")
    else:
        shifted = F.timestamp_add("SECOND", shift_s.cast("int"), F.col("ts"))
    dups = (
        ev.filter(F.pmod(h, INJECT_RATE) == 0)
        .withColumn("event_id", -F.col("event_id") - 1)
        .withColumn("ts", shifted)
    )
    if add_ignored_prop:
        dups = dups.withColumn(
            "props",
            F.regexp_replace("props", r"\}$", ', "dupMarker": "1"}'),
        )
    return ev.unionByName(dups)
