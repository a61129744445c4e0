"""Streaming Misra-Gries heavy hitters — the frequent-items telemetry a
dedup service publishes NEXT TO its forwarded/dropped counters (reference
op #13's loop, ``src/deduplication.ts:80-95``, generalized from three
scalars to "top talkers"), maintained incrementally over micro-batches.

Design (the mergeable-summaries two-level pattern, Agarwal et al. SIGMOD
2012, extended one level to time): each micro-batch runs the BATCH
Misra-Gries kernel (per-partition ``mapInPandas`` folds → KB-sized SQL
merge, ``operators/heavyhitters.py``), and the resulting ≤ MG_K-row batch
summary folds into a driver-held accumulated summary with the same
add-trim-keep-positive merge. MG state is O(k) BY CONSTRUCTION — a dozen
counters — so driver-held state is the right home (the same codebook
discipline as the IVF/MMR tiers), and the guarantees survive: each trim
at any level removes ≥ (k+1)·offset total mass, so Σ offsets ≤ n/(k+1)
across partitions, batches, and the cross-batch fold combined.

Determinism contract (the KMV/MG exact-when-unsaturated discipline): on a
vocabulary ≤ MG_K (the driver entry sketches ``event_type``) NO trim ever
fires at any level, so the accumulated summary equals the exact counts
under ANY partition layout and ANY batch split — oracle-EXACT. Saturating
streams (user_id) are guarantee-checked in tests/test_heavyhitters.py's
streaming twin instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.heavyhitters import MG_K, _mg_merged
from .source import events_raw_stream


def run_stream_heavy_hitters_bounded(
    spark: SparkSession,
    sf_dir: str,
    col: str = "event_type",
    glob_filter: str | None = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Bounded (availableNow) streaming MG run over the events stream;
    returns the accumulated ``(item, est_count)`` summary after the drain.

    ``max_files_per_trigger`` composes with the admission-control tier:
    the summary is batch-split INVARIANT when unsaturated (exact counts),
    and guarantee-preserving when saturated (pytest-pinned)."""
    ev = events_raw_stream(
        spark,
        sf_dir,
        glob_filter=glob_filter,
        max_files_per_trigger=max_files_per_trigger,
    )
    counters: dict[str, int] = {}

    def fold(batch_df: DataFrame, _batch_id: int) -> None:
        # distributed per-batch kernel (partition folds + KB merge), then
        # the ≤ MG_K-row cross-batch fold on the driver
        for r in _mg_merged(batch_df.select(col), col).collect():
            counters[r["item"]] = counters.get(r["item"], 0) + int(
                r["est_count"]
            )
        if len(counters) > MG_K:
            off = sorted(counters.values(), reverse=True)[MG_K]
            for k in list(counters):
                v = counters[k] - off
                if v > 0:
                    counters[k] = v
                else:
                    del counters[k]

    q = (
        ev.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        sorted(counters.items()), "item string, est_count long"
    )


def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: streaming MG over ``event_type`` — unsaturated
    (5-value vocabulary ≪ MG_K), so the accumulated summary is EXACTLY
    the per-type counts regardless of batching; exact SQL oracle."""
    return run_stream_heavy_hitters_bounded(spark, sf_dir)


#: exact oracle for the unsaturated driver entry: no trim fires anywhere,
#: so the accumulated summary is the exact per-type counts.
ORACLES: dict[str, str] = {
    "stream_heavy_hitters": """
        SELECT event_type AS item, CAST(count(*) AS BIGINT) AS est_count
        FROM events GROUP BY event_type
    """,
}
