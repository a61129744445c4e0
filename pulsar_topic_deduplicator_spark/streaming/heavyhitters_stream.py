"""Streaming Misra-Gries heavy hitters — the frequent-items telemetry a
dedup service publishes NEXT TO its forwarded/dropped counters (reference
op #13's loop, ``src/deduplication.ts:80-95``, generalized from three
scalars to "top talkers"), maintained incrementally over micro-batches.

Design (the mergeable-summaries two-level pattern, Agarwal et al. SIGMOD
2012, extended one level to time): each micro-batch runs the BATCH
Misra-Gries kernel (per-partition ``mapInPandas`` folds → KB-sized SQL
merge, ``operators/heavyhitters.py``), and the resulting ≤ MG_K-row batch
summary lands in a driver-held slot KEYED BY batch_id (foreachBatch
retries overwrite their own slot — idempotent); after the drain the slots
fold in batch order with the same add-trim-keep-positive merge. MG state
is O(k) per slot BY CONSTRUCTION — a dozen
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
    batch_summaries: dict[int, list[tuple[str, int]]] = {}

    q = (
        ev.writeStream.foreachBatch(_make_fold(batch_summaries, col))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    counters = _merge_summaries(batch_summaries)
    return spark.createDataFrame(
        sorted(counters.items()), "item string, est_count long"
    )


def _make_fold(batch_summaries: dict[int, list[tuple[str, int]]], col: str):
    """The foreachBatch kernel, factored out so the retry path is testable.

    Retry-idempotence (the streaming/media.py round-12 discipline): the
    per-batch distributed MG summary is stored KEYED BY batch_id — a
    foreachBatch retry (checkpoint commit lost after a successful first
    attempt) overwrites its own slot instead of double-folding into a
    running accumulator, which would inflate the retried batch's mass."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # distributed per-batch kernel (partition folds + KB merge)
        batch_summaries[int(batch_id)] = [
            (r["item"], int(r["est_count"]))
            for r in _mg_merged(batch_df.select(col), col).collect()
        ]

    return fold


def _merge_summaries(
    batch_summaries: dict[int, list[tuple[str, int]]],
) -> dict[str, int]:
    """Fold the ≤ MG_K-row per-batch summaries in batch order with the
    add-trim-keep-positive merge — IDENTICAL order and arithmetic to the
    previous online fold (so every pinned result is unchanged), run after
    the drain. Driver memory O(k · batches), a few KB for bounded runs."""
    counters: dict[str, int] = {}
    for b in sorted(batch_summaries):
        for item, c in batch_summaries[b]:
            counters[item] = counters.get(item, 0) + c
        if len(counters) > MG_K:
            off = sorted(counters.values(), reverse=True)[MG_K]
            for k in list(counters):
                v = counters[k] - off
                if v > 0:
                    counters[k] = v
                else:
                    del counters[k]
    return counters


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
