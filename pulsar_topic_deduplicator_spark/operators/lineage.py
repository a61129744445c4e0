"""Provenance (origin) enrichment and warm-up digest extraction.

Reference op #8: every forwarded message gets an ``origin`` property — a JSON
array of digests, single-element on write (``src/deduplication.ts:122-129``)
but any-length on read (forward-compatible lineage merging,
``src/cacheBuilding.ts:29-48``).

Reference op #11/#12: on startup, the service re-reads its *output* topic for
the last ``CACHE_WINDOW_IN_SECONDS`` (48 h default, ``src/config.ts:100-102``)
and re-seeds the dedup state with every digest found in ``origin``
(``src/cacheBuilding.ts:65-212``), skipping malformed values with a warning
(three failure branches, ``src/cacheBuilding.ts:15-59``). In Spark the
steady-state equivalent is checkpointed streaming state; the batch operators
here are the bootstrap path for a *fresh* state (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from ._oracle_fragments import WARMUP_CUTOFF, duck_events_digest
from .dedup import with_digest

__all__ = [
    "WARMUP_CUTOFF",  # re-exported; canonical home is _oracle_fragments
    "origin_lineage",
    "extract_origin_digests",
    "warmup_digest_extract",
]


def origin_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #8: attach ``origin`` = JSON array of the row's digest
    (``src/deduplication.ts:126``)."""
    return with_digest(load_table(spark, sf_dir, "events")).select(
        "event_id",
        "digest",
        F.to_json(F.array(F.col("digest"))).alias("origin"),
    )


def extract_origin_digests(df: DataFrame, origin_col: str = "origin") -> DataFrame:
    """Op #12: parse-and-validate ``origin`` into one digest per row.

    Mirrors ``getDigests`` (``src/cacheBuilding.ts:6-63``): validation is
    MESSAGE-granular — not-JSON, not-an-array, or ANY element that is not a
    non-empty string rejects the whole message (the reference returns
    ``undefined`` for the entire array, so ``'["a",""]'`` seeds nothing, not
    ``'a'``). The reference warns and skips; we filter — the count of dropped
    messages is observable via the input/output row delta.
    """
    # from_json(…, array<string>) would COERCE numbers/objects to their JSON
    # text ('["a",42]' -> ['a','42']) — the reference's typeof check rejects
    # them. Inspect element types through the variant parser instead: valid
    # iff the value parses, is an array, and every element is a non-empty
    # JSON *string*. The variant array is bound ONCE as a column, so each
    # row pays a single parse for validation AND extraction.
    parsed = df.select(
        F.expr(f"try_cast(try_parse_json({origin_col}) as array<variant>)").alias(
            "_va"
        )
    )
    strictly_strings = F.col("_va").isNotNull() & F.expr(
        "forall(_va, e -> schema_of_variant(e) = 'STRING' "
        "AND cast(e AS string) != '')"
    )
    return parsed.filter(strictly_strings).select(
        F.explode(
            F.expr("transform(_va, e -> cast(e AS string))")
        ).alias("digest")
    )


def warmup_digest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #11 batch analog: time-bounded scan of the (simulated) output
    stream -> distinct digests to seed the dedup state
    (``src/cacheBuilding.ts:141-200``).

    The time filter is applied BEFORE digest extraction so Catalyst pushes it
    into the parquet scan — at 100 TB the warm-up reads only the window's
    row groups, exactly like the reference's broker-side ``seekTimestamp``
    (``src/cacheBuilding.ts:98-132``).
    """
    out = with_digest(load_table(spark, sf_dir, "events")).filter(
        F.col("ts") < F.lit(WARMUP_CUTOFF).cast("timestamp")
    )
    with_origin = out.select(
        "ts", F.to_json(F.array(F.col("digest"))).alias("origin")
    )
    return extract_origin_digests(with_origin).distinct()


_DIGEST = duck_events_digest()

ORACLES: dict[str, str] = {
    "origin_lineage": f"""
        SELECT event_id, {_DIGEST} AS digest,
               '["' || {_DIGEST} || '"]' AS origin
        FROM events
    """,
    "warmup_digest_extract": f"""
        SELECT DISTINCT {_DIGEST} AS digest
        FROM events
        WHERE ts < TIMESTAMP '{WARMUP_CUTOFF}'
    """,
}
