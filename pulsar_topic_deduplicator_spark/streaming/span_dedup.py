"""Streaming span-level exact dedup — C4 paragraph dedup as a stream.

The batch tier (``operators/textops.dedup_paragraphs``) reassembles each
document from its surviving spans, which requires every span of a doc in
hand; a stream cannot hold documents open across micro-batches, so the
streaming rendering emits the surviving SPANS themselves — the
training-ingest shape where downstream consumes deduplicated spans/chunks
directly rather than stitched documents. The first occurrence of each
distinct span content is forwarded exactly once; later arrivals (same doc
or any other, same batch or any later one inside the TTL) are suppressed
by JVM keyed state on the span hash with the ingest-clock TTL — the
watermark kernel pattern (``streaming/dedup.dedup_stream_ingest_ttl``),
no per-group Python anywhere.

Shares the batch tier's span geometry verbatim
(``operators/textops.span_frame`` — pure column expressions, so
batch/stream parity is by construction), which is also why the bounded
harness run has an exact SQL oracle: a single-batch availableNow run
forwards exactly one row per distinct span hash, and since identical
hashes carry identical span text, the (ph, para) projection is fully
deterministic (which DOC a surviving span came from is first-seen
engine-arbitrary and stays outside the boundary — the stream_dedup
convention).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import PARA_SPANS_SQL, span_frame
from .neardup_stream import DOCS_RAW_SCHEMA

DEFAULT_SPAN_TTL_MS = 3_600_000


def dedup_spans_stream(
    docs_stream: DataFrame, ttl_ms: int = DEFAULT_SPAN_TTL_MS
) -> DataFrame:
    """Span explode → sha2 span hash → ingest-clock watermark →
    first-occurrence filter keyed on the hash. State is one entry per
    distinct span content inside the TTL, hash-partitioned (crypto-uniform,
    no skew) — the 100 TB steady-state footprint is bounded by content
    novelty, not stream volume."""
    return (
        span_frame(docs_stream)
        .withColumn("ph", F.sha2(F.col("para"), 256))
        .withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", f"{int(ttl_ms)} milliseconds")
        .dropDuplicatesWithinWatermark(["ph"])
        .observe("span_dedup", F.count(F.lit(1)).alias("n_forwarded"))
    )


def run_stream_span_dedup_bounded(
    spark: SparkSession,
    source_dir: str,
    glob_filter: str = "documents.parquet",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded availableNow run; returns the deterministic (ph, para)
    projection of the surviving spans.

    Sink selection follows ``run_stream_dedup_bounded``: a caller passing
    ``checkpoint_dir`` (restart tests, resumable backfills) gets the
    parquet file sink — the memory sink cannot recover from a checkpoint;
    a one-shot run uses the memory sink (identical pipeline and state
    semantics, none of the file-commit cost)."""
    from ..session import apply_runtime_confs

    apply_runtime_confs(spark)
    stream = (
        spark.readStream.schema(DOCS_RAW_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .parquet(source_dir)
    )
    out = dedup_spans_stream(stream).select("ph", "para")
    if checkpoint_dir is None:
        from .source import bounded_shuffle_width

        name = f"span_dedup_{uuid.uuid4().hex[:8]}"
        with bounded_shuffle_width(spark):
            # span-hash state shuffles at session width with no AQE —
            # clamp a default 200-partition session to the cluster's
            # cores (VERDICT r12 item 4); the checkpointed path below
            # keeps its baked-in width
            query = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
        return spark.table(name)
    output_dir = f"{checkpoint_dir}_out"
    query = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(output_dir)


ORACLES: dict[str, str] = {
    "stream_dedup_spans": f"""
        WITH {PARA_SPANS_SQL}
        SELECT DISTINCT sha256(para) AS ph, para FROM para_spans
    """,
}
