"""Streaming span dedup (``streaming/span_dedup.py``): batch/stream parity
by construction (shared ``span_frame`` geometry) and first-wins keyed-state
semantics across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators.textops import para_spans
from pulsar_topic_deduplicator_spark.streaming.span_dedup import (
    run_stream_span_dedup_bounded,
)


def test_stream_equals_batch_distinct_spans(spark, sf_dir):
    """The bounded streaming run's (ph, para) set must equal the batch
    span frame's distinct span set — same geometry, same hash, first-wins
    collapses to DISTINCT on a single-batch run."""
    out = run_stream_span_dedup_bounded(spark, sf_dir)
    stream_set = {(r["ph"], r["para"]) for r in out.collect()}
    batch_set = {
        (r["ph"], r["para"])
        for r in para_spans(spark, sf_dir)
        .select(F.sha2(F.col("para"), 256).alias("ph"), "para")
        .distinct()
        .collect()
    }
    assert stream_set == batch_set
    # exactly one row per distinct hash — no duplicate survivors
    assert out.count() == len(stream_set)


def test_cross_batch_suppression_first_wins(spark, tmp_path):
    """A span arriving in a LATER micro-batch whose content was already
    forwarded must be suppressed — state persists across batches inside
    the TTL. Two files → two batches under maxFilesPerTrigger=1."""
    import uuid

    from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
        DOCS_RAW_SCHEMA,
    )
    from pulsar_topic_deduplicator_spark.streaming.span_dedup import (
        dedup_spans_stream,
    )

    src = tmp_path / "spans_src"
    src.mkdir()
    text = "alpha beta gamma delta epsilon zeta eta theta"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))], schema
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    spark.createDataFrame(
        [(2, text, "en", "s", len(text)),  # duplicate content, later batch
         (3, "omega psi chi phi upsilon tau sigma rho", "en", "s", 39)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b2.parquet"))

    name = f"span_xbatch_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(DOCS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    query = (
        dedup_spans_stream(stream)
        .select("doc_id", "ph", "para")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = spark.table(name).collect()
    by_ph: dict[str, list] = {}
    for r in rows:
        by_ph.setdefault(r["ph"], []).append(r)
    # the shared content survives exactly once; doc 3's span also once
    assert all(len(v) == 1 for v in by_ph.values()), by_ph
    assert len(by_ph) == 2
