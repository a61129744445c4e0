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


def test_checkpoint_restart_keeps_span_state(spark, tmp_path):
    """Span-hash state must survive a checkpointed restart: a span whose
    content was forwarded in run 1 is suppressed when it re-arrives (in a
    different document) after the restart — the reference's warm-up
    guarantee, carried by the checkpoint instead of a re-scan."""
    import glob as globmod
    import shutil

    src = tmp_path / "span_restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "span_ckpt")
    text = "one two three four five six seven eight nine ten"
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def _write_flat(rows, name):
        # the file source lists FLAT files (the testdata layout): stage the
        # spark write, then copy its part file to a flat name
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (part,) = globmod.glob(f"{stage}/part-*.parquet")
        shutil.copy(part, str(src / name))

    _write_flat([(1, text, "en", "s", len(text))], "run1.parquet")
    first = run_stream_span_dedup_bounded(
        spark, str(src), glob_filter="*.parquet", checkpoint_dir=ckpt
    )
    assert first.count() == 1

    # "restart": the same span content re-arrives in a NEW doc, plus one
    # genuinely new span
    _write_flat(
        [(2, text, "en", "s", len(text)),
         (3, "brand new words nobody has ever streamed before today", "en",
          "s", 53)],
        "run2.parquet",
    )
    second = run_stream_span_dedup_bounded(
        spark, str(src), glob_filter="*.parquet", checkpoint_dir=ckpt
    )
    # cumulative sink: run 1's span + run 2's new span; the re-arrived
    # duplicate is dropped because state survived the restart
    assert second.count() == 2
    assert second.select("ph").distinct().count() == 2
