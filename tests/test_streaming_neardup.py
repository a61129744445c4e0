"""Streaming MinHash/LSH near-dup filter: batch-parity + cross-batch state.

Parity anchor: with the WHOLE corpus in one micro-batch, the stream's greedy
first-wins rule keeps exactly the docs that never appear as the higher
doc_id of a batch LSH candidate pair (operators/neardup.near_dup_minhash) —
an independent derivation of the same semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators.neardup import near_dup_minhash
from pulsar_topic_deduplicator_spark.sources.io import load_table
from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
    near_dup_filter_batch,
    run_stream_near_dup_bounded,
)


def test_stream_single_batch_matches_batch_greedy(spark, sf_dir, tmp_path):
    kept = run_stream_near_dup_bounded(spark, sf_dir, str(tmp_path / "nd"))
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    all_ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    dropped = {
        r["doc_b"]
        for r in near_dup_minhash(spark, sf_dir).select("doc_b").collect()
    }
    assert kept_ids == all_ids - dropped
    assert kept_ids  # corpus is not degenerate
    assert dropped  # the sf0.001 corpus does contain near-dups


def test_stream_two_batches_persist_bucket_state(spark, sf_dir, tmp_path):
    """Splitting the corpus into two micro-batches must equal composing the
    per-batch filter sequentially (state = kept docs' buckets only)."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    # two flat files (the testdata layout) -> two micro-batches with
    # maxFilesPerTrigger=1; file order follows modification time, so write
    # batch 1 first
    pq.write_table(pa.Table.from_pandas(b1.toPandas()), str(src / "b1.parquet"))
    pq.write_table(pa.Table.from_pandas(b2.toPandas()), str(src / "b2.parquet"))

    kept_stream = run_stream_near_dup_bounded(
        spark,
        str(src),
        str(tmp_path / "nd2"),
        glob_filter="*.parquet",
        max_files_per_trigger=1,
    )
    got = {r["doc_id"] for r in kept_stream.select("doc_id").collect()}

    kept1, buckets1, _h1 = near_dup_filter_batch(b1, None)
    kept2, _, _h2 = near_dup_filter_batch(b2, buckets1)
    want = {
        r["doc_id"]
        for r in kept1.select("doc_id").unionByName(kept2.select("doc_id")).collect()
    }
    assert got == want

    # the split must actually exercise cross-batch suppression: some batch-2
    # doc collides with a batch-1 kept doc
    solo2, _, _h3 = near_dup_filter_batch(b2, None)
    assert {r["doc_id"] for r in solo2.select("doc_id").collect()} != {
        r["doc_id"] for r in kept2.select("doc_id").collect()
    }


def test_stream_restart_is_idempotent_and_incremental(spark, sf_dir, tmp_path):
    """Exactly-once claim of the foreachBatch sink, exercised: (a) a second
    bounded run over the SAME checkpoint with no new files must not re-run
    batches, duplicate kept docs, or double-count bucket state; (b) a file
    arriving after the first run is processed as an incremental batch
    against the persisted bucket index — the kept set equals the two-batch
    sequential composition."""
    from pyspark.sql import functions as F

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pulsar_topic_deduplicator_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.Table.from_pandas(b1.toPandas()), str(src / "b1.parquet"))

    work = str(tmp_path / "nd_restart")

    def run():
        # ONE pinned checkpoint across runs: restart semantics under test
        return run_stream_near_dup_bounded(
            spark,
            str(src),
            work,
            glob_filter="*.parquet",
            checkpoint_dir=f"{work}/ckpt_fixed",
        )

    first = {r["doc_id"] for r in run().select("doc_id").collect()}
    # (a) pure re-run: nothing new -> identical output, no duplicated rows
    rerun = run()
    assert {r["doc_id"] for r in rerun.select("doc_id").collect()} == first
    assert rerun.count() == rerun.select("doc_id").distinct().count()

    # (b) late file -> incremental batch against persisted state
    pq.write_table(pa.Table.from_pandas(b2.toPandas()), str(src / "b2.parquet"))
    final = {r["doc_id"] for r in run().select("doc_id").collect()}

    from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
        near_dup_filter_batch,
    )

    kept1, buckets1, _h1 = near_dup_filter_batch(b1, None)
    kept2, _, _h2 = near_dup_filter_batch(b2, buckets1)
    want = {
        r["doc_id"]
        for r in kept1.select("doc_id").unionByName(kept2.select("doc_id")).collect()
    }
    assert final == want


def test_stream_metrics_match_output(spark, sf_dir, tmp_path):
    """Telemetry parity (reference op #13): per-batch forwarded/dropped
    counters must reconcile exactly with the corpus size and the kept
    output — nRecentForwarded + nRecentDropped = messages seen."""
    from pulsar_topic_deduplicator_spark.sources.io import load_table
    from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
        read_near_dup_metrics,
    )

    work = str(tmp_path / "nd_metrics")
    kept = run_stream_near_dup_bounded(spark, sf_dir, work)
    m = read_near_dup_metrics(spark, work).collect()
    assert m, "no metrics rows written"
    total_in = sum(r["n_in"] for r in m)
    total_fwd = sum(r["n_forwarded"] for r in m)
    total_drop = sum(r["n_dropped"] for r in m)
    assert total_in == load_table(spark, sf_dir, "documents").count()
    assert total_fwd == kept.count()
    assert total_fwd + total_drop == total_in


def test_replay_excludes_own_batch_buckets(spark, sf_dir, tmp_path):
    """Failure-replay semantics: bucket state left by a FAILED attempt of
    the same batch id must not count as prior state (it would drop every
    replayed doc). Simulated by pre-seeding buckets/batch=0 with the full
    corpus banding and replaying batch 0 over an explicit checkpoint."""
    from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
        DOCS_RAW_SCHEMA,
        doc_band_rows,
        run_stream_near_dup_bounded,
    )

    work = str(tmp_path / "work")
    docs = (
        spark.read.schema(DOCS_RAW_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # the failed attempt's own buckets: every band of every doc
    doc_band_rows(docs).select("band_id", "band_key").distinct().write.parquet(
        f"{work}/buckets/batch=0"
    )
    out = run_stream_near_dup_bounded(
        spark,
        sf_dir,
        work,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # with the own-batch exclusion the replay behaves like a first run:
    # a non-trivial kept set survives (old behavior: zero rows)
    assert out.count() > 0


def test_fresh_checkpoint_refuses_stale_work_dir(spark, sf_dir, tmp_path):
    """Reusing a work_dir without a checkpoint restarts batch ids at 0
    against stale bucket state — must refuse loudly, not silently emit an
    empty corpus."""
    import pytest as _pytest

    from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
        run_stream_near_dup_bounded,
    )

    work = str(tmp_path / "w2")
    run_stream_near_dup_bounded(spark, sf_dir, work)
    with _pytest.raises(ValueError, match="bucket state"):
        run_stream_near_dup_bounded(spark, sf_dir, work)


def test_assert_single_batch_refuses_trigger_cap(spark, sf_dir, tmp_path):
    """The oracle-bearing mode (ADVICE r13): a trigger cap or a resumable
    checkpoint would allow multi-batch runs whose semantics diverge from
    the FULL value oracle — refuse up-front."""
    with pytest.raises(ValueError, match="ONE micro-batch"):
        run_stream_near_dup_bounded(
            spark,
            sf_dir,
            str(tmp_path / "g1"),
            max_files_per_trigger=1,
            assert_single_batch=True,
        )
    with pytest.raises(ValueError, match="ONE micro-batch"):
        run_stream_near_dup_bounded(
            spark,
            sf_dir,
            str(tmp_path / "g2"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            assert_single_batch=True,
        )


def test_assert_single_batch_passes_on_default_drain(spark, sf_dir, tmp_path):
    """Default bounded drain (one source file, availableNow) IS single-batch:
    the oracle-bearing mode succeeds and returns the same kept set."""
    kept = run_stream_near_dup_bounded(
        spark, sf_dir, str(tmp_path / "g3"), assert_single_batch=True
    )
    plain = run_stream_near_dup_bounded(spark, sf_dir, str(tmp_path / "g4"))
    assert kept.count() == plain.count()
