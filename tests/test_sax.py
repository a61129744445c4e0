"""SAX symbolic time-series indexing: segment assignment, equi-width
symbol quantization, empty-segment densification, and same-shape grouping
on a hand-built event log where every letter is derivable by eye."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.operators.analytics import (
    SAX_ALPHA,
    SAX_SEGMENTS,
    sax_fingerprints,
    sax_word_counts,
)


@pytest.fixture(scope="module")
def sax_dir(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    # events at hours 0..7 -> global span = 7 h, so seg(h) =
    # floor(h*3600e6*8 / (7*3600e6+1)) = floor(8h/7 - eps) which equals h
    # for every h in 0..7 (8h/7 < h+1 ⇔ h < 7, and h=7 gives just under
    # 8). Each on-the-hour event therefore lands in its own segment h.
    # user 1: value 100.00 in every segment   -> flat high word
    # user 2: value 100.00 in segments 0 and 7, nothing else -> spike word
    # user 3: same shape as user 2 (same word, different user)
    rows = []
    eid = 0
    for h in range(SAX_SEGMENTS):
        rows.append((eid, f"2024-01-01 0{h}:00:00", 1, 100.0)); eid += 1
    for uid in (2, 3):
        rows.append((eid, "2024-01-01 00:00:00", uid, 100.0)); eid += 1
        rows.append((eid, "2024-01-01 07:00:00", uid, 100.0)); eid += 1
    path = tmp_path_factory.mktemp("sax")
    spark.createDataFrame(
        rows, "event_id long, tss string, user_id long, value double"
    ).select(
        "event_id",
        F.to_timestamp("tss").alias("ts"),
        "user_id",
        F.lit("view").alias("event_type"),
        "value",
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))
    return str(path)


def test_sax_words_by_hand(spark, sax_dir):
    assert (SAX_SEGMENTS, SAX_ALPHA) == (8, 4)
    out = {r["user_id"]: r for r in sax_fingerprints(spark, sax_dir).collect()}
    # segment sums: 10000 cents or 0; qmin=0 (user 2/3 empty segments),
    # qmax=10000 -> sym(10000)=(10000*4) div 10001 = 3 'd'; sym(0)=0 'a'
    assert out[1]["sax_word"] == "d" * SAX_SEGMENTS
    assert out[2]["sax_word"] == "d" + "a" * (SAX_SEGMENTS - 2) + "d"
    assert out[3]["sax_word"] == out[2]["sax_word"]  # same shape, same word
    assert out[1]["n_events"] == SAX_SEGMENTS
    assert out[1]["total_cents"] == 10000 * SAX_SEGMENTS


def test_sax_word_counts_group_same_shape(spark, sax_dir):
    rows = {r["sax_word"]: r for r in sax_word_counts(spark, sax_dir).collect()}
    assert rows["d" * SAX_SEGMENTS]["n_users"] == 1
    spike = "d" + "a" * (SAX_SEGMENTS - 2) + "d"
    assert rows[spike]["n_users"] == 2
    assert rows[spike]["n_events"] == 4


def test_sax_single_event_corpus_degenerate(spark, tmp_path_factory):
    """One event: span = 0 (den = 1), every empty segment quantizes against
    qmin=0 — the den/qrange +1 guards must keep all divisions defined and
    the word well-formed."""
    import pyspark.sql.functions as F

    path = tmp_path_factory.mktemp("sax1")
    spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", 7, 3.5)],
        "event_id long, tss string, user_id long, value double",
    ).select(
        "event_id",
        F.to_timestamp("tss").alias("ts"),
        "user_id",
        F.lit("view").alias("event_type"),
        "value",
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))
    rows = sax_fingerprints(spark, str(path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # 350 cents in segment 0; qmin=0, qmax=350 -> seg0 'd', rest 'a'
    assert r["sax_word"] == "d" + "a" * (SAX_SEGMENTS - 1)
    assert r["n_events"] == 1 and r["total_cents"] == 350
