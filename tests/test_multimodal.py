"""Multimodal plumbing: schemas, batch shapes, determinism, and plan
properties of the decode/resize/frame-sample stages (codecs stubbed — the
contract under test is the Spark side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators.multimodal import (
    FRAMES_PER_ASSET,
    IMAGE_SIZE,
    multimodal_decode,
    multimodal_features,
    multimodal_frame_sample,
    multimodal_resize,
)
from pulsar_topic_deduplicator_spark.plans import count_exchanges, formatted_plan


def test_decode_schema_and_determinism(spark, sf_dir):
    a = multimodal_decode(spark, sf_dir)
    rows = {r["asset_id"]: r["pixels"] for r in a.collect()}
    w, h = IMAGE_SIZE
    assert all(len(p) == w * h for p in rows.values())
    assert all(0 <= v <= 255 for p in rows.values() for v in p)
    # deterministic fake: second run bit-identical
    again = {r["asset_id"]: r["pixels"] for r in multimodal_decode(spark, sf_dir).collect()}
    assert rows == again


def test_resize_block_mean(spark, sf_dir):
    full = {r["asset_id"]: r["pixels"] for r in multimodal_decode(spark, sf_dir).collect()}
    small = multimodal_resize(spark, sf_dir, 2, 2)
    r0 = small.orderBy("asset_id").first()
    assert (r0["width"], r0["height"]) == (2, 2)
    assert len(r0["pixels"]) == 4
    # top-left 2x2 block mean of the 4x4 thumbnail
    p = full[r0["asset_id"]]
    expected = int((p[0] + p[1] + p[4] + p[5]) / 4)
    assert r0["pixels"][0] == expected


def test_frame_sampling_shape(spark, sf_dir):
    frames = multimodal_frame_sample(spark, sf_dir)
    per_asset = frames.groupBy("asset_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_asset] == [FRAMES_PER_ASSET]
    assert frames.filter(F.col("frame_offset") < 0).count() == 0


def test_python_stages_have_no_shuffle(spark, sf_dir):
    """decode/feature/frame stages are partition-local: scan → Python(Arrow),
    zero exchanges — binary payloads never cross a shuffle."""
    for df in (
        multimodal_decode(spark, sf_dir),
        multimodal_features(spark, sf_dir),
        multimodal_frame_sample(spark, sf_dir),
    ):
        assert count_exchanges(df) == 0, formatted_plan(df)[:1200]
