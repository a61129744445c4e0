"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The reference treats its payload as opaque bytes end-to-end
(``src/deduplication.ts:27``: hash it, forward it verbatim) — exactly the
right model for image/audio/video columns in a training-data pipeline. This
module makes that model concrete in Spark:

* binary column + typed metadata columns (size, content hash, declared kind)
  — all built-in expressions, oracle-checkable;
* a decode/feature-extract stage as an Arrow-batched ``mapInPandas``
  pipeline with a real schema/partitioning/batch contract. The actual codec
  work is STUBBED (no image/audio libraries in this container — marked
  clearly below) behind a deterministic fake so the Spark-side plumbing is
  real and tested.

Scale notes: binary payloads never cross a shuffle here — metadata is
derived in the scan projection, and the mapInPandas stage is
partition-local (no groupBy), so the plan is scan → project → Python(Arrow)
with no exchange at any size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.io import load_table

FEATURE_DIM = 8


def multimodal_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents viewed as opaque binary assets with typed metadata — the
    schema an image/audio table shares. ``payload`` stands in for encoded
    media bytes; at 100 TB it would be parquet binary (or object-store URIs
    + a fetch stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.col("source"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extracted from the opaque payload: byte size + content
    hash (the dedup identity for media, reference op #6 applied to bytes)."""
    assets = multimodal_assets(spark, sf_dir)
    return assets.select(
        "asset_id",
        "media_type",
        "source",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("content_sha"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads.

    STUB: a real pipeline would decode the media here (PIL/torchaudio/
    ffmpeg are not in this container). The fake feature is deterministic —
    byte-histogram moments over FEATURE_DIM buckets — so the batch shape,
    schema, and partition behavior are all real and testable.
    """
    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            buf = bytes(payload)
            buckets = [0] * FEATURE_DIM
            for byte in buf:
                buckets[byte % FEATURE_DIM] += 1
            total = max(len(buf), 1)
            feats.append([b / total for b in buckets])
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage: scan → mapInPandas(Arrow) → features.
    Partition-local (no shuffle); rows-only in the oracle (the Python stage
    is by definition not SQL)."""
    assets = multimodal_assets(spark, sf_dir)
    return assets.select("asset_id", "payload").mapInPandas(
        _extract_features, schema=_FEATURE_SCHEMA
    )


# ─── decode / resize / frame-sample stages ──────────────────────────────────
#
# Real pipelines decode with PIL/ffmpeg/torchaudio — none of which exist in
# this container, so the codec calls are STUBBED (clearly marked below). The
# Spark side — schemas, Arrow batch shapes, partition-local execution, the
# option of a deterministic fake for testing — is real, which is what makes
# the plumbing swappable for actual codecs without touching the plan.

try:  # feature gate for a real image codec
    import PIL.Image as _pil_image  # noqa: F401

    HAS_IMAGE_CODEC = True
except ImportError:
    HAS_IMAGE_CODEC = False

IMAGE_SIZE = (4, 4)  # deterministic-fake "decoded" thumbnail dims
FRAME_WINDOW = 32  # bytes per fake audio frame
FRAMES_PER_ASSET = 4

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def _decode_image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode stage. STUB: with a real codec this would be
    ``PIL.Image.open(io.BytesIO(payload))``; the container has no image
    libraries, so payload bytes are folded into a deterministic WxH
    grayscale thumbnail (grid-strided byte means) — same schema, same batch
    shape, stable across runs."""
    if HAS_IMAGE_CODEC:  # pragma: no cover - not available in this container
        raise NotImplementedError(
            "real codec path intentionally unimplemented; wire PIL here"
        )
    w, h = IMAGE_SIZE
    for pdf in batches:
        pixels = []
        for payload in pdf["payload"]:
            buf = bytes(payload) or b"\x00"
            cells = []
            step = max(len(buf) // (w * h), 1)
            for i in range(w * h):
                chunk = buf[i * step : (i + 1) * step] or buf[-1:]
                cells.append(sum(chunk) // len(chunk))
            pixels.append(cells)
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": w,
                "height": h,
                "pixels": pixels,
            }
        )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan → mapInPandas decode (partition-local, no shuffle)."""
    assets = multimodal_assets(spark, sf_dir)
    return assets.select("asset_id", "payload").mapInPandas(
        _decode_image_batches, schema=_DECODE_SCHEMA
    )


def multimodal_resize(
    spark: SparkSession, sf_dir: str, out_w: int = 2, out_h: int = 2
) -> DataFrame:
    """Resize stage over decoded thumbnails: 2×2 block-mean downsample —
    pure column math (no Python beyond the decode), demonstrating that
    post-decode transforms stay JVM-side."""
    decoded = multimodal_decode(spark, sf_dir)
    w, h = IMAGE_SIZE
    fx, fy = w // out_w, h // out_h
    blocks = []
    for by in range(out_h):
        for bx in range(out_w):
            idxs = [
                (by * fy + y) * w + (bx * fx + x) + 1  # element_at is 1-based
                for y in range(fy)
                for x in range(fx)
            ]
            cell = None
            for i in idxs:
                e = F.element_at(F.col("pixels"), i)
                cell = e if cell is None else (cell + e)
            blocks.append((cell / len(idxs)).cast("int"))
    return decoded.select(
        "asset_id",
        F.lit(out_w).alias("width"),
        F.lit(out_h).alias("height"),
        F.array(*blocks).alias("pixels"),
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.IntegerType()),
        T.StructField("frame_energy", T.DoubleType()),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-sampling stage (audio/video analog). STUB codec: frames are
    evenly-strided byte windows and 'energy' is the window's mean byte value
    — with ffmpeg this would be real PCM/frame extraction, same schema."""
    for pdf in batches:
        out = {"asset_id": [], "frame_idx": [], "frame_offset": [], "frame_energy": []}
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            buf = bytes(payload) or b"\x00"
            stride = max((len(buf) - FRAME_WINDOW) // max(FRAMES_PER_ASSET - 1, 1), 1)
            for k in range(FRAMES_PER_ASSET):
                off = min(k * stride, max(len(buf) - FRAME_WINDOW, 0))
                frame = buf[off : off + FRAME_WINDOW] or buf[-1:]
                out["asset_id"].append(asset_id)
                out["frame_idx"].append(k)
                out["frame_offset"].append(off)
                out["frame_energy"].append(sum(frame) / len(frame))
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan → mapInPandas frame sampling: one row per (asset, frame)."""
    assets = multimodal_assets(spark, sf_dir)
    return assets.select("asset_id", "payload").mapInPandas(
        _sample_frames, schema=_FRAME_SCHEMA
    )


ORACLES: dict[str, str] = {
    "multimodal_meta": """
        SELECT doc_id AS asset_id,
               'text/plain' AS media_type,
               source,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha -- this DuckDB's sha256 takes VARCHAR only; payload is utf8(text), same bytes
        FROM documents
    """,
}
