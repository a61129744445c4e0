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
