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


def multimodal_features_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``multimodal_features`` in LONG FORM — one (asset, dim) row per
    feature cell, every column a sortable scalar — the harness-boundary
    shape (the label_centroids discipline: a double[] column cannot be
    canonicalized by the driver's pandas sort/hash). No rounding needed:
    each feature is one exact int/int double division (bucket_count/total),
    bit-identical on any engine."""
    wide = multimodal_features(spark, sf_dir)
    return wide.select(
        "asset_id",
        "n_bytes",
        F.posexplode("features").alias("dim", "feature"),
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


def _pixels_long(decoded: DataFrame) -> DataFrame:
    """Wide thumbnail rows → one (asset, pixel_idx) row per pixel: the
    harness-boundary long form (int[] columns are not canonicalizable)."""
    return decoded.select(
        "asset_id",
        "width",
        "height",
        F.posexplode("pixels").alias("pixel_idx", "pixel"),
    )


def multimodal_decode_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``multimodal_decode`` in long form — the driver-checkable shape."""
    return _pixels_long(multimodal_decode(spark, sf_dir))


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


def multimodal_resize_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``multimodal_resize`` in long form — the driver-checkable shape."""
    return _pixels_long(multimodal_resize(spark, sf_dir))


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


# ─── REAL codecs: PPM (P6) images, WAV (PCM16) audio ────────────────────────
#
# Unlike the stubbed stages above, these two decode paths parse actual wire
# formats (pure numpy/struct — functions/codecs.py): header validation,
# dimension extraction, RIFF chunk walking. The synthetic encode stage
# manufactures deterministic assets from the documents (encode → binary
# column → decode is exactly an ingest pipeline's shape), including a
# deliberately CORRUPTED asset per 50 so the decode stage's per-asset error
# handling — error row, never a task failure — is exercised end-to-end.

PPM_W = PPM_H = 8
WAV_RATE = 8000
WAV_SAMPLES = 256
#: assets with asset_id % 50 == CORRUPT_MOD are truncated mid-payload
CORRUPT_MOD = 13


def _doc_bytes(text: str, n: int) -> bytes:
    raw = text.encode("utf-8") or b"\x00"
    return (raw * (n // len(raw) + 1))[:n]


def _encode_ppm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import encode_ppm_p6

    n = PPM_W * PPM_H * 3
    for pdf in batches:
        payloads = []
        for asset_id, text in zip(pdf["asset_id"], pdf["text"]):
            arr = np.frombuffer(_doc_bytes(text, n), np.uint8).reshape(
                PPM_H, PPM_W, 3
            )
            buf = encode_ppm_p6(arr)
            if asset_id % 50 == CORRUPT_MOD:
                buf = buf[: len(buf) // 2]  # truncated upload
            payloads.append(buf)
        yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})


def ppm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-but-real PPM image column: one P6 file per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").alias("asset_id"), "text").mapInPandas(
        _encode_ppm_batches, schema="asset_id long, payload binary"
    )


_PPM_DECODE_SCHEMA = (
    "asset_id long, ok boolean, width int, height int, "
    "mean_r double, mean_g double, mean_b double, err string"
)


def _decode_ppm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.codecs import CodecError, decode_ppm_p6

    for pdf in batches:
        rows = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            try:
                w, h, arr = decode_ppm_p6(bytes(payload))
                m = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (asset_id, True, w, h, float(m[0]), float(m[1]), float(m[2]), None)
                )
            except CodecError as exc:
                rows.append(
                    (asset_id, False, None, None, None, None, None, str(exc))
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id", "ok", "width", "height",
                "mean_r", "mean_g", "mean_b", "err",
            ],
        )


def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: scan → encode stage → P6 parser → channel means.
    Corrupt payloads surface as ok=false error rows (the behavior a 100 TB
    ingest needs — one bad file must not kill a task, let alone a stage)."""
    return ppm_assets(spark, sf_dir).mapInPandas(
        _decode_ppm_batches, schema=_PPM_DECODE_SCHEMA
    )


def _encode_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import encode_wav_pcm16

    for pdf in batches:
        payloads = []
        for asset_id, text in zip(pdf["asset_id"], pdf["text"]):
            raw = np.frombuffer(_doc_bytes(text, WAV_SAMPLES), np.uint8)
            samples = ((raw.astype(np.int32) - 128) * 256).astype(np.int16)
            buf = encode_wav_pcm16(samples, WAV_RATE)
            if asset_id % 50 == CORRUPT_MOD:
                buf = buf[:20]  # header torn off mid-fmt
            payloads.append(buf)
        yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})


def wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-but-real WAV (RIFF/PCM16) audio column per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").alias("asset_id"), "text").mapInPandas(
        _encode_wav_batches, schema="asset_id long, payload binary"
    )


_WAV_SCHEMA = (
    "asset_id long, ok boolean, sample_rate int, frame_idx int, rms double, "
    "err string"
)


def _wav_frame_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import CodecError, decode_wav_pcm16

    for pdf in batches:
        rows = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            try:
                rate, _ch, samples = decode_wav_pcm16(bytes(payload))
                frames = np.array_split(
                    samples.astype(np.float64), FRAMES_PER_ASSET
                )
                for k, fr in enumerate(frames):
                    rms = float(np.sqrt(np.mean(fr * fr))) if len(fr) else 0.0
                    rows.append((asset_id, True, rate, k, rms, None))
            except CodecError as exc:
                rows.append((asset_id, False, None, None, None, str(exc)))
        yield pd.DataFrame(
            rows,
            columns=["asset_id", "ok", "sample_rate", "frame_idx", "rms", "err"],
        )


def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: RIFF chunk walk → PCM16 samples → per-frame RMS
    (the frame-sample stage with an actual codec instead of the byte-window
    stub above)."""
    return wav_assets(spark, sf_dir).mapInPandas(
        _wav_frame_energy, schema=_WAV_SCHEMA
    )


# Shared CTE for the real-codec oracles: per-document byte values of the
# utf8 text, tiled to `lim` bytes (_doc_bytes), extracted in pure SQL via
# hex-pair -> int (DuckDB has no byte-indexing on BLOB; hex() + strpos is
# exact). Corrupt assets (asset_id % 50 == CORRUPT_MOD) are excluded here
# and re-added as error rows with the codec's literal message.
_TILED_BYTES_CTE = """
        WITH d AS (
            SELECT doc_id AS asset_id,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN '00' ELSE hex(encode(text)) END AS hx,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN 1 ELSE octet_length(encode(text)) END AS n
            FROM documents
        ),
        b AS (
            SELECT asset_id, i,
                   (strpos('0123456789ABCDEF',
                           substr(hx, 2 * (i %% n) + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF',
                           substr(hx, 2 * (i %% n) + 2, 1)) - 1) AS v
            FROM d, UNNEST(range(0, %(lim)d)) AS t(i)
            WHERE asset_id %% 50 != %(corrupt)d
        )
"""

PHASH_BANDS = 4  # 4 × 16-bit blocks over the 64-bit aHash
PHASH_HAM_MAX = PHASH_BANDS - 1  # pigeonhole: full recall within radius 3


def _ahash_pack(values: list[int]) -> int:
    """64-bit average-hash core, shared by the image and audio tiers: bit
    p iff values[p] · 64 > Σ values — the mean compare done in EXACT
    integers (no division), which gives the perceptual-hash robustness
    properties for free and bit-exactly on any engine: invariant under a
    uniform additive shift ((v+c)·64 > total+64c ⇔ v·64 > total) and
    under any positive integer scale (property-pinned in
    tests/test_phash_properties.py)."""
    total = sum(values)
    ph = 0
    for p, v in enumerate(values):
        if v * 64 > total:  # strict >: an all-equal input hashes to 0
            ph |= 1 << p
    return ph


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import CodecError, decode_ppm_p6

    for pdf in batches:
        ids: list[int] = []
        lows: list[int] = []
        highs: list[int] = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            try:
                _w, _h, arr = decode_ppm_p6(bytes(payload))
            except CodecError:
                continue  # undecodable payloads carry no fingerprint
            gray = arr.reshape(-1, 3).astype(np.int64).sum(axis=1)
            ph = _ahash_pack(gray.tolist())
            ids.append(int(asset_id))
            lows.append(ph & 0xFFFFFFFF)
            highs.append(ph >> 32)
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "phash_lo": pd.Series(lows, dtype="int64"),
                "phash_hi": pd.Series(highs, dtype="int64"),
            }
        )


def image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit average-hash (aHash) per decoded image: grayscale each of the
    8×8 pixels as the integer channel sum r+g+b (0..765), set bit p iff
    gray_p * 64 > Σ gray (the mean compare done in exact integers — no
    float division, so the hash is bit-identical across engines). Emitted
    as two unsigned 32-bit halves in BIGINTs (``phash_lo``/``phash_hi``)
    so the oracle never shifts into the sign bit. Corrupt payloads
    (truncated P6) are dropped — an unfingerprintable asset cannot be
    near-dup matched. Plan: scan → encode → decode+hash in ONE Arrow
    stage, no exchange."""
    return ppm_assets(spark, sf_dir).mapInPandas(
        _phash_batches, schema="asset_id long, phash_lo long, phash_hi long"
    )


def _banded_hamming_pairs(halves: DataFrame) -> DataFrame:
    """Shared pigeonhole near-dup join over a 64-bit fingerprint frame
    ``(asset_id, phash_lo, phash_hi)`` — the ``simhash_near_dup_pairs``
    discipline (operators/neardup.py): band into 4 × 16-bit blocks,
    equi-join on (band_id, band_val), verify candidates by exact integer
    hamming ≤ 3 = bands-1. Any pair within the radius shares ≥ 1 block,
    so the banded join is EXACT (full recall, no all-pairs scan). Band
    keys are 2-byte values; only candidates reach the bit_count verify —
    the equi-join shape that scales to 100 TB of media assets."""
    from ..cachereg import persist_scoped

    width = 64 // PHASH_BANDS
    mask = (1 << width) - 1
    sig = persist_scoped(
        halves.select(
            "asset_id",
            F.shiftleft(F.col("phash_hi"), 32)
            .bitwiseOR(F.col("phash_lo"))
            .alias("sig"),
        )
    )
    stack_args = ", ".join(
        f"{i}, shiftrightunsigned(sig, {i * width}) & {mask}"
        for i in range(PHASH_BANDS)
    )
    bands = sig.select(
        "asset_id",
        "sig",
        F.expr(f"stack({PHASH_BANDS}, {stack_args}) AS (band_id, band_val)"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("asset_a", "asset_b", "hamming")
    )


def phash_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by perceptual hash — the multimodal member of
    the near-dup family (the reference dedups opaque payload bytes,
    ``src/deduplication.ts:27``; this is the perceptual generalization an
    image corpus needs, where re-encoded/resized copies hash differently
    byte-wise but identically perceptually). Banding/verify discipline:
    see ``_banded_hamming_pairs``."""
    return _banded_hamming_pairs(image_phash(spark, sf_dir))


def _audio_fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import CodecError, decode_wav_pcm16

    for pdf in batches:
        ids: list[int] = []
        lows: list[int] = []
        highs: list[int] = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            try:
                _rate, _ch, samples = decode_wav_pcm16(bytes(payload))
            except CodecError:
                continue  # undecodable payloads carry no fingerprint
            # 64 frames × 4 samples; energies are exact in int64
            # (sample² ≤ 2^30, 4-term frame sums ≤ 2^32, total ≤ 2^38)
            s = samples.astype(np.int64)
            energy = (s * s).reshape(64, -1).sum(axis=1)
            fp = _ahash_pack(energy.tolist())
            ids.append(int(asset_id))
            lows.append(fp & 0xFFFFFFFF)
            highs.append(fp >> 32)
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "fp_lo": pd.Series(lows, dtype="int64"),
                "fp_hi": pd.Series(highs, dtype="int64"),
            }
        )


def audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit energy fingerprint per decoded audio asset: 64 frames of 4
    PCM16 samples, bit p iff frame p's energy Σs² exceeds the asset mean
    (energy_p · 64 > Σ energy — exact integers, no float division). The
    PCM samples are (byte−128)·256, so energy = 65536·Σ(byte−128)²; the
    65536 factor cancels in the comparison, which is why the oracle can
    fingerprint from the raw tiled bytes with (v−128)² and get
    bit-identical results. Same unsigned-halves pack as ``image_phash``;
    corrupt payloads (torn RIFF headers) drop out. One Arrow stage, no
    exchange."""
    return wav_assets(spark, sf_dir).mapInPandas(
        _audio_fp_batches, schema="asset_id long, fp_lo long, fp_hi long"
    )


def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs by energy fingerprint — completes the
    modality symmetry (text MinHash/SimHash, image aHash, audio energy
    envelope): the same 4 × 16-bit pigeonhole banding + exact hamming ≤ 3
    verify as ``phash_image_near_dup`` (see ``_banded_hamming_pairs``)."""
    fp = audio_fingerprint(spark, sf_dir).toDF("asset_id", "phash_lo", "phash_hi")
    return _banded_hamming_pairs(fp)


# ─── Video tier: raw-PPM stream container, per-frame aHash ──────────────────
#
# A video asset is VIDEO_FRAMES back-to-back P6 frames — the raw-PPM pipe
# format (ffmpeg `-f image2pipe -vcodec ppm`), i.e. a REAL uncompressed
# container parsed by functions/codecs.py::decode_ppm_stream. Frame k's
# pixel bytes are the document's tiled byte sequence rotated by k·VIDEO_STEP
# (a deterministic "camera pan" — frames genuinely differ within an asset
# because the step is not a multiple of the 3-byte pixel width), so the
# whole tier stays integer-exact and hex-pair oracle-able.

VIDEO_FRAMES = 8
VIDEO_STEP = 29  # bytes of rotation per frame; NOT divisible by 3
#: frame-to-frame hamming above this = scene cut (quarter of the 64 bits)
SCENE_CUT_HAMMING = 16


def _encode_video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import encode_ppm_p6

    n = PPM_W * PPM_H * 3
    for pdf in batches:
        payloads = []
        for asset_id, text in zip(pdf["asset_id"], pdf["text"]):
            base = _doc_bytes(text, n)
            frames = []
            for k in range(VIDEO_FRAMES):
                off = (k * VIDEO_STEP) % n
                arr = np.frombuffer(base[off:] + base[:off], np.uint8)
                frames.append(encode_ppm_p6(arr.reshape(PPM_H, PPM_W, 3)))
            buf = b"".join(frames)
            if asset_id % 50 == CORRUPT_MOD:
                buf = buf[: len(buf) // 2 - 1]  # torn mid-frame, not on a boundary
            payloads.append(buf)
        yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})


def video_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-but-real video column: one raw-PPM stream per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").alias("asset_id"), "text").mapInPandas(
        _encode_video_batches, schema="asset_id long, payload binary"
    )


def _video_phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..functions.codecs import CodecError, decode_ppm_stream

    for pdf in batches:
        ids: list[int] = []
        idxs: list[int] = []
        lows: list[int] = []
        highs: list[int] = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            try:
                frames = decode_ppm_stream(bytes(payload))
            except CodecError:
                continue  # a torn stream carries no trustworthy fingerprint
            for k, (_w, _h, arr) in enumerate(frames):
                gray = arr.reshape(-1, 3).astype(np.int64).sum(axis=1)
                ph = _ahash_pack(gray.tolist())
                ids.append(int(asset_id))
                idxs.append(k)
                lows.append(ph & 0xFFFFFFFF)
                highs.append(ph >> 32)
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "phash_lo": pd.Series(lows, dtype="int64"),
                "phash_hi": pd.Series(highs, dtype="int64"),
            }
        )


def video_frame_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame 64-bit aHash over the decoded video stream — the temporal
    signature a video corpus dedups and segments on. Same exact-integer
    mean compare and unsigned-halves pack as ``image_phash``; torn streams
    (truncated upload) drop out whole — a video that cannot be fully
    decoded must not be half-fingerprinted. Plan: scan → encode →
    stream-decode+hash in ONE Arrow stage, no exchange."""
    return video_assets(spark, sf_dir).mapInPandas(
        _video_phash_batches,
        schema="asset_id long, frame_idx int, phash_lo long, phash_hi long",
    )


def video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs: two videos match iff EVERY temporally-aligned
    frame pair is within hamming ≤ 3 — re-encoded/re-uploaded copies, not
    merely clips sharing a frame. Completing the modality matrix (text
    MinHash/SimHash, image aHash, audio energy, video per-frame aHash).

    Scale shape: candidates come ONLY from the frame-0 pigeonhole banding
    (``_banded_hamming_pairs`` — any pair passing the all-frames criterion
    necessarily has frame 0 within radius, so frame-0 banding is EXACT
    for it); the remaining frames are verified by ONE equi-join on
    (asset, frame_idx) + a max() agg — no all-pairs scan anywhere, and the
    per-frame join fans out only over banded candidates × VIDEO_FRAMES."""
    from ..cachereg import persist_scoped

    frames = persist_scoped(video_frame_phash(spark, sf_dir))
    f0 = frames.filter(F.col("frame_idx") == 0).select(
        "asset_id", "phash_lo", "phash_hi"
    )
    cand = _banded_hamming_pairs(f0).select("asset_a", "asset_b")
    fa = frames.select(
        F.col("asset_id").alias("asset_a"),
        "frame_idx",
        F.shiftleft("phash_hi", 32).bitwiseOR(F.col("phash_lo")).alias("sig_a"),
    )
    fb = frames.select(
        F.col("asset_id").alias("asset_b"),
        "frame_idx",
        F.shiftleft("phash_hi", 32).bitwiseOR(F.col("phash_lo")).alias("sig_b"),
    )
    per_frame = cand.join(fa, "asset_a").join(fb, ["asset_b", "frame_idx"])
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        per_frame.groupBy("asset_a", "asset_b")
        .agg(F.max(hamming).alias("max_hamming"))
        .filter(F.col("max_hamming") <= PHASH_HAM_MAX)
    )


def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection: frame-to-frame hamming distance of the
    per-frame aHash, a cut where it jumps past SCENE_CUT_HAMMING — the
    shot-segmentation primitive a video curation pipeline samples
    keyframes from. One window over (asset, frame order), no join."""
    from pyspark.sql import Window

    frames = video_frame_phash(spark, sf_dir)
    sig = F.shiftleft("phash_hi", 32).bitwiseOR(F.col("phash_lo"))
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    prev = F.lag(sig).over(w)
    return (
        frames.withColumn(
            "hamming_prev", F.bit_count(sig.bitwiseXOR(prev)).cast("int")
        )
        .filter(F.col("hamming_prev").isNotNull())
        .select(
            "asset_id",
            "frame_idx",
            "hamming_prev",
            (F.col("hamming_prev") > SCENE_CUT_HAMMING).alias("is_cut"),
        )
    )


def video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe sampling: the first frame of every scene — frame 0 plus
    each frame whose hamming to its predecessor exceeds
    ``SCENE_CUT_HAMMING``. ``scene_id`` is the running cut count, so
    downstream stages can join keyframes back to their scene's frame
    range. This is the video→image bridge of a curation pipeline: the
    sampled keyframes feed the image tier (aHash near-dup, content-ID)
    at 1/scene-length the frame volume.

    Plan: both the cut flag and the running scene counter ride ONE
    window sort over (asset, frame order) — no join, no second
    exchange."""
    from pyspark.sql import Window

    frames = video_frame_phash(spark, sf_dir)
    sig = F.shiftleft("phash_hi", 32).bitwiseOR(F.col("phash_lo"))
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    ham_prev = F.bit_count(sig.bitwiseXOR(F.lag(sig).over(w)))
    is_key = ham_prev.isNull() | (ham_prev > SCENE_CUT_HAMMING)
    return (
        frames.withColumn("is_key", is_key)
        .withColumn(
            "scene_id",
            (F.sum(F.col("is_key").cast("int")).over(w) - 1).cast("int"),
        )
        .filter("is_key")
        .select("asset_id", "scene_id", "frame_idx", "phash_lo", "phash_hi")
    )


def video_content_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-ID lookup: every video frame that perceptually matches a
    known-image catalog (hamming ≤ 3 on the shared 64-bit aHash) — the
    known-asset matching primitive (copyright/content-ID scans run
    exactly this: a curated fingerprint catalog against the full frame
    stream). Emits one row per (image, video, frame) hit.

    Scale shape: the CATALOG side is banded into 4 × 16-bit blocks and
    **broadcast** — a fingerprint catalog is tiny next to 100 TB of
    video, so the frame stream is matched map-side with NO shuffle of
    the frame frame; only band-equal candidates reach the exact
    ``bit_count`` verify, and the pigeonhole theorem (radius 3 < 4
    bands) makes the banded match EXACT — full recall, proved by the
    brute-force cross-join oracle."""
    width = 64 // PHASH_BANDS
    mask = (1 << width) - 1

    def banded(halves: DataFrame, id_alias: str) -> DataFrame:
        sig_col = f"sig_{id_alias}"
        extra = [
            c
            for c in halves.columns
            if c not in ("asset_id", "phash_lo", "phash_hi")
        ]
        stack_args = ", ".join(
            f"{i}, shiftrightunsigned({sig_col}, {i * width}) & {mask}"
            for i in range(PHASH_BANDS)
        )
        return halves.select(
            F.col("asset_id").alias(id_alias),
            *extra,
            F.shiftleft("phash_hi", 32)
            .bitwiseOR(F.col("phash_lo"))
            .alias(sig_col),
        ).select(
            "*",
            F.expr(f"stack({PHASH_BANDS}, {stack_args}) AS (band_id, band_val)"),
        )

    catalog = banded(image_phash(spark, sf_dir), "image_asset")
    frames = banded(video_frame_phash(spark, sf_dir), "video_asset")
    hamming = F.bit_count(
        F.col("sig_image_asset").bitwiseXOR(F.col("sig_video_asset"))
    ).cast("int")
    return (
        frames.join(F.broadcast(catalog), ["band_id", "band_val"])
        .select("image_asset", "video_asset", "frame_idx",
                "sig_image_asset", "sig_video_asset")
        .distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("image_asset", "video_asset", "frame_idx", "hamming")
    )


def media_dup_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal duplication readout — one row per media modality
    (image / audio / video): fingerprintable asset count, verified
    near-dup pair count, assets incident to ≥1 pair, and that incidence
    as exact integer parts-per-billion. The media twin of
    ``duplicate_mass_report`` (operators/neardup.py): the first number a
    multimodal curation run reports per modality before deciding which
    dedup tiers to apply.

    Plan: three independent fingerprint+pair pipelines, each reduced to
    one-row aggregates joined by crossJoin of one-row frames (KB-bounded
    by construction); all candidate generation stays banded — the
    quadratic tier only ever runs in the oracle.

    Known accepted cost (review, round 11): each modality's decode+hash
    Arrow stage runs twice — once under the asset count and once inside
    the pair pipeline, which derives its own fingerprints. Sharing one
    persisted fingerprint frame would require the three pair functions
    to take frame arguments; the entry is a non-benched overview whose
    sf0.01 driver check pays ~2 s for the recompute, so the composition
    is kept call-compatible instead."""

    def one(modality: str, fp: DataFrame, pairs: DataFrame) -> DataFrame:
        n_assets = fp.agg(F.count("*").alias("n_assets"))
        n_pairs = pairs.agg(F.count("*").alias("n_dup_pairs"))
        incident = (
            pairs.select(F.col("asset_a").alias("aid"))
            .union(pairs.select("asset_b"))
            .agg(F.count_distinct("aid").alias("n_dup_assets"))
        )
        return (
            n_assets.crossJoin(n_pairs)
            .crossJoin(incident)
            .select(
                F.lit(modality).alias("modality"),
                "n_assets",
                "n_dup_pairs",
                "n_dup_assets",
                F.expr(
                    "CAST(1000000000 * n_dup_assets AS BIGINT) DIV n_assets"
                ).alias("dup_asset_ppb"),
            )
        )

    image = one(
        "image",
        image_phash(spark, sf_dir),
        phash_image_near_dup(spark, sf_dir),
    )
    audio = one(
        "audio",
        audio_fingerprint(spark, sf_dir),
        audio_fingerprint_near_dup(spark, sf_dir),
    )
    video = one(
        "video",
        video_frame_phash(spark, sf_dir).select("asset_id").distinct(),
        video_near_dup(spark, sf_dir),
    )
    return image.unionByName(audio).unionByName(video)


# aHash oracle CTE tail: per-unit value (pixel gray / frame energy) from
# the tiled bytes, exact-integer mean compare, packed into two 32-bit
# halves (the top bit of a single 64-bit BIGINT pack would overflow
# DuckDB's `<<`). %(stride)d bytes per unit, %(val)s the unit value term.
_AHASH_HALVES_SQL_T = """
        , g AS (
            SELECT asset_id, CAST(i // %(stride)d AS INTEGER) AS p,
                   sum(%(val)s) AS gray
            FROM b GROUP BY asset_id, i // %(stride)d
        ),
        t AS (
            SELECT asset_id, p, gray,
                   sum(gray) OVER (PARTITION BY asset_id) AS total
            FROM g
        ),
        h AS (
            SELECT asset_id,
                   CAST(sum(CASE WHEN gray * 64 > total AND p < 32
                                 THEN CAST(1 AS BIGINT) << p ELSE 0 END)
                        AS BIGINT) AS phash_lo,
                   CAST(sum(CASE WHEN gray * 64 > total AND p >= 32
                                 THEN CAST(1 AS BIGINT) << (p - 32) ELSE 0 END)
                        AS BIGINT) AS phash_hi
            FROM t GROUP BY asset_id
        )
"""

#: image aHash: 3 bytes per pixel, gray = r+g+b
_PHASH_HALVES_SQL = _AHASH_HALVES_SQL_T % {"stride": 3, "val": "v"}
#: audio energy hash: 4 bytes per frame; the engine's PCM energy is
#: 65536 × Σ(v−128)² — the constant cancels in the mean compare, so the
#: oracle fingerprints from unscaled (v−128)² with identical bits
_AUDIO_HALVES_SQL = _AHASH_HALVES_SQL_T % {
    "stride": 4,
    "val": "(v - 128) * (v - 128)",
}

# Video oracle: frame k's byte i is the tiled sequence rotated by k·STEP —
# tiled position (i + k·STEP) %% frame_len, then %% n into the utf8 hex.
# Same hex-pair extraction as _TILED_BYTES_CTE, with a frames dimension.
_VIDEO_FRAME_BYTES_CTE = """
        WITH d AS (
            SELECT doc_id AS asset_id,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN '00' ELSE hex(encode(text)) END AS hx,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN 1 ELSE octet_length(encode(text)) END AS n
            FROM documents
        ),
        b AS (
            SELECT asset_id, k, i,
                   (strpos('0123456789ABCDEF',
                           substr(hx, 2 * (((i + k * %(step)d) %% %(flen)d) %% n) + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF',
                           substr(hx, 2 * (((i + k * %(step)d) %% %(flen)d) %% n) + 2, 1)) - 1) AS v
            FROM d,
                 UNNEST(range(0, %(frames)d)) AS fk(k),
                 UNNEST(range(0, %(flen)d)) AS fi(i)
            WHERE asset_id %% 50 != %(corrupt)d
        ),
        g AS (
            SELECT asset_id, k, CAST(i // 3 AS INTEGER) AS p, sum(v) AS gray
            FROM b GROUP BY asset_id, k, i // 3
        ),
        t AS (
            SELECT asset_id, k, p, gray,
                   sum(gray) OVER (PARTITION BY asset_id, k) AS total
            FROM g
        ),
        h AS (
            SELECT asset_id, CAST(k AS INTEGER) AS frame_idx,
                   CAST(sum(CASE WHEN gray * 64 > total AND p < 32
                                 THEN CAST(1 AS BIGINT) << p ELSE 0 END)
                        AS BIGINT) AS phash_lo,
                   CAST(sum(CASE WHEN gray * 64 > total AND p >= 32
                                 THEN CAST(1 AS BIGINT) << (p - 32) ELSE 0 END)
                        AS BIGINT) AS phash_hi
            FROM t GROUP BY asset_id, k
        )
""" % {
    "step": VIDEO_STEP,
    "flen": PPM_W * PPM_H * 3,
    "frames": VIDEO_FRAMES,
    "corrupt": CORRUPT_MOD,
}

_BRUTE_PAIRS_SQL = """
        SELECT a.asset_id AS asset_a, b2.asset_id AS asset_b,
               CAST(bit_count(xor(a.phash_lo, b2.phash_lo))
                  + bit_count(xor(a.phash_hi, b2.phash_hi)) AS INTEGER)
                 AS hamming
        FROM h a JOIN h b2 ON a.asset_id < b2.asset_id
        WHERE bit_count(xor(a.phash_lo, b2.phash_lo))
            + bit_count(xor(a.phash_hi, b2.phash_hi)) <= 3
    """

# Full standalone fingerprint queries, reused verbatim by the composed
# oracles (video_content_id, media_dup_overview) as parenthesized
# subqueries — DuckDB accepts a WITH inside a derived table / CTE body.
_IMG_PHASH_SQL = (
    _TILED_BYTES_CTE % {"lim": PPM_W * PPM_H * 3, "corrupt": CORRUPT_MOD}
    + _PHASH_HALVES_SQL
    + " SELECT asset_id, phash_lo, phash_hi FROM h "
)
_AUDIO_FP_SQL = (
    _TILED_BYTES_CTE % {"lim": WAV_SAMPLES, "corrupt": CORRUPT_MOD}
    + _AUDIO_HALVES_SQL
    + " SELECT asset_id, phash_lo, phash_hi FROM h "
)
_VIDEO_PHASH_SQL = (
    _VIDEO_FRAME_BYTES_CTE
    + " SELECT asset_id, frame_idx, phash_lo, phash_hi FROM h "
)


ORACLES: dict[str, str] = {
    "image_phash": _TILED_BYTES_CTE % {"lim": PPM_W * PPM_H * 3, "corrupt": CORRUPT_MOD}
    + _PHASH_HALVES_SQL
    + """
        SELECT asset_id, phash_lo, phash_hi FROM h
    """,
    # brute-force all-pairs hamming ≤ 3 — independently verifies the banded
    # join's pigeonhole exactness claim (the quadratic tier is the ORACLE's
    # cost, never the pipeline's)
    "phash_image_near_dup": _TILED_BYTES_CTE % {"lim": PPM_W * PPM_H * 3, "corrupt": CORRUPT_MOD}
    + _PHASH_HALVES_SQL
    + _BRUTE_PAIRS_SQL,
    "audio_fingerprint": _TILED_BYTES_CTE % {"lim": WAV_SAMPLES, "corrupt": CORRUPT_MOD}
    + _AUDIO_HALVES_SQL
    + """
        SELECT asset_id, phash_lo AS fp_lo, phash_hi AS fp_hi FROM h
    """,
    "audio_fingerprint_near_dup": _TILED_BYTES_CTE % {"lim": WAV_SAMPLES, "corrupt": CORRUPT_MOD}
    + _AUDIO_HALVES_SQL
    + _BRUTE_PAIRS_SQL,
    "video_frame_phash": _VIDEO_FRAME_BYTES_CTE
    + """
        SELECT asset_id, frame_idx, phash_lo, phash_hi FROM h
    """,
    # brute-force ALL aligned-frame pairs (no frame-0 shortcut) — proves
    # both the banding pigeonhole AND the frame-0-candidate completeness
    # theorem the engine's plan rests on
    "video_near_dup": _VIDEO_FRAME_BYTES_CTE
    + """
        SELECT a.asset_id AS asset_a, b2.asset_id AS asset_b,
               CAST(max(bit_count(xor(a.phash_lo, b2.phash_lo))
                      + bit_count(xor(a.phash_hi, b2.phash_hi)))
                    AS INTEGER) AS max_hamming
        FROM h a JOIN h b2
          ON a.frame_idx = b2.frame_idx AND a.asset_id < b2.asset_id
        GROUP BY a.asset_id, b2.asset_id
        HAVING max(bit_count(xor(a.phash_lo, b2.phash_lo))
                 + bit_count(xor(a.phash_hi, b2.phash_hi))) <= 3
    """,
    "video_scene_cuts": _VIDEO_FRAME_BYTES_CTE
    + """
        SELECT asset_id, frame_idx, hamming_prev,
               hamming_prev > %d AS is_cut
        FROM (
            SELECT asset_id, frame_idx,
                   CAST(bit_count(xor(phash_lo, lag(phash_lo)
                                      OVER (PARTITION BY asset_id
                                            ORDER BY frame_idx)))
                      + bit_count(xor(phash_hi, lag(phash_hi)
                                      OVER (PARTITION BY asset_id
                                            ORDER BY frame_idx)))
                        AS INTEGER) AS hamming_prev
            FROM h
        )
        WHERE hamming_prev IS NOT NULL
    """
    % SCENE_CUT_HAMMING,
    # keyframes: cut flag + running scene counter over the frame hashes
    "video_keyframes": _VIDEO_FRAME_BYTES_CTE
    + """
        SELECT asset_id, CAST(scene_id - 1 AS INTEGER) AS scene_id,
               frame_idx, phash_lo, phash_hi
        FROM (
            SELECT asset_id, frame_idx, phash_lo, phash_hi, is_key,
                   sum(is_key) OVER (PARTITION BY asset_id
                                     ORDER BY frame_idx) AS scene_id
            FROM (
                SELECT asset_id, frame_idx, phash_lo, phash_hi,
                       CASE WHEN ham IS NULL OR ham > %d
                            THEN 1 ELSE 0 END AS is_key
                FROM (
                    SELECT asset_id, frame_idx, phash_lo, phash_hi,
                           bit_count(xor(phash_lo, lag(phash_lo) OVER w))
                         + bit_count(xor(phash_hi, lag(phash_hi) OVER w))
                             AS ham
                    FROM h
                    WINDOW w AS (PARTITION BY asset_id ORDER BY frame_idx)
                )
            )
        )
        WHERE is_key = 1
    """
    % SCENE_CUT_HAMMING,
    # content-ID: brute-force catalog × frame cross join — independently
    # proves the broadcast banded match's pigeonhole completeness
    "video_content_id": (
        """
        SELECT i.asset_id AS image_asset, v.asset_id AS video_asset,
               v.frame_idx,
               CAST(bit_count(xor(i.phash_lo, v.phash_lo))
                  + bit_count(xor(i.phash_hi, v.phash_hi)) AS INTEGER)
                 AS hamming
        FROM ("""
        + _IMG_PHASH_SQL
        + """) i JOIN ("""
        + _VIDEO_PHASH_SQL
        + """) v
          ON bit_count(xor(i.phash_lo, v.phash_lo))
           + bit_count(xor(i.phash_hi, v.phash_hi)) <= 3
    """
    ),
    # cross-modal overview: each modality's brute-force pair tier over its
    # fingerprint frame, reduced to the one-row-per-modality readout
    "media_dup_overview": (
        """
        WITH ih AS ("""
        + _IMG_PHASH_SQL
        + """),
        ah AS ("""
        + _AUDIO_FP_SQL
        + """),
        vh AS ("""
        + _VIDEO_PHASH_SQL
        + """),
        ip AS (
            SELECT a.asset_id AS x, b2.asset_id AS y
            FROM ih a JOIN ih b2 ON a.asset_id < b2.asset_id
            WHERE bit_count(xor(a.phash_lo, b2.phash_lo))
                + bit_count(xor(a.phash_hi, b2.phash_hi)) <= 3
        ),
        ap AS (
            SELECT a.asset_id AS x, b2.asset_id AS y
            FROM ah a JOIN ah b2 ON a.asset_id < b2.asset_id
            WHERE bit_count(xor(a.phash_lo, b2.phash_lo))
                + bit_count(xor(a.phash_hi, b2.phash_hi)) <= 3
        ),
        vp AS (
            SELECT a.asset_id AS x, b2.asset_id AS y
            FROM vh a JOIN vh b2
              ON a.frame_idx = b2.frame_idx AND a.asset_id < b2.asset_id
            GROUP BY 1, 2
            HAVING max(bit_count(xor(a.phash_lo, b2.phash_lo))
                     + bit_count(xor(a.phash_hi, b2.phash_hi))) <= 3
        )
        SELECT modality, n_assets, n_dup_pairs, n_dup_assets,
               CAST(1000000000 * n_dup_assets AS BIGINT) // n_assets
                 AS dup_asset_ppb
        FROM (
            SELECT 'image' AS modality,
                   (SELECT count(*) FROM ih) AS n_assets,
                   (SELECT count(*) FROM ip) AS n_dup_pairs,
                   (SELECT count(DISTINCT u) FROM
                        (SELECT x AS u FROM ip
                         UNION ALL SELECT y FROM ip)) AS n_dup_assets
            UNION ALL
            SELECT 'audio',
                   (SELECT count(*) FROM ah),
                   (SELECT count(*) FROM ap),
                   (SELECT count(DISTINCT u) FROM
                        (SELECT x AS u FROM ap
                         UNION ALL SELECT y FROM ap))
            UNION ALL
            SELECT 'video',
                   (SELECT count(DISTINCT asset_id) FROM vh),
                   (SELECT count(*) FROM vp),
                   (SELECT count(DISTINCT u) FROM
                        (SELECT x AS u FROM vp
                         UNION ALL SELECT y FROM vp))
        )
    """
    ),
    "multimodal_meta": """
        SELECT doc_id AS asset_id,
               'text/plain' AS media_type,
               source,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha -- this DuckDB's sha256 takes VARCHAR only; payload is utf8(text), same bytes
        FROM documents
    """,
    # P6 decode: payload = 11-byte header + text bytes tiled to 8*8*3; the
    # channel means are exact (sum of 64 uint8 is exact in double; /64 is a
    # power-of-two division) so Spark/numpy and DuckDB agree bit-for-bit.
    # Corrupt assets are truncated to 101 bytes -> 90 pixel bytes survive.
    "multimodal_decode_ppm": _TILED_BYTES_CTE % {"lim": PPM_W * PPM_H * 3, "corrupt": CORRUPT_MOD}
    + """
        SELECT asset_id, TRUE AS ok,
               CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               avg(CASE WHEN i %% 3 = 0 THEN v END) AS mean_r,
               avg(CASE WHEN i %% 3 = 1 THEN v END) AS mean_g,
               avg(CASE WHEN i %% 3 = 2 THEN v END) AS mean_b,
               CAST(NULL AS VARCHAR) AS err
        FROM b GROUP BY asset_id
        UNION ALL
        SELECT asset_id, FALSE, NULL, NULL, NULL, NULL, NULL,
               'short pixel data: 90 != 192'
        FROM d WHERE asset_id %% 50 = %(corrupt)d
    """ % {"corrupt": CORRUPT_MOD},
    # Byte-histogram features (stub stage, but integer-exact): feature[dim]
    # = count(byte % 8 == dim) / max(L, 1) — one int/int double division,
    # bit-identical across engines. Empty docs produce all-zero features.
    "multimodal_features": """
        WITH d AS (
            SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS L
            FROM documents
        ),
        b AS (
            SELECT asset_id,
                   (strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1) AS v
            FROM d, UNNEST(range(0, L)) AS t(i)
        )
        SELECT d.asset_id, CAST(d.L AS INTEGER) AS n_bytes,
               CAST(t.dim AS INTEGER) AS dim,
               coalesce(sum(CASE WHEN b.v % 8 = t.dim THEN 1 ELSE 0 END), 0)
                 / greatest(d.L, 1) AS feature
        FROM d
        CROSS JOIN UNNEST(range(0, 8)) AS t(dim)
        LEFT JOIN b ON b.asset_id = d.asset_id
        GROUP BY d.asset_id, d.L, t.dim
    """,
    # Stub image decode (integer-exact): 16 grid-strided chunks, pixel =
    # floor-mean of each chunk's bytes; chunks past a short payload fall
    # back to the last byte (Python's `or buf[-1:]`). '00' fallback for
    # empty docs mirrors `bytes(payload) or b"\\x00"`.
    "multimodal_decode": """
        WITH d AS (
            SELECT doc_id AS asset_id,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN '00' ELSE hex(encode(text)) END AS hx,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN 1 ELSE octet_length(encode(text)) END AS n
            FROM documents
        ),
        cells AS (
            SELECT asset_id, hx, n, CAST(i AS INTEGER) AS pixel_idx,
                   i * greatest(n // 16, 1) AS lo,
                   least((i + 1) * greatest(n // 16, 1), n) AS hi
            FROM d, UNNEST(range(0, 16)) AS t(i)
        ),
        b AS (
            SELECT asset_id, pixel_idx,
                   (strpos('0123456789ABCDEF', substr(hx, 2*j + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF', substr(hx, 2*j + 2, 1)) - 1) AS v
            FROM cells, UNNEST(range(lo, hi)) AS u(j)
        ),
        agg AS (
            SELECT asset_id, pixel_idx,
                   CAST(sum(v) // count(*) AS INTEGER) AS pixel
            FROM b GROUP BY asset_id, pixel_idx
            UNION ALL
            SELECT asset_id, pixel_idx,
                   CAST((strpos('0123456789ABCDEF',
                                substr(hx, 2*(n-1) + 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                                substr(hx, 2*(n-1) + 2, 1)) - 1) AS INTEGER)
            FROM cells WHERE lo >= n
        )
        SELECT asset_id, CAST(4 AS INTEGER) AS width,
               CAST(4 AS INTEGER) AS height, pixel_idx, pixel
        FROM agg
    """,
    # 2x2 block-mean downsample of the decoded 4x4 thumbnail: out pixel =
    # trunc(mean of its 2x2 source block) — Spark computes (sum/4) cast to
    # int (trunc == floor on non-negative), DuckDB integer floor division.
    "multimodal_resize": """
        WITH d AS (
            SELECT doc_id AS asset_id,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN '00' ELSE hex(encode(text)) END AS hx,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN 1 ELSE octet_length(encode(text)) END AS n
            FROM documents
        ),
        cells AS (
            SELECT asset_id, hx, n, CAST(i AS INTEGER) AS pixel_idx,
                   i * greatest(n // 16, 1) AS lo,
                   least((i + 1) * greatest(n // 16, 1), n) AS hi
            FROM d, UNNEST(range(0, 16)) AS t(i)
        ),
        b AS (
            SELECT asset_id, pixel_idx,
                   (strpos('0123456789ABCDEF', substr(hx, 2*j + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF', substr(hx, 2*j + 2, 1)) - 1) AS v
            FROM cells, UNNEST(range(lo, hi)) AS u(j)
        ),
        decoded AS (
            SELECT asset_id, pixel_idx,
                   CAST(sum(v) // count(*) AS INTEGER) AS pixel
            FROM b GROUP BY asset_id, pixel_idx
            UNION ALL
            SELECT asset_id, pixel_idx,
                   CAST((strpos('0123456789ABCDEF',
                                substr(hx, 2*(n-1) + 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                                substr(hx, 2*(n-1) + 2, 1)) - 1) AS INTEGER)
            FROM cells WHERE lo >= n
        )
        SELECT asset_id, CAST(2 AS INTEGER) AS width,
               CAST(2 AS INTEGER) AS height,
               CAST((pixel_idx // 4 // 2) * 2 + (pixel_idx % 4) // 2
                    AS INTEGER) AS pixel_idx,
               CAST(sum(pixel) // 4 AS INTEGER) AS pixel
        FROM decoded
        GROUP BY asset_id, (pixel_idx // 4 // 2) * 2 + (pixel_idx % 4) // 2
    """,
    # Frame sampling (stub codec, but integer-exact): 4 evenly-strided
    # 32-byte windows over the raw utf8 payload; energy = mean byte value
    # (exact int sum / window length on both engines). Offsets replicate
    # _sample_frames: stride = max((L-32) // 3, 1), off = min(k*stride,
    # max(L-32, 0)), window = bytes[off : min(off+32, L)) — nonempty for
    # L >= 1, and L >= 1 by the '00' empty-payload fallback.
    "multimodal_frame_sample": """
        WITH d AS (
            SELECT doc_id AS asset_id,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN '00' ELSE hex(encode(text)) END AS hx,
                   CASE WHEN octet_length(encode(text)) = 0
                        THEN 1 ELSE octet_length(encode(text)) END AS n
            FROM documents
        ),
        f AS (
            SELECT asset_id, hx, n, CAST(k AS INTEGER) AS frame_idx,
                   CAST(least(k * greatest((n - 32) // 3, 1),
                              greatest(n - 32, 0)) AS INTEGER) AS frame_offset
            FROM d, UNNEST(range(0, 4)) AS t(k)
        ),
        b AS (
            SELECT asset_id, frame_idx, frame_offset,
                   (strpos('0123456789ABCDEF',
                           substr(hx, 2 * (frame_offset + j) + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF',
                           substr(hx, 2 * (frame_offset + j) + 2, 1)) - 1) AS v
            FROM f, UNNEST(range(0, 32)) AS w(j)
            WHERE frame_offset + j < n
        )
        SELECT asset_id, frame_idx, frame_offset,
               avg(v) AS frame_energy
        FROM b GROUP BY asset_id, frame_idx, frame_offset
    """,
    # WAV decode: sample k = (byte(k) - 128) * 256 over 256 tiled bytes;
    # 4 frames of 64 samples, rms = sqrt(avg(v^2)) — v^2 <= 2^30 so the
    # 64-term sum is exact in double and sqrt is correctly rounded on both
    # engines. Corrupt assets keep only 20 header bytes -> torn fmt chunk.
    "multimodal_wav_energy": _TILED_BYTES_CTE % {"lim": WAV_SAMPLES, "corrupt": CORRUPT_MOD}
    + """
        SELECT asset_id, TRUE AS ok,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(i // 64 AS INTEGER) AS frame_idx,
               sqrt(avg(CAST((v - 128) * 256 AS DOUBLE)
                        * CAST((v - 128) * 256 AS DOUBLE))) AS rms,
               CAST(NULL AS VARCHAR) AS err
        FROM b GROUP BY asset_id, i // 64
        UNION ALL
        SELECT asset_id, FALSE, NULL, NULL, NULL, 'short fmt chunk'
        FROM d WHERE asset_id %% 50 = %(corrupt)d
    """ % {"corrupt": CORRUPT_MOD},
}
