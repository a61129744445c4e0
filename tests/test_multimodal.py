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


# ─── real codecs: PPM / WAV ─────────────────────────────────────────────────


def test_ppm_round_trip_and_errors():
    import numpy as np
    import pytest

    from pulsar_topic_deduplicator_spark.functions.codecs import (
        CodecError,
        decode_ppm_p6,
        encode_ppm_p6,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, back = decode_ppm_p6(encode_ppm_p6(arr))
    assert (w, h) == (9, 5)
    assert (back == arr).all()
    # comment-tolerant header
    buf = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    assert decode_ppm_p6(buf)[0] == 2
    with pytest.raises(CodecError, match="magic"):
        decode_ppm_p6(b"P5\n1 1\n255\n\x00")
    with pytest.raises(CodecError, match="short pixel"):
        decode_ppm_p6(encode_ppm_p6(arr)[:-1])


def test_wav_round_trip_and_errors():
    import numpy as np
    import pytest

    from pulsar_topic_deduplicator_spark.functions.codecs import (
        CodecError,
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=300, dtype=np.int16)
    rate, ch, back = decode_wav_pcm16(encode_wav_pcm16(samples, 16000))
    assert (rate, ch) == (16000, 1)
    assert (back == samples).all()
    with pytest.raises(CodecError, match="RIFF"):
        decode_wav_pcm16(b"OggS" + bytes(40))
    with pytest.raises(CodecError, match="short fmt"):
        decode_wav_pcm16(encode_wav_pcm16(samples, 16000)[:30])
    with pytest.raises(CodecError, match="no data chunk"):
        decode_wav_pcm16(encode_wav_pcm16(samples, 16000)[:38])
    # odd-sized data chunk: must be CodecError, not numpy's ValueError
    import struct

    good = encode_wav_pcm16(samples[:4], 8000)  # data chunk at offset 36
    odd = good[:36] + b"data" + struct.pack("<I", 5) + good[44:49]
    with pytest.raises(CodecError, match="odd data chunk"):
        decode_wav_pcm16(odd)


def test_decode_ppm_end_to_end(spark, sf_dir):
    """Real P6 parsing over the synthetic image column: every non-corrupted
    asset decodes to 8x8 with channel means matching a driver-side numpy
    recompute; corrupted assets surface as ok=false rows, not failures."""
    import numpy as np

    from pulsar_topic_deduplicator_spark.operators.multimodal import (
        CORRUPT_MOD,
        PPM_H,
        PPM_W,
        _doc_bytes,
        multimodal_decode_ppm,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    rows = {r["asset_id"]: r for r in multimodal_decode_ppm(spark, sf_dir).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert set(rows) == set(texts)
    bad = {a for a in rows if a % 50 == CORRUPT_MOD}
    assert bad, "corpus should contain corrupted assets"
    for a, r in rows.items():
        if a in bad:
            assert not r["ok"] and r["err"]
        else:
            assert r["ok"] and (r["width"], r["height"]) == (PPM_W, PPM_H)
    probe = next(iter(sorted(set(rows) - bad)))
    arr = np.frombuffer(
        _doc_bytes(texts[probe], PPM_W * PPM_H * 3), np.uint8
    ).reshape(-1, 3)
    assert rows[probe]["mean_r"] == float(arr.mean(axis=0)[0])


def test_wav_energy_end_to_end(spark, sf_dir):
    import numpy as np

    from pulsar_topic_deduplicator_spark.operators.multimodal import (
        CORRUPT_MOD,
        FRAMES_PER_ASSET,
        WAV_SAMPLES,
        _doc_bytes,
        multimodal_wav_energy,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    out = multimodal_wav_energy(spark, sf_dir).collect()
    ok_rows = [r for r in out if r["ok"]]
    bad_rows = [r for r in out if not r["ok"]]
    assert bad_rows and all(r["err"] for r in bad_rows)
    per_asset = {}
    for r in ok_rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert all(len(v) == FRAMES_PER_ASSET for v in per_asset.values())
    # driver-side RMS parity for one asset's first frame
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    probe = min(per_asset)
    raw = np.frombuffer(_doc_bytes(texts[probe], WAV_SAMPLES), np.uint8)
    samples = ((raw.astype(np.int32) - 128) * 256).astype(np.float64)
    fr = np.array_split(samples, FRAMES_PER_ASSET)[0]
    want = float(np.sqrt(np.mean(fr * fr)))
    got = next(r["rms"] for r in per_asset[probe] if r["frame_idx"] == 0)
    assert got == want


# ─── video tier: raw-PPM stream container, per-frame aHash ──────────────────


def test_ppm_stream_round_trip_and_errors():
    import numpy as np
    import pytest

    from pulsar_topic_deduplicator_spark.functions.codecs import (
        CodecError,
        decode_ppm_stream,
        encode_ppm_p6,
    )

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8) for _ in range(3)
    ]
    buf = b"".join(encode_ppm_p6(f) for f in frames)
    back = decode_ppm_stream(buf)
    assert len(back) == 3
    for (w, h, arr), orig in zip(back, frames):
        assert (w, h) == (6, 4) and (arr == orig).all()
    with pytest.raises(CodecError, match="short pixel"):
        decode_ppm_stream(buf[:-1])  # torn last frame
    with pytest.raises(CodecError, match="magic"):
        decode_ppm_stream(buf + b"JUNK")  # trailing garbage is not a frame
    with pytest.raises(CodecError, match="empty"):
        decode_ppm_stream(b"")


def test_video_tier_end_to_end(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators.multimodal import (
        CORRUPT_MOD,
        PHASH_HAM_MAX,
        SCENE_CUT_HAMMING,
        VIDEO_FRAMES,
        video_frame_phash,
        video_near_dup,
        video_scene_cuts,
    )

    frames = video_frame_phash(spark, sf_dir).collect()
    per_asset: dict[int, dict[int, int]] = {}
    for r in frames:
        assert 0 <= r["phash_lo"] < 1 << 32 and 0 <= r["phash_hi"] < 1 << 32
        per_asset.setdefault(r["asset_id"], {})[r["frame_idx"]] = (
            r["phash_hi"] << 32 | r["phash_lo"]
        )
    # torn uploads drop out whole; survivors carry ALL frames
    assert all(a % 50 != CORRUPT_MOD for a in per_asset)
    assert all(sorted(v) == list(range(VIDEO_FRAMES)) for v in per_asset.values())

    # near-dup == brute-force all-pairs max aligned-frame hamming ≤ radius
    want = {}
    ids = sorted(per_asset)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            mh = max(
                bin(per_asset[a][k] ^ per_asset[b][k]).count("1")
                for k in range(VIDEO_FRAMES)
            )
            if mh <= PHASH_HAM_MAX:
                want[(a, b)] = mh
    got = {
        (r["asset_a"], r["asset_b"]): r["max_hamming"]
        for r in video_near_dup(spark, sf_dir).collect()
    }
    assert got == want and want  # non-empty: planted dup docs pair up

    # scene cuts: one row per successive-frame transition, exact hamming
    cuts = video_scene_cuts(spark, sf_dir).collect()
    assert len(cuts) == len(per_asset) * (VIDEO_FRAMES - 1)
    for r in cuts:
        sig = per_asset[r["asset_id"]]
        ham = bin(sig[r["frame_idx"]] ^ sig[r["frame_idx"] - 1]).count("1")
        assert r["hamming_prev"] == ham
        assert r["is_cut"] == (ham > SCENE_CUT_HAMMING)


def test_video_phash_stage_has_no_shuffle(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators.multimodal import (
        video_frame_phash,
    )

    df = video_frame_phash(spark, sf_dir)
    assert count_exchanges(df) == 0, formatted_plan(df)[:1200]
