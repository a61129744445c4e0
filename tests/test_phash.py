"""Media perceptual-fingerprint near-dup tier (round 11): image aHash and
audio energy-fingerprint bit recomputes vs pure Python, corrupt-asset
exclusion, and the banding-completeness claim — the banded equi-join must
emit EXACTLY the brute-force all-pairs set within the hamming radius
(pigeonhole, 4 blocks / radius 3).
"""

from __future__ import annotations

import numpy as np

from pulsar_topic_deduplicator_spark.operators.multimodal import (
    CORRUPT_MOD,
    PHASH_HAM_MAX,
    PPM_H,
    PPM_W,
    WAV_SAMPLES,
    audio_fingerprint,
    audio_fingerprint_near_dup,
    image_phash,
    phash_image_near_dup,
)
from pulsar_topic_deduplicator_spark.sources.io import load_table


def _expected_hashes(docs) -> dict[int, int]:
    n = PPM_W * PPM_H * 3
    out: dict[int, int] = {}
    for doc_id, text in docs:
        if doc_id % 50 == CORRUPT_MOD:
            continue  # truncated upload — decode fails, no fingerprint
        raw = text.encode("utf-8") or b"\x00"
        buf = (raw * (n // len(raw) + 1))[:n]
        gray = np.frombuffer(buf, np.uint8).astype(np.int64).reshape(-1, 3).sum(axis=1)
        total = int(gray.sum())
        ph = 0
        for p, g in enumerate(gray.tolist()):
            if g * 64 > total:
                ph |= 1 << p
        out[doc_id] = ph
    return out


def test_image_phash_matches_pure_python_recompute(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    want = _expected_hashes(docs)
    got = {
        r["asset_id"]: (r["phash_hi"] << 32) | r["phash_lo"]
        for r in image_phash(spark, sf_dir).collect()
    }
    assert got == want
    # corrupt assets excluded, and the fixture actually exercises that
    assert any(d % 50 == CORRUPT_MOD for d, _ in docs)
    assert all(a % 50 != CORRUPT_MOD for a in got)
    # halves are unsigned 32-bit values (the oracle pack contract)
    for r in image_phash(spark, sf_dir).collect():
        assert 0 <= r["phash_lo"] < 1 << 32
        assert 0 <= r["phash_hi"] < 1 << 32


def test_phash_banded_join_is_complete_within_radius(spark, sf_dir):
    """Banding completeness: the banded-join output equals the brute-force
    all-pairs hamming ≤ 3 set — no recall loss (pigeonhole: 4 blocks, any
    pair differing in ≤ 3 bits shares an identical 16-bit block)."""
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    hashes = _expected_hashes(docs)
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= PHASH_HAM_MAX:
                want[(a, b)] = ham
    got = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in phash_image_near_dup(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture must exercise at least one near-dup image pair"
    for (a, b), ham in got.items():
        assert a < b and 0 <= ham <= PHASH_HAM_MAX


def _expected_audio_fps(docs) -> dict[int, int]:
    """Unscaled recompute: engine energy = 65536·Σ(byte−128)² per frame;
    the 65536 factor cancels in the mean compare, so bits from unscaled
    (byte−128)² must equal the engine's PCM-sample energies bit-for-bit."""
    out: dict[int, int] = {}
    for doc_id, text in docs:
        if doc_id % 50 == CORRUPT_MOD:
            continue  # torn RIFF header — decode fails, no fingerprint
        raw = text.encode("utf-8") or b"\x00"
        buf = (raw * (WAV_SAMPLES // len(raw) + 1))[:WAV_SAMPLES]
        d = np.frombuffer(buf, np.uint8).astype(np.int64) - 128
        energy = (d * d).reshape(64, -1).sum(axis=1)
        total = int(energy.sum())
        fp = 0
        for p, e in enumerate(energy.tolist()):
            if e * 64 > total:
                fp |= 1 << p
        out[doc_id] = fp
    return out


def test_audio_fingerprint_matches_unscaled_recompute(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    want = _expected_audio_fps(docs)
    got = {
        r["asset_id"]: (r["fp_hi"] << 32) | r["fp_lo"]
        for r in audio_fingerprint(spark, sf_dir).collect()
    }
    assert got == want
    assert all(a % 50 != CORRUPT_MOD for a in got)


def test_audio_banded_join_is_complete_within_radius(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    fps = _expected_audio_fps(docs)
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= PHASH_HAM_MAX:
                want[(a, b)] = ham
    got = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in audio_fingerprint_near_dup(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture must exercise at least one near-dup audio pair"
