"""Video curation tier (round 11, second wave): keyframe sampling,
content-ID catalog matching, and the cross-modal duplication overview —
pure-Python recomputes of the scene segmentation, the self-match theorem
for content-ID (image X IS video X's frame 0 by construction), and the
overview's arithmetic consistency with the pair frames it summarizes.
"""

from __future__ import annotations

import numpy as np

from pulsar_topic_deduplicator_spark.operators.multimodal import (
    CORRUPT_MOD,
    PHASH_HAM_MAX,
    PPM_H,
    PPM_W,
    SCENE_CUT_HAMMING,
    VIDEO_FRAMES,
    VIDEO_STEP,
    audio_fingerprint_near_dup,
    media_dup_overview,
    phash_image_near_dup,
    video_content_id,
    video_frame_phash,
    video_keyframes,
    video_near_dup,
)
from pulsar_topic_deduplicator_spark.sources.io import load_table


def _frame_hashes(text: str) -> list[int]:
    """Pure-Python recompute of the per-frame aHash for one asset."""
    n = PPM_W * PPM_H * 3
    raw = text.encode("utf-8") or b"\x00"
    base = (raw * (n // len(raw) + 1))[:n]
    out = []
    for k in range(VIDEO_FRAMES):
        off = (k * VIDEO_STEP) % n
        buf = base[off:] + base[:off]
        gray = (
            np.frombuffer(buf, np.uint8).astype(np.int64).reshape(-1, 3).sum(axis=1)
        )
        total = int(gray.sum())
        ph = 0
        for p, g in enumerate(gray.tolist()):
            if g * 64 > total:
                ph |= 1 << p
        out.append(ph)
    return out


def test_keyframes_match_pure_python_scene_segmentation(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    want: dict[tuple[int, int], tuple[int, int]] = {}
    for doc_id, text in docs:
        if doc_id % 50 == CORRUPT_MOD:
            continue
        hashes = _frame_hashes(text)
        scene = -1
        for k, h in enumerate(hashes):
            is_key = k == 0 or bin(h ^ hashes[k - 1]).count("1") > SCENE_CUT_HAMMING
            if is_key:
                scene += 1
                want[(doc_id, k)] = (scene, h)
    got = {
        (r["asset_id"], r["frame_idx"]): (
            r["scene_id"],
            (r["phash_hi"] << 32) | r["phash_lo"],
        )
        for r in video_keyframes(spark, sf_dir).collect()
    }
    assert got == want
    # frame 0 of every fingerprintable asset opens scene 0
    ids = {a for a, _ in got}
    assert all((a, 0) in got and got[(a, 0)][0] == 0 for a in ids)


def test_content_id_contains_every_self_match_at_hamming_zero(spark, sf_dir):
    """Video frame 0 is the UNROTATED tiled byte sequence — byte-identical
    to the image asset built from the same document — so content-ID must
    report (image X, video X, frame 0) at hamming 0 for every
    fingerprintable X."""
    rows = video_content_id(spark, sf_dir).collect()
    hits = {(r["image_asset"], r["video_asset"], r["frame_idx"]): r["hamming"] for r in rows}
    ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["doc_id"] % 50 != CORRUPT_MOD
    }
    assert ids, "fixture must have fingerprintable assets"
    for x in ids:
        assert hits.get((x, x, 0)) == 0
    # and nothing past the radius leaks through
    assert all(0 <= h <= PHASH_HAM_MAX for h in hits.values())


def test_content_id_matches_brute_force(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    frames: dict[tuple[int, int], int] = {}
    images: dict[int, int] = {}
    for doc_id, text in docs:
        if doc_id % 50 == CORRUPT_MOD:
            continue
        hs = _frame_hashes(text)
        images[doc_id] = hs[0]  # image asset = frame-0 bytes
        for k, h in enumerate(hs):
            frames[(doc_id, k)] = h
    want = {
        (i, v, k): bin(ih ^ fh).count("1")
        for i, ih in images.items()
        for (v, k), fh in frames.items()
        if bin(ih ^ fh).count("1") <= PHASH_HAM_MAX
    }
    got = {
        (r["image_asset"], r["video_asset"], r["frame_idx"]): r["hamming"]
        for r in video_content_id(spark, sf_dir).collect()
    }
    assert got == want


def test_media_dup_overview_is_consistent_with_the_pair_frames(spark, sf_dir):
    rows = {r["modality"]: r for r in media_dup_overview(spark, sf_dir).collect()}
    assert set(rows) == {"image", "audio", "video"}
    pair_frames = {
        "image": phash_image_near_dup(spark, sf_dir),
        "audio": audio_fingerprint_near_dup(spark, sf_dir),
        "video": video_near_dup(spark, sf_dir),
    }
    n_video_assets = (
        video_frame_phash(spark, sf_dir).select("asset_id").distinct().count()
    )
    for modality, row in rows.items():
        pairs = pair_frames[modality].collect()
        incident = {p["asset_a"] for p in pairs} | {p["asset_b"] for p in pairs}
        assert row["n_dup_pairs"] == len(pairs)
        assert row["n_dup_assets"] == len(incident)
        assert (
            row["dup_asset_ppb"]
            == 1_000_000_000 * row["n_dup_assets"] // row["n_assets"]
        )
    assert rows["video"]["n_assets"] == n_video_assets
    assert rows["image"]["n_assets"] == rows["audio"]["n_assets"]
