"""Pure-python codecs for uncompressed media wire formats.

The container has no PIL/ffmpeg/torchaudio, but two real formats need none
of them: PPM (P6) images and WAV (RIFF/PCM16) audio are plain headers over
raw sample bytes. Implementing them upgrades the multimodal tier's decode
stages from deterministic fakes to REAL format parsing — header validation,
dimension extraction, chunk walking — with the same failure modes a 100 TB
ingest sees (truncated files, bad magic, short data chunks). Compressed
formats (JPEG/MP4/FLAC) stay stubbed behind the import gates in
``operators/multimodal.py``.

Encoders are included so tests and the synthetic asset generators can
round-trip: encode → binary column → decode is exactly an ingest pipeline's
shape.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Malformed payload — the per-asset failure a decode stage must survive
    (surfaced as an error row, never a task failure)."""


# ─── PPM (P6) ───────────────────────────────────────────────────────────────


def encode_ppm_p6(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM (P6, maxval 255)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise CodecError(f"need (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _parse_ppm_at(buf: bytes, pos: int) -> tuple[int, int, np.ndarray, int]:
    """Parse one P6 frame starting at ``pos``; also return the offset one
    past its pixel data (so consecutive frames can be walked — the raw-PPM
    video stream format, e.g. ffmpeg's ``image2pipe`` ppm pipe)."""
    if buf[pos : pos + 2] != b"P6":
        raise CodecError("not a P6 PPM (bad magic)")
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":  # comment line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and buf[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise CodecError("truncated PPM header")
        fields.append(int(buf[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise CodecError(f"unsupported maxval {maxval}")
    pos += 1  # single whitespace after maxval
    data = buf[pos : pos + w * h * 3]
    if len(data) != w * h * 3:
        raise CodecError(f"short pixel data: {len(data)} != {w * h * 3}")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return w, h, arr, pos + w * h * 3


def decode_ppm_p6(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) -> (width, height, (h, w, 3) uint8 array).

    Real header parsing: magic, whitespace/comment-tolerant ints, maxval
    check, exact payload length check."""
    w, h, arr, _end = _parse_ppm_at(buf, 0)
    return w, h, arr


def decode_ppm_stream(buf: bytes) -> list[tuple[int, int, np.ndarray]]:
    """Concatenated-P6 raw video stream -> list of (w, h, frame) in
    temporal order. This is a real wire format — ffmpeg's
    ``-f image2pipe -vcodec ppm`` emits exactly back-to-back P6 frames.
    A torn tail (mid-header or short pixel data) raises: a truncated
    video cannot be partially trusted frame-by-frame, the caller decides
    whether to salvage."""
    frames: list[tuple[int, int, np.ndarray]] = []
    pos = 0
    while pos < len(buf):
        w, h, arr, pos = _parse_ppm_at(buf, pos)
        frames.append((w, h, arr))
    if not frames:
        raise CodecError("empty PPM stream")
    return frames


# ─── WAV (RIFF / PCM16 mono or interleaved) ─────────────────────────────────


def encode_wav_pcm16(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """int16 sample array -> RIFF/WAVE with a PCM fmt chunk."""
    if samples.dtype != np.int16:
        raise CodecError(f"need int16 samples, got {samples.dtype}")
    data = samples.tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm16(buf: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, channels, int16 sample array).

    Real chunk walking: RIFF magic, WAVE form type, fmt before data,
    PCM-format check, declared-size vs actual-size validation."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16 or len(body) < 16:
                raise CodecError("short fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or bits != 16:
                raise CodecError(f"not PCM16 (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise CodecError("data chunk before fmt chunk")
            if len(body) != size:
                raise CodecError(f"short data chunk: {len(body)} != {size}")
            if size % 2:
                raise CodecError(f"odd data chunk size {size} for 16-bit PCM")
            return rate, channels, np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise CodecError("no data chunk")
