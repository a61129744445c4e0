"""Property-based fuzz for the real media codecs (functions/codecs.py).

The decode stages' 100 TB contract is: any byte string either decodes or
raises CodecError — never any other exception, because anything else
escapes the per-asset error-row handling in operators/multimodal.py and
kills a task (then a stage). Hypothesis drives that contract directly:
round-trips over arbitrary valid inputs, and arbitrary/truncated garbage
never raising anything but CodecError.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_topic_deduplicator_spark.functions.codecs import (
    CodecError,
    decode_ppm_p6,
    decode_wav_pcm16,
    encode_ppm_p6,
    encode_wav_pcm16,
)

pixels_st = st.tuples(
    st.integers(min_value=1, max_value=12),  # h
    st.integers(min_value=1, max_value=12),  # w
    st.integers(min_value=0, max_value=2**32 - 1),  # seed
)


@settings(max_examples=50, deadline=None)
@given(pixels_st)
def test_ppm_round_trip_any_dims(params):
    h, w, seed = params
    rng = np.random.RandomState(seed % (2**31))
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    got_w, got_h, back = decode_ppm_p6(encode_ppm_p6(arr))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(back, arr)


@settings(max_examples=100, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=0, max_value=2**31 - 1),
        st.floats(min_value=0.0, max_value=1.0),
    )
)
def test_ppm_truncation_never_escapes_codecerror(params):
    h, w, seed, frac = params
    rng = np.random.RandomState(seed)
    buf = encode_ppm_p6(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
    cut = buf[: int(len(buf) * frac)]
    try:
        got_w, got_h, arr = decode_ppm_p6(cut)
        # only a full buffer can decode successfully
        assert cut == buf and (got_w, got_h) == (w, h)
    except CodecError:
        pass  # the only legal failure mode


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=256))
def test_ppm_arbitrary_bytes_never_escape_codecerror(buf):
    try:
        decode_ppm_p6(buf)
    except CodecError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=0, max_value=512),  # n samples
        st.sampled_from([8000, 16000, 44100]),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
)
def test_wav_round_trip(params):
    n, rate, seed = params
    rng = np.random.RandomState(seed)
    samples = rng.randint(-(2**15), 2**15, size=n).astype(np.int16)
    got_rate, got_ch, back = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
    assert got_rate == rate and got_ch == 1
    assert np.array_equal(back, samples)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=256))
def test_wav_arbitrary_bytes_never_escape_codecerror(buf):
    try:
        decode_wav_pcm16(buf)
    except CodecError:
        pass


@settings(max_examples=100, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=128),
        st.floats(min_value=0.0, max_value=1.0),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
)
def test_wav_truncation_never_escapes_codecerror(params):
    n, frac, seed = params
    rng = np.random.RandomState(seed)
    buf = encode_wav_pcm16(
        rng.randint(-(2**15), 2**15, size=n).astype(np.int16), 8000
    )
    cut = buf[: int(len(buf) * frac)]
    try:
        decode_wav_pcm16(cut)
    except CodecError:
        pass


def test_encoders_reject_wrong_dtypes():
    with pytest.raises(CodecError):
        encode_ppm_p6(np.zeros((2, 2, 3), dtype=np.int32))
    with pytest.raises(CodecError):
        encode_wav_pcm16(np.zeros(4, dtype=np.float64), 8000)


@settings(max_examples=100, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=0, max_value=10_000_000),
        st.floats(min_value=1e-6, max_value=0.5),
    )
)
def test_bloom_params_always_valid(params):
    from pulsar_topic_deduplicator_spark.operators.dedup import _bloom_params

    n, fpp = params
    m, k = _bloom_params(n, fpp)
    assert m >= 64 and m % 64 == 0
    assert k >= 1
