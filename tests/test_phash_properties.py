"""Property-based checks of the media-fingerprint core (`_ahash_pack`)
and its banding, driven over random inputs rather than the corpus:

* the aHash is invariant under uniform additive brightness shifts and
  under any positive integer scale — the perceptual-robustness claims
  aHash rests on, which hold EXACTLY here because the mean compare is
  integer (v·64 > Σv), never a float division;
* an all-equal input hashes to 0 and no input can set all 64 bits
  (some unit is always ≤ the mean);
* the 4 × 16-bit pigeonhole: ANY two 64-bit hashes within hamming ≤ 3
  share at least one block — the banded equi-join's full-recall claim
  for arbitrary fingerprints, not just the corpus's;
* the unsigned-halves pack round-trips.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_topic_deduplicator_spark.operators.multimodal import (
    PHASH_BANDS,
    PHASH_HAM_MAX,
    _ahash_pack,
)

units = st.lists(
    st.integers(min_value=0, max_value=765), min_size=64, max_size=64
)


@settings(max_examples=200, deadline=None)
@given(units, st.integers(min_value=0, max_value=10_000))
def test_ahash_invariant_under_brightness_shift(vals, c):
    assert _ahash_pack([v + c for v in vals]) == _ahash_pack(vals)


@settings(max_examples=200, deadline=None)
@given(units, st.integers(min_value=1, max_value=100_000))
def test_ahash_invariant_under_positive_scale(vals, k):
    assert _ahash_pack([v * k for v in vals]) == _ahash_pack(vals)


@settings(max_examples=100, deadline=None)
@given(units)
def test_ahash_never_sets_all_bits_and_bits_match_definition(vals):
    ph = _ahash_pack(vals)
    assert 0 <= ph < 1 << 64
    assert ph != (1 << 64) - 1  # some unit is always ≤ the mean
    total = sum(vals)
    for p, v in enumerate(vals):
        assert bool(ph >> p & 1) == (v * 64 > total)


def test_ahash_all_equal_input_hashes_to_zero():
    assert _ahash_pack([7] * 64) == 0
    assert _ahash_pack([0] * 64) == 0


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=PHASH_HAM_MAX),
)
def test_pigeonhole_banding_is_complete_within_radius(sig, flips):
    """Flip ≤ 3 bits of ANY 64-bit hash: the pair must share one of the
    4 16-bit blocks (bands-1 flips cannot touch all bands)."""
    other = sig
    for p in flips:
        other ^= 1 << p
    width = 64 // PHASH_BANDS
    mask = (1 << width) - 1
    shared = any(
        (sig >> (i * width)) & mask == (other >> (i * width)) & mask
        for i in range(PHASH_BANDS)
    )
    assert shared


@settings(max_examples=200, deadline=None)
@given(units)
def test_halves_pack_round_trips(vals):
    ph = _ahash_pack(vals)
    lo, hi = ph & 0xFFFFFFFF, ph >> 32
    assert 0 <= lo < 1 << 32 and 0 <= hi < 1 << 32
    assert (hi << 32) | lo == ph
