"""Property-based checks of the round-10 estimator invariants, driven over
random inputs rather than the corpus (the second-wave-properties pattern):

* the one-permutation-hashing sketch Jaccard (supplier_affinity) is
  symmetric, bounded in [0, 1], EXACT whenever both audiences map
  bijectively into buckets, and never overestimates the number of shared
  customers by more than the bucket-collision deficit allows;
* the two-stage prefix-sum decomposition (shard_plan_tokens) equals the
  naive running total for ANY bucket width, and the next-fit shard cut is
  monotone with offsets strictly below capacity;
* reciprocal-rank fusion (hybrid_search_rrf) in floor parts-per-billion is
  order-equivalent to the real-valued RRF whenever the real scores differ
  by more than the 2-retriever floor error bound (2/1e9 of slack).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_topic_deduplicator_spark.operators.recommend import (
    AFF_STRIDE,
    CF_PPB,
)
from pulsar_topic_deduplicator_spark.operators.retrieval import RRF_K, RRF_SCALE


def _h60(x: int) -> int:
    return int(hashlib.sha256(str(x).encode()).hexdigest()[:15], 16)


def _sketch(aud: frozenset[int]) -> set[tuple[int, int]]:
    mins: dict[int, int] = {}
    for c in aud:
        h = _h60(c)
        b = h // AFF_STRIDE
        mins[b] = min(mins.get(b, h), h)
    return set(mins.items())


audiences = st.frozensets(st.integers(min_value=0, max_value=5000), min_size=1, max_size=120)


@settings(max_examples=200, deadline=None)
@given(audiences, audiences)
def test_oph_sketch_jaccard_invariants(a, b):
    sa, sb = _sketch(a), _sketch(b)
    n_eq, k_union = len(sa & sb), len(sa | sb)
    ppb = (CF_PPB * n_eq) // k_union
    ppb_rev = (CF_PPB * len(sb & sa)) // len(sb | sa)
    assert ppb == ppb_rev  # symmetric
    assert 0 <= ppb <= CF_PPB  # a Jaccard
    # identical audiences → exactly 1.0 regardless of collisions
    if a == b:
        assert ppb == CF_PPB
    # bijective sketches → exact audience Jaccard (the operator's clause)
    if len(sa) == len(a) and len(sb) == len(b):
        inter, union = len(a & b), len(a | b)
        assert n_eq == inter and k_union == union
    # a coinciding (bucket, min) is always a genuinely shared customer
    # (min-collisions can only UNDER-report sharing, never invent it)
    assert n_eq <= len(a & b)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=4096),
)
def test_two_stage_prefix_sum_equals_naive_cumsum(tokens, width, capacity):
    """Python model of shard_plan_tokens' decomposition: per-bucket sums →
    exclusive bucket offsets → within-bucket running sums must reproduce
    the naive global cumsum for ANY bucket width; the next-fit cut is then
    monotone with in-shard offsets < capacity by construction."""
    docs = list(enumerate(tokens))  # doc_id = position
    # stage 1+2: bucket sums and exclusive offsets
    bsum: dict[int, int] = {}
    for d, t in docs:
        bsum[d // width] = bsum.get(d // width, 0) + t
    boff, run = {}, 0
    for bkt in sorted(bsum):
        boff[bkt] = run
        run += bsum[bkt]
    # stage 3: within-bucket running sums
    starts = {}
    within: dict[int, int] = {}
    for d, t in docs:  # doc_id order
        bkt = d // width
        starts[d] = boff[bkt] + within.get(bkt, 0)
        within[bkt] = within.get(bkt, 0) + t
    # naive comparator
    naive, run = {}, 0
    for d, t in docs:
        naive[d] = run
        run += t
    assert starts == naive
    prev_shard = 0
    for d, t in docs:
        shard, off = starts[d] // capacity, starts[d] % capacity
        assert off < capacity and shard >= prev_shard
        prev_shard = shard


@settings(max_examples=200, deadline=None)
@given(
    st.one_of(st.none(), st.integers(min_value=1, max_value=1000)),
    st.one_of(st.none(), st.integers(min_value=1, max_value=1000)),
    st.one_of(st.none(), st.integers(min_value=1, max_value=1000)),
    st.one_of(st.none(), st.integers(min_value=1, max_value=1000)),
)
def test_floor_rrf_orders_like_real_rrf(la, da, lb, db):
    """The integer-ppb RRF must rank candidate A above B whenever the
    REAL-valued RRF does by more than the floor-error bound (2 retrievers
    × <1 ppb floor loss each)."""
    def real(lr, dr):
        return (1 / (RRF_K + lr) if lr else 0.0) + (1 / (RRF_K + dr) if dr else 0.0)

    def ppb(lr, dr):
        return (RRF_SCALE // (RRF_K + lr) if lr else 0) + (
            RRF_SCALE // (RRF_K + dr) if dr else 0
        )

    if la is None and da is None:
        return  # not a candidate
    if lb is None and db is None:
        return
    ra, rb = real(la, da), real(lb, db)
    if abs(ra - rb) * RRF_SCALE > 2.0:
        assert (ppb(la, da) > ppb(lb, db)) == (ra > rb)
