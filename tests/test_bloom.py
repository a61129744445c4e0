"""Bloom-filter digest prefilter (operators/dedup.py): the 100 TB warm-up
membership pattern — per-partition bitsets OR-merged on the driver, probed
with vectorized numpy, hash lanes derived JVM-side.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators.dedup import (
    _bloom_build,
    _bloom_params,
    _with_hash_lanes,
    bloom_digest_prefilter,
    with_digest,
)
from pulsar_topic_deduplicator_spark.operators.lineage import WARMUP_CUTOFF
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_bloom_params_standard_sizing():
    m, k = _bloom_params(1000, 0.01)
    # canonical 1% sizing: ~9.6 bits/item, ~7 probes
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    assert m % 64 == 0
    # degenerate empty set must still produce a valid filter
    m0, k0 = _bloom_params(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_bloom_contract_on_driver_corpus(spark, sf_dir):
    row = bloom_digest_prefilter(spark, sf_dir).collect()[0]
    assert row["no_false_negatives"]  # a Bloom filter can never miss
    assert row["fp_rate_ok"]
    assert 0 < row["n_warmup_hits"] < row["n_messages"]


def test_bloom_per_row_no_false_negative_and_fp_bound(spark, sf_dir):
    """Probe the filter row-by-row against exact membership: every member
    hits; false positives stay near the configured fpp."""
    import numpy as np

    warm = (
        with_digest(load_table(spark, sf_dir, "events"))
        .filter(F.col("ts") < F.lit(WARMUP_CUTOFF).cast("timestamp"))
        .select("digest")
        .distinct()
    )
    n = warm.count()
    fpp = 0.01
    m, k = _bloom_params(n, fpp)
    bits = np.frombuffer(_bloom_build(warm, m, k), dtype=np.uint8)

    lanes = (
        _with_hash_lanes(
            with_digest(load_table(spark, sf_dir, "events")).select("digest")
        )
        .select("digest", "h1", "h2")
        .collect()
    )
    members = {r["digest"] for r in warm.collect()}
    fp = tn = 0
    for r in lanes:
        pos = (r["h1"] + np.arange(k) * r["h2"]) % m
        hit = bool(((bits[pos >> 3] >> (pos & 7)) & 1).all())
        if r["digest"] in members:
            assert hit, "false negative — impossible for a correct Bloom"
        else:
            tn += 1
            fp += hit
    assert tn > 0
    # generous bound: observed fp rate within 5x configured (sizing holds)
    assert fp / tn <= 5 * fpp, (fp, tn)


def test_bloom_filter_size_independent_of_partitions(spark, sf_dir):
    """The collected build output is one m/8-byte row per non-empty
    partition — nothing proportional to row count crosses the driver."""
    warm = (
        with_digest(load_table(spark, sf_dir, "events"))
        .filter(F.col("ts") < F.lit(WARMUP_CUTOFF).cast("timestamp"))
        .select("digest")
        .distinct()
    )
    n = warm.count()
    m, k = _bloom_params(n, 0.01)
    assert len(_bloom_build(warm, m, k)) == m // 8
    assert len(_bloom_build(warm.repartition(8), m, k)) == m // 8


def test_cms_sketch_properties(spark, sf_dir):
    """CMS invariants: every lane's cells sum to the event count (each
    event increments exactly one slot per lane), and no per-user estimate
    undercounts (min-over-lanes can only collide upward)."""
    from pulsar_topic_deduplicator_spark.operators.dedup import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_sketch,
        cms_user_counts,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    sketch = cms_sketch(spark, sf_dir).collect()
    assert {r["depth"] for r in sketch} == set(range(CMS_DEPTH))
    for d in range(CMS_DEPTH):
        lane = [r for r in sketch if r["depth"] == d]
        assert sum(r["n"] for r in lane) == n_events
        assert all(0 <= r["slot"] < CMS_WIDTH for r in lane)

    counts = cms_user_counts(spark, sf_dir).collect()
    assert counts and all(r["no_undercount"] for r in counts)
    assert all(r["overshoot"] >= 0 for r in counts)
    # estimates reproduce truth exactly when the user's lanes are
    # collision-free somewhere; globally the total overshoot stays small
    # relative to n (e·n/width bound per colliding lane)
    assert sum(r["overshoot"] for r in counts) < n_events


def test_kmv_estimates_within_4_sigma(spark, sf_dir):
    """KMV accuracy: for full sketches the estimate must land within
    4/sqrt(k-2) of the exact count (the estimator's rsd); short groups
    (n < k) must report exactly. Determinism: identical on re-run."""
    from pulsar_topic_deduplicator_spark.operators.dedup import (
        KMV_K,
        kmv_distinct_by_type,
    )

    rows = kmv_distinct_by_type(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} >= {"__union__"}
    rsd = (KMV_K - 2) ** -0.5
    for r in rows:
        if r["n_kept"] < KMV_K:
            assert r["kmv_estimate"] == float(r["n_exact"] if r["n_kept"] == r["n_exact"] else r["n_kept"])
        else:
            assert abs(r["kmv_estimate"] / r["n_exact"] - 1) < 4 * rsd, r
    again = kmv_distinct_by_type(spark, sf_dir).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
