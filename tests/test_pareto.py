"""Skyline correctness from first principles at sf0.001: returned points
are pairwise non-dominated, and every excluded point is dominated by some
returned point (so the frontier is exactly right, independent of the
DuckDB oracle)."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators import pareto


def _dominates(a, b):
    return a[0] <= b[0] and a[1] <= b[1] and (a[0] < b[0] or a[1] < b[1])


def test_skyline_is_exactly_the_frontier(spark, sf_dir):
    pts = [
        (r["x"], r["y"])
        for r in pareto._points(spark, sf_dir).collect()
    ]
    sky = {
        (r["date_us"], r["price_cents"])
        for r in pareto.skyline_orders(spark, sf_dir).collect()
    }
    assert sky
    for s in sky:
        assert not any(_dominates(p, s) for p in pts), s
    for p in pts:
        if p not in sky:
            assert any(_dominates(s, p) for s in sky), p
