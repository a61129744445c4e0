"""Layout-analytics invariants: the zone-map prune counts and Z-order span
bounds that make the numbers trustworthy (oracle parity itself is covered by
test_oracle_parity.py once the entries are registered)."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators import layoutstats
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_zonemap_sorted_layout_dominates(spark, sf_dir):
    rows = {
        r["layout"]: r
        for r in layoutstats.zonemap_prune_stats(spark, sf_dir).collect()
    }
    assert set(rows) == {"hash", "natural", "shipdate_sorted"}
    total = load_table(spark, sf_dir, "lineitem").count()
    for r in rows.values():
        # conservation: every row is either skipped or scanned
        assert r["rows_skipped"] + r["rows_scanned"] == total
        assert r["n_buckets"] == layoutstats.N_BUCKETS
    srt, hsh = rows["shipdate_sorted"], rows["hash"]
    # the sorted layout must skip at least 3/4 of the buckets for the ~7 %
    # predicate; random layouts skip (essentially) none
    assert srt["n_pruned"] >= (3 * layoutstats.N_BUCKETS) // 4
    assert hsh["n_pruned"] <= 4
    assert srt["rows_skipped"] > hsh["rows_skipped"]
    # clustering also shrinks the false-scan residual by an order of
    # magnitude: surviving sorted buckets are mostly matches
    assert srt["false_scan_rows"] * 10 < hsh["false_scan_rows"]


def test_zorder_buckets_bounded_in_both_dims(spark, sf_dir):
    rows = {
        r["layout"]: r
        for r in layoutstats.zorder_bucket_spans(spark, sf_dir).collect()
    }
    z, x = rows["zorder"], rows["xsort"]
    cell = (1 << (layoutstats.Q_BITS - layoutstats.Z_CELL_BITS)) - 1  # 15
    # a Z bucket is one 16x16 grid cell: both quantized spans fit the cell
    assert z["max_x_span"] <= cell and z["max_y_span"] <= cell
    # an xsort bucket is a single qx value (span 0) but unbounded in y
    assert x["max_x_span"] == 0
    assert x["max_y_span"] > cell
    # the 2-D predicate prunes a strict superset of rows under Z-order
    assert z["rows_skipped"] >= x["rows_skipped"]
    assert z["n_buckets"] <= 1 << (2 * layoutstats.Z_CELL_BITS)
