"""Table profiler: completeness / distinctness / range values on a
hand-built orders table with injected nulls and known extremes."""

from __future__ import annotations

from datetime import datetime

import pytest

from pulsar_topic_deduplicator_spark.operators.lineage import profile_orders

ROWS = [
    # (orderkey, custkey, status, totalprice, orderdate, priority)
    (1, 7, "F", 10.00, datetime(2024, 1, 1), "1-URGENT"),
    (2, 7, "O", 99.99, datetime(2024, 6, 1), "5-LOW"),
    (3, None, "F", 0.01, datetime(2023, 12, 31), None),
    (4, 9, None, 10.00, datetime(2024, 1, 1), "1-URGENT"),
]


@pytest.fixture(scope="module")
def prof_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("prof")
    spark.createDataFrame(
        ROWS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(path / "orders.parquet"))
    return str(path)


def test_profile_counts_nulls_distincts_and_ranges(spark, prof_dir):
    prof = {
        r["col_name"]: r for r in profile_orders(spark, prof_dir).collect()
    }
    assert set(prof) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice_cents",
        "o_orderdate_us",
        "o_orderpriority",
    }
    assert all(r["n_rows"] == 4 for r in prof.values())
    ck = prof["o_custkey"]
    # null excluded from distinct count, counted as missing
    assert (ck["n_nulls"], ck["n_distinct"]) == (1, 2)
    assert (ck["min_s"], ck["max_s"]) == ("7", "9")
    st = prof["o_orderstatus"]
    assert (st["n_nulls"], st["n_distinct"]) == (1, 2)
    tp = prof["o_totalprice_cents"]
    # exact cents normalization: 0.01 → 1, 99.99 → 9999; 10.00 repeats
    assert (tp["n_nulls"], tp["n_distinct"]) == (0, 3)
    assert (tp["min_s"], tp["max_s"]) == ("1", "9999")
    pr = prof["o_orderpriority"]
    assert (pr["min_s"], pr["max_s"]) == ("1-URGENT", "5-LOW")
    od = prof["o_orderdate_us"]
    # epoch micros stringified: 2023-12-31T00:00:00Z = 1703980800 s
    assert od["min_s"] == str(1703980800 * 1_000_000)


def test_fk_discovery_confirms_and_rejects(spark, sf_dir):
    """The discovery report must CONFIRM every true TPC-H foreign key and
    REJECT the deliberate non-key pair (orders->customer key domains only
    overlap at the low end)."""
    from pulsar_topic_deduplicator_spark.operators.lineage import (
        fk_discovery_report,
    )

    rows = {r["child"]: r for r in fk_discovery_report(spark, sf_dir).collect()}
    for child in (
        "lineitem.l_orderkey",
        "orders.o_custkey",
        "lineitem.l_partkey",
        "lineitem.l_suppkey",
        "events.user_id",
    ):
        r = rows[child]
        assert r["is_fk_candidate"], child
        assert r["containment_ppm"] == 1_000_000, child
        assert r["n_contained"] == r["n_child_distinct"], child
    neg = rows["orders.o_orderkey"]
    assert not neg["is_fk_candidate"]
    assert neg["containment_ppm"] < 200_000
