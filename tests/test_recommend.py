"""Item-item CF: the Jaccard ranking must diverge from raw shared-count
ranking (a big-audience item with more shared customers ranks below a
tight-audience twin), the power-customer fanout cap must exclude its
baskets from the model, and the fixture must match the DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from pulsar_topic_deduplicator_spark.operators.recommend import (
    CF_MAX_FANOUT,
    ORACLES,
    cf_similar_suppliers,
)

# s1 {c1,c2,c3}; s2 {c1,c2,c4} → shared 2, jacc 2/4 = 0.5
# s3 {c1,c2,c3} + 7 fillers (deg 10) → shared 3, jacc 3/10 = 0.3:
# more shared customers but a WORSE Jaccard — s2 must outrank s3.
# c99 buys from s1, s2 and 49 one-off suppliers (fanout 51 > cap):
# excluded, so shared(s1, s2) stays 2.
PAIRS = (
    [(1, 1), (2, 1), (3, 1)]
    + [(1, 2), (2, 2), (4, 2)]
    + [(1, 3), (2, 3), (3, 3)]
    + [(10 + i, 3) for i in range(7)]
    + [(99, 1), (99, 2)]
    + [(99, 100 + i) for i in range(CF_MAX_FANOUT - 1)]
)


@pytest.fixture(scope="module")
def cf_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("cf")
    orders = [(i, c) for i, (c, _) in enumerate(PAIRS)]
    items = [(i, s) for i, (_, s) in enumerate(PAIRS)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(path / "orders.parquet"))
    spark.createDataFrame(
        items, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))
    return str(path)


def test_cf_jaccard_ranking_and_fanout_cap(spark, cf_dir):
    rows = cf_similar_suppliers(spark, cf_dir).collect()
    s1 = sorted(
        (r for r in rows if r["suppkey"] == 1), key=lambda r: r["rank"]
    )
    # Jaccard beats raw shared count: s2 (2 shared, 0.5) above s3
    # (3 shared, 0.3)
    assert [r["neighbor"] for r in s1[:2]] == [2, 3]
    assert s1[0]["shared"] == 2 and s1[0]["jacc_ppb"] == 500_000_000
    assert s1[1]["shared"] == 3 and s1[1]["jacc_ppb"] == 300_000_000
    # the power customer (fanout > CF_MAX_FANOUT) is out of the model:
    # shared(s1, s2) would otherwise be 3, and its one-off suppliers
    # would appear as neighbors
    assert all(r["neighbor"] < 100 for r in rows)
    assert all(r["suppkey"] < 100 for r in rows)


def _oph_sketch(audience: set[int]) -> set[tuple[int, int]]:
    """Python mirror of the operator's one-permutation sketch: min of the
    stable_uint60 customer hashes per hash-range bucket."""
    import hashlib

    from pulsar_topic_deduplicator_spark.operators.recommend import (
        AFF_STRIDE,
    )

    mins: dict[int, int] = {}
    for cust in audience:
        h = int(hashlib.sha256(str(cust).encode()).hexdigest()[:15], 16)
        b = h // AFF_STRIDE
        mins[b] = min(mins.get(b, h), h)
    return set(mins.items())


def test_supplier_affinity_matches_the_oph_mirror(spark, cf_dir):
    """Every output row's (n_eq, k_union, jacc_ppb_est) must equal a
    from-scratch python replay of the one-permutation sketches, and —
    the estimator's exactness clause — whenever BOTH suppliers' sketches
    are collision-free (audience ↔ sketch bijection) the estimate must
    equal the EXACT audience Jaccard in floor parts-per-billion. (No
    fanout cap in this tier: the power customer's one-off suppliers
    legitimately appear as weak neighbors.)"""
    from pulsar_topic_deduplicator_spark.operators.recommend import (
        supplier_affinity,
    )

    rows = supplier_affinity(spark, cf_dir).collect()
    assert rows, "affinity output empty on the fixture"
    audiences: dict[int, set[int]] = {}
    for cust, supp in PAIRS:
        audiences.setdefault(supp, set()).add(cust)
    sketches = {s: _oph_sketch(a) for s, a in audiences.items()}
    exact_checked = 0
    for r in rows:
        sa, sb = sketches[r["suppkey"]], sketches[r["neighbor"]]
        n_eq, k_union = len(sa & sb), len(sa | sb)
        assert (r["n_eq"], r["k_union"]) == (n_eq, k_union)
        assert r["jacc_ppb_est"] == (1_000_000_000 * n_eq) // k_union
        a, b = audiences[r["suppkey"]], audiences[r["neighbor"]]
        if len(sa) == len(a) and len(sb) == len(b):  # bijective sketches
            inter, union = len(a & b), len(a | b)
            assert r["jacc_ppb_est"] == (1_000_000_000 * inter) // union
            exact_checked += 1
    assert exact_checked > 0, "fixture never exercised the exactness clause"


def test_supplier_affinity_matches_oracle_on_fixture(spark, cf_dir):
    from pulsar_topic_deduplicator_spark.operators.recommend import (
        supplier_affinity,
    )

    got = sorted(tuple(r) for r in supplier_affinity(spark, cf_dir).collect())
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{cf_dir}/{t}.parquet/*.parquet'"
        )
    want = sorted(
        tuple(r)
        for r in con.execute(ORACLES["supplier_affinity"]).fetchall()
    )
    assert got == want


def test_cf_matches_oracle_on_fixture(spark, cf_dir):
    got = sorted(
        tuple(r) for r in cf_similar_suppliers(spark, cf_dir).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{cf_dir}/{t}.parquet/*.parquet'"
        )
    want = sorted(
        tuple(r)
        for r in con.execute(ORACLES["cf_similar_suppliers"]).fetchall()
    )
    assert got == want
