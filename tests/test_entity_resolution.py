"""Entity resolution: blocking boundaries, edit-distance threshold,
transitive cluster merge, survivorship rule, and exact cent totals — on a
hand-built customer dimension where every expected value is derivable by
eye."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.operators.entity import (
    ENTITY_EDIT_MAX,
    entity_golden_records,
    entity_match_pairs,
)

# (custkey, name, nationkey, acctbal, mktsegment)
CUSTOMERS = [
    # block (1, 'A'): a 3-record chain — smith ~1~ smyth ~1~ smyt_ but
    # smith vs smytt is distance 2: only CC makes them one entity
    (10, "alice smith", 1, 100.25, "A"),
    (11, "alice smyth", 1, 300.75, "A"),
    (12, "alice smytt", 1, 200.00, "A"),
    # same block: distance 2 from everything above the threshold
    (13, "alice brown", 1, 50.00, "A"),
    # identical name to custkey 10 but a DIFFERENT block: blocking must
    # prevent the pair entirely
    (14, "alice smith", 2, 999.99, "A"),
    (15, "alice smith", 1, 10.10, "B"),
    # block (3, 'C'): an exact-duplicate pair (distance 0); rep must be
    # the higher balance, and on a balance tie the lower custkey
    (20, "bob jones", 3, 70.00, "C"),
    (21, "bob jones", 3, 70.00, "C"),
    # unmatched singleton: must not appear in golden records at all
    (30, "carol white", 4, 500.00, "D"),
]


@pytest.fixture(scope="module")
def entity_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("entity")
    spark.createDataFrame(
        CUSTOMERS,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(path / "customer.parquet"))
    return str(path)


def test_match_pairs_block_and_threshold(spark, entity_dir):
    assert ENTITY_EDIT_MAX == 1  # expectations below encode this
    pairs = {
        (r["custkey_a"], r["custkey_b"]): r["edit_dist"]
        for r in entity_match_pairs(spark, entity_dir).collect()
    }
    # chain links at distance 1, exact pair at distance 0 — and nothing
    # across blocks (10 vs 14/15) or past the threshold (13, 10 vs 12)
    assert pairs == {(10, 11): 1, (11, 12): 1, (20, 21): 0}


def test_golden_records_transitive_merge_and_survivorship(spark, entity_dir):
    rows = {
        r["entity_id"]: r
        for r in entity_golden_records(spark, entity_dir).collect()
    }
    assert set(rows) == {10, 20}
    chain = rows[10]
    # 10-11-12 merged transitively even though 10 vs 12 is distance 2
    assert chain["n_records"] == 3
    assert chain["total_bal_cents"] == 10025 + 30075 + 20000
    # survivorship: highest balance wins
    assert chain["rep_custkey"] == 11
    assert chain["rep_name"] == "alice smyth"
    dup = rows[20]
    assert dup["n_records"] == 2
    assert dup["total_bal_cents"] == 7000 + 7000
    # balance tie → lower custkey
    assert dup["rep_custkey"] == 20


def test_no_cartesian_blocked_join(spark, entity_dir):
    from pulsar_topic_deduplicator_spark.plans import formatted_plan

    plan = formatted_plan(entity_match_pairs(spark, entity_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_search_finds_every_digit_neighbor(spark, sf_dir):
    """Engine-side completeness of the deletion index: the SymSpell path
    must return exactly the brute-force levenshtein<=1 matches (the
    DuckDB oracle re-proves this cross-engine; this pins it within
    Spark), and the fixture is non-trivial (every query has digit-edit
    neighbors beyond itself)."""
    from pulsar_topic_deduplicator_spark.operators.entity import (
        fuzzy_name_search,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    got = {
        (r["query_name"], r["match_name"])
        for r in fuzzy_name_search(spark, sf_dir).collect()
    }
    names = [
        r["c_name"]
        for r in load_table(spark, sf_dir, "customer").select("c_name").collect()
    ]
    queries = sorted(names)[:5]

    def lev1(a, b):
        if a == b:
            return True
        if abs(len(a) - len(b)) > 1:
            return False
        # distance exactly 1 check via single edit scan
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        s, t = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(t)):
            if t[:i] + t[i + 1:] == s:
                return True
        return False

    brute = {(q, n) for q in queries for n in names if lev1(q, n)}
    assert got == brute
    for q in queries:
        assert sum(1 for g in got if g[0] == q) > 1, q
