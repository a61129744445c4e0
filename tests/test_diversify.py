"""MMR diversified selection: the greedy order must diverge from pure
relevance order when near-duplicates crowd the top, ties must break on
the smaller vec_id, and an exact duplicate of a picked item must carry a
zero diversity term — all hand-computed in integer micro-unit space, and
cross-checked against the DuckDB oracle on the same fixture."""

from __future__ import annotations

import duckdb
import pytest

from pulsar_topic_deduplicator_spark.operators.diversify import (
    ORACLES,
    mmr_diversify,
)

# query = vec 0 (smallest vec_id). Candidates: a tight near cluster
# (1, 2, 3 — and 6, an exact duplicate of 2) the pure top-k would sweep,
# plus two genuinely diverse directions (4, 5) farther from the query.
VECS = [
    (0, [0.0, 0.0]),
    (1, [1.0, 0.0]),
    (2, [1.01, 0.0]),
    (3, [1.02, 0.0]),
    (4, [-1.2, 0.0]),
    (5, [0.0, 1.3]),
    (6, [1.01, 0.0]),
]

# hand-walked greedy (micro-units; see module docstring for the algebra):
# pick 1 = vec 1 (most relevant); pick 2 = vec 4 (diversity beats the
# nearer 2/3); pick 3 = vec 5; pick 4 = vec 2 (ties vec 6 on score,
# smaller id wins); pick 5 = vec 6 (its min_div collapses to 0 against
# its duplicate 2, but still outscores 3); pick 6 = vec 3.
EXPECTED_ORDER = [1, 4, 5, 2, 6, 3]


@pytest.fixture(scope="module")
def mmr_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("mmr")
    spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(str(path / "embeddings.parquet"))
    return str(path)


def test_mmr_diverges_from_pure_relevance(spark, mmr_dir):
    rows = sorted(
        mmr_diversify(spark, mmr_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["vec_id"] for r in rows] == EXPECTED_ORDER
    # pure relevance would have swept the near cluster first
    assert [r["vec_id"] for r in rows][:3] != [1, 2, 3]
    # relevance distances: exact squared micro-unit distances to vec 0
    assert rows[0]["rel_dist_q"] == 1_000_000**2
    assert rows[1]["rel_dist_q"] == 1_200_000**2  # vec 4: |-1.2 - 0| in micro-units
    # rank 1 carries no diversity term by definition
    assert rows[0]["min_div_q"] == 0
    # vec 6 duplicates the already-picked vec 2: zero diversity term
    by_vec = {r["vec_id"]: r for r in rows}
    assert by_vec[6]["min_div_q"] == 0
    # monotone rank column 1..6
    assert [r["rank"] for r in rows] == list(range(1, 7))


def test_mmr_matches_oracle_on_fixture(spark, mmr_dir):
    got = sorted(tuple(r) for r in mmr_diversify(spark, mmr_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{mmr_dir}/embeddings.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES["mmr_diversify"]).fetchall())
    assert got == want


def test_mmr_pool_plan_shape(spark, sf_dir):
    """The corpus-touching stage must be a broadcast relevance join into a
    TakeOrdered pool cut — never a global sort, never more than the one
    relevance-aggregate exchange; the pairs stage stays KB-sized."""
    from pulsar_topic_deduplicator_spark.operators.diversify import _pool_plan
    from pulsar_topic_deduplicator_spark.plans import (
        count_exchanges,
        formatted_plan,
        has_broadcast_join,
    )

    pool, pairs = _pool_plan(spark, sf_dir)
    plan = formatted_plan(pool)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Sort " not in plan, plan[:2000]  # no global sort anywhere
    assert has_broadcast_join(pool), plan[:2000]
    # exchanges: the per-vec relevance aggregate, plus — inside the cached
    # quantize plan — the 64-row per-dim mins aggregate and its broadcast;
    # nothing corpus-sized beyond the one relevance shuffle
    assert count_exchanges(pool) <= 3, plan[:2000]
    # the pairwise stage joins the pool against itself on dim — a
    # broadcastable KB-sized frame on at least one side
    assert has_broadcast_join(pairs), formatted_plan(pairs)[:2000]


# per-label variant: label 0 has a near-duplicate pair (0, 1) among more
# diverse options; label 1 has only two members (pool shortfall)
LABEL_VECS = [
    (0, [0.0, 0.0], 0),
    (1, [0.01, 0.0], 0),
    (2, [2.0, 0.0], 0),
    (3, [0.0, 2.0], 0),
    (4, [1.0, 1.0], 0),
    (5, [5.0, 5.0], 1),
    (6, [5.0, 6.0], 1),
]


@pytest.fixture(scope="module")
def mmr_label_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("mmrlab")
    spark.createDataFrame(
        LABEL_VECS, "vec_id long, embedding array<double>, label int"
    ).write.mode("overwrite").parquet(str(path / "embeddings.parquet"))
    return str(path)


def test_mmr_per_label_structure_and_diversity(spark, mmr_label_dir):
    from pulsar_topic_deduplicator_spark.operators.diversify import (
        mmr_per_label,
    )

    rows = mmr_per_label(spark, mmr_label_dir).collect()
    by_label: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["label"], r["rank"])):
        by_label.setdefault(r["label"], []).append(r)
    # label 0 fills MMR_G_K picks; label 1 exhausts its 2 members
    assert [r["rank"] for r in by_label[0]] == [1, 2, 3, 4]
    assert [r["rank"] for r in by_label[1]] == [1, 2]
    # rank 1 carries no diversity term; later ranks always do (no exact
    # duplicates in this fixture)
    for picks in by_label.values():
        assert picks[0]["min_div_q"] == 0
        assert all(p["min_div_q"] > 0 for p in picks[1:])
    # diversity: the near-duplicate pair (0, 1) is never two of the top-3
    top3 = {p["vec_id"] for p in by_label[0][:3]}
    assert not {0, 1} <= top3


def test_mmr_per_label_matches_oracle_on_fixture(spark, mmr_label_dir):
    from pulsar_topic_deduplicator_spark.operators.diversify import (
        mmr_per_label,
    )

    got = sorted(
        tuple(r) for r in mmr_per_label(spark, mmr_label_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{mmr_label_dir}/embeddings.parquet/*.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(ORACLES["mmr_per_label"]).fetchall()
    )
    assert got == want
