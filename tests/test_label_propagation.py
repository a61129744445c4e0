"""Label propagation communities: two dense bipartite blocks joined by a
single bridge edge must stay SEPARATE communities (connected components
would merge them — the LP-vs-CC distinction), with the hand-replayed
3-round synchronous labels pinned exactly, and the fixture matching the
DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from pulsar_topic_deduplicator_spark.operators.graph import (
    ORACLES,
    lp_communities,
)

# block A: customers 1-3 × suppliers 1-3 (complete bipartite); block B:
# customers 5-7 × suppliers 5-7; ONE bridge edge c7—s3. Hand replay of 3
# synchronous rounds (argmax count desc, label asc):
#   r1: sA→"c1", cA→"s1", sB→"c5", c5/c6→"s5", c7→"s3" (bridge tie)
#   r2: sA→"s1"? no — sA reads cA's r1 ("s1") → "s1"; cA reads sA's r1
#       ("c1") → "c1"; sB→"s5", cB→"c5" (density outvotes the bridge)
#   r3: the bipartite even/odd swap again — cA→"s1", sA→"c1", cB→"s5",
#       sB→"c5"; bridge endpoints c7/s3 stay with their own blocks.
EDGES = [
    (c, s) for c in (1, 2, 3) for s in (1, 2, 3)
] + [(c, s) for c in (5, 6, 7) for s in (5, 6, 7)] + [(7, 3)]

EXPECTED = {
    **{f"c{c}": "s1" for c in (1, 2, 3)},
    **{f"s{s}": "c1" for s in (1, 2, 3)},
    **{f"c{c}": "s5" for c in (5, 6, 7)},
    **{f"s{s}": "c5" for s in (5, 6, 7)},
}


@pytest.fixture(scope="module")
def lp_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("lp")
    orders = [(i, c) for i, (c, _) in enumerate(EDGES)]
    items = [(i, s) for i, (_, s) in enumerate(EDGES)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(path / "orders.parquet"))
    spark.createDataFrame(
        items, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))
    return str(path)


def test_lp_separates_bridged_blocks(spark, lp_dir):
    got = {
        r["node"]: r["community"]
        for r in lp_communities(spark, lp_dir).collect()
    }
    assert got == EXPECTED
    # the LP-vs-CC point: one bridge edge connects everything (a single
    # component), yet the two dense blocks keep disjoint label sets
    block_a = {got[n] for n in ("c1", "c2", "c3", "s1", "s2", "s3")}
    block_b = {got[n] for n in ("c5", "c6", "c7", "s5", "s6", "s7")}
    assert not block_a & block_b


def test_lp_matches_oracle_on_fixture(spark, lp_dir):
    got = sorted(
        tuple(r) for r in lp_communities(spark, lp_dir).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{lp_dir}/{t}.parquet/*.parquet'"
        )
    want = sorted(
        tuple(r) for r in con.execute(ORACLES["lp_communities"]).fetchall()
    )
    assert got == want
