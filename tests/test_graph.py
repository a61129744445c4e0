"""Fixed-point PageRank invariants (operators/graph.py). DuckDB parity of
the driver entry is pinned in test_oracle_parity; these pin the fixed-point
algebra on a hand-built graph where the exact ranking is known."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators import graph


def _edges(spark, pairs):
    fwd = spark.createDataFrame(pairs, "src string, dst string")
    return fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_hub_outranks_leaves(spark):
    """Star graph: the hub must get the top rank, all leaves tie exactly
    (integer arithmetic ⇒ bit-equal leaf ranks, no float fuzz)."""
    e = _edges(spark, [("hub", f"leaf{i}") for i in range(5)])
    pr = {r["node"]: r["pr"] for r in graph.pagerank_fixed_point(e).collect()}
    leaves = [v for k, v in pr.items() if k.startswith("leaf")]
    assert pr["hub"] > max(leaves)
    assert len(set(leaves)) == 1
    # mass is conserved up to deterministic floor loss: never created
    assert sum(pr.values()) <= graph.SCALE


def test_symmetric_graph_is_uniform(spark):
    """On a cycle every node has identical in/out structure — fixed-point
    ranks must be exactly equal."""
    n = 6
    e = _edges(spark, [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)])
    ranks = {r["pr"] for r in graph.pagerank_fixed_point(e).collect()}
    assert len(ranks) == 1


def test_more_iterations_keep_determinism(spark):
    """Re-running the same plan twice gives bit-identical ranks (the whole
    point of fixed-point arithmetic)."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    r1 = sorted(map(tuple, graph.pagerank_fixed_point(e, n_iter=5).collect()))
    r2 = sorted(map(tuple, graph.pagerank_fixed_point(e, n_iter=5).collect()))
    assert r1 == r2


def test_k10_lineage_truncation_and_stable_stop(spark):
    """VERDICT r5 item 7: k=10 must run with bounded lineage
    (checkpoint_every truncates the per-iteration DAG; the returned frame is
    a checkpointed scan, not a 20-exchange join tree), and the zero-delta
    early stop must be bit-identical to the full fixed-k run."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    full = sorted(
        map(tuple, graph.pagerank_fixed_point(e, n_iter=10).collect())
    )
    truncated_df = graph.pagerank_fixed_point(e, n_iter=10, checkpoint_every=2)
    truncated = sorted(map(tuple, truncated_df.collect()))
    assert truncated == full
    # the final frame's plan is a checkpoint scan — no join tree survives
    plan = truncated_df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    stable = sorted(
        map(
            tuple,
            graph.pagerank_fixed_point(
                e, n_iter=10, checkpoint_every=2, stop_when_stable=True
            ).collect(),
        )
    )
    assert stable == full


def test_ppr_ranks_seed_neighborhood(spark, tmp_path_factory):
    """Personalized PageRank: the integer fixed-point replayed in pure
    Python must match bit-for-bit, and the seed's neighbor must outrank
    the globally-popular hub that dominates UNIFORM PageRank."""
    from pulsar_topic_deduplicator_spark.operators.graph import (
        DAMP_PCT,
        PPR_ITER,
        SCALE,
        ppr_related_suppliers,
    )

    # seed region: c1—s1, c1—s2; hub: s9 with customers 2, 3, 4; weak
    # link back via c4—s2 so the graph is connected
    pairs = [(1, 1), (1, 2), (2, 9), (3, 9), (4, 9), (4, 2)]
    path = tmp_path_factory.mktemp("ppr")
    spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(pairs)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(str(path / "orders.parquet"))
    spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(pairs)],
        "l_orderkey long, l_suppkey long",
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))

    # exact integer replay of the same PPR_ITER iterations
    adj: dict[str, list[str]] = {}
    for c, s in pairs:
        adj.setdefault(f"c{c}", []).append(f"s{s}")
        adj.setdefault(f"s{s}", []).append(f"c{c}")
    restart = (15 * SCALE) // 100
    pr = {n: (SCALE if n == "s1" else 0) for n in adj}
    for _ in range(PPR_ITER):
        new = {n: 0 for n in adj}
        for src, nbrs in adj.items():
            share = pr[src] // len(nbrs)
            for dst in nbrs:
                new[dst] += share
        pr = {
            n: (restart if n == "s1" else 0) + (DAMP_PCT * v) // 100
            for n, v in new.items()
        }

    got = {
        r["node"]: r["pr"]
        for r in ppr_related_suppliers(spark, str(path)).collect()
    }
    assert got == pr  # 11 nodes <= TOP_K: the full frame is returned
    # the retrieval claim: proximity to the seed beats global popularity
    assert got["s2"] > got["s9"]


def test_hits_roles_and_normalization(spark, sf_dir):
    """HITS invariants on the real corpus: both roles present, HITS_TOP
    rows each, every score in (0, HITS_SCALE], and the per-role max is
    EXACTLY HITS_SCALE (the integer max-normalization pins the best node
    of each role to the scale — the fixed anchor the oracle replays)."""
    rows = graph.hits_hub_authority(spark, sf_dir).collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r["score"])
    assert set(by_role) == {"authority", "hub"}
    for role, scores in by_role.items():
        assert len(scores) == graph.HITS_TOP, role
        assert max(scores) == graph.HITS_SCALE, role
        assert all(0 < s <= graph.HITS_SCALE for s in scores), role
    # prefixes encode the bipartite roles
    assert all(
        r["node"].startswith("s" if r["role"] == "authority" else "c")
        for r in rows
    )


def test_bfs_hand_graph_distances(spark):
    """BFS relaxation on a path-with-branch graph where every hop count is
    known by eye; nodes beyond BFS_ROUNDS hops must be absent."""
    from pulsar_topic_deduplicator_spark.cachereg import persist_scoped  # noqa: F401

    # s1 - c1 - s2 - c2 - s3 - c3 - s4 - c4 - s5 (a path; seed = s1 is the
    # smallest supplier). Hops: c1=1, s2=2, c2=3, s3=4, rest unreached at
    # BFS_ROUNDS=4.
    pairs = [("c1", "s1"), ("c1", "s2"), ("c2", "s2"), ("c2", "s3"),
             ("c3", "s3"), ("c3", "s4"), ("c4", "s4"), ("c4", "s5")]
    edges = _edges(spark, [(c, s) for c, s in pairs])

    # drive the same relaxation the operator runs, against the hand graph
    dist = {
        r["node"]: r["hops"]
        for r in _bfs_on_edges(spark, edges, "s1").collect()
    }
    assert dist == {"s1": 0, "c1": 1, "s2": 2, "c2": 3, "s3": 4}


def _bfs_on_edges(spark, edges, seed_node):
    """Inline replay of bfs_hops_from_seed's loop on an arbitrary edge
    frame (the operator derives edges + seed from the corpus)."""
    nodes = edges.select("src").distinct()
    dist = nodes.select(
        F.col("src").alias("node"),
        F.when(F.col("src") == seed_node, F.lit(0))
        .otherwise(F.lit(graph.BFS_INF))
        .cast("long")
        .alias("d"),
    )
    for _ in range(graph.BFS_ROUNDS):
        nbr = (
            F.broadcast(dist.alias("p"))
            .join(edges.alias("e"), F.col("p.node") == F.col("e.src"))
            .groupBy(F.col("e.dst").alias("node"))
            .agg(
                F.least(
                    F.lit(graph.BFS_INF).cast("long"),
                    F.min(F.col("p.d") + 1),
                ).alias("nd")
            )
        )
        dist = dist.join(nbr, "node").select(
            "node", F.least("d", "nd").alias("d")
        )
    return dist.filter(F.col("d") < graph.BFS_INF).select(
        "node", F.col("d").alias("hops")
    )


def test_kcore_corpus_invariants(spark, sf_dir):
    """k-core peel on the corpus: every survivor's reported degree is a
    true within-subgraph degree ≥ KCORE_K, and the peel removed something."""
    rows = graph.kcore_membership(spark, sf_dir).collect()
    all_nodes = (
        graph._interaction_edges(spark, sf_dir).select("src").distinct().count()
    )
    assert 0 < len(rows) < all_nodes
    assert all(r["deg"] >= graph.KCORE_K for r in rows)


def test_kcore_cascade_on_hand_graph(spark):
    """The peel must CASCADE: on a path a-b-c-d with k=2 the endpoints
    fall in round 1, which drops b/c's degree below 2 so they fall in
    round 2 — the same loop the operator runs, k parametrized."""
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    surv = edges
    survivors_per_round = []
    for _ in range(3):
        deg = surv.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= 2).select("src")
        surv = surv.join(keep, "src", "semi").join(
            keep.select(F.col("src").alias("dst")), "dst", "semi"
        )
        survivors_per_round.append(
            {r["src"] for r in surv.select("src").distinct().collect()}
        )
    assert survivors_per_round[0] == {"b", "c"}  # endpoints peeled
    assert survivors_per_round[1] == set()  # cascade empties the path


def test_long_node_encoding_bijection(spark, sf_dir):
    """The signed-long node encoding (customer k → 2k, supplier k → −(2k+1))
    decoded via _node_str must reproduce EXACTLY the string edge set —
    including key 0, which both sides of this corpus contain (a plain ±k
    encoding would merge c0 and s0)."""
    str_edges = {
        (r["src"], r["dst"])
        for r in graph._interaction_edges(spark, sf_dir).collect()
    }
    decoded = {
        (r["src"], r["dst"])
        for r in graph._interaction_edges_long(spark, sf_dir)
        .select(
            graph._node_str(F.col("src")).alias("src"),
            graph._node_str(F.col("dst")).alias("dst"),
        )
        .collect()
    }
    assert decoded == str_edges
    # the zero-key collision case, pinned synthetically
    row = (
        spark.range(1)
        .select(
            graph._node_str(F.lit(0).cast("long")).alias("c0"),
            graph._node_str(F.lit(-1).cast("long")).alias("s0"),
        )
        .collect()[0]
    )
    assert (row["c0"], row["s0"]) == ("c0", "s0")
