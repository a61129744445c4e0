"""Skyline (Pareto frontier) query — multi-objective dominance filtering.

NOT in the reference (SURVEY.md §2.3); added to the engine tier because the
skyline is the classic "no aggregate answers this" relational operator
(Börzsönyi et al. 2001): return every row no other row dominates, here the
orders on the cheapest-AND-earliest frontier (minimize price, minimize
order date). Expressed naively it is a quadratic NOT-EXISTS self-theta-join
— exactly the shape that melts at 100 TB — so the engine runs the
GRID-PRUNED plan:

1. quantize both objectives to a G×G integer grid (affine integer math off
   a one-row broadcast min/max aggregate — the ``layoutstats`` pattern);
   the mapping is monotone, so strictly-smaller cell coordinates imply
   strictly-smaller raw values;
2. a point whose cell has ANY non-empty cell strictly southwest of it is
   certainly dominated — computed on the ≤G² distinct-cell frame with one
   per-qx min + one running-min window (KBs, no point-pair work at all);
3. only the surviving "staircase" points (O(G·points-per-cell)) enter the
   exact pairwise dominance check, as a broadcast anti-join.

The pruning is LOSSLESS (it removes only certainly-dominated points), so
the DuckDB oracle is the brute-force NOT EXISTS itself — every driver
round re-proves the grid filter's completeness, the same discipline as
``jaccard_join_prefix_filtered`` and ``snapshot_merkle_diff``.

Dominance ties: two identical (x, y) points do not strictly dominate each
other, so BOTH survive — consistent in engine and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table

#: grid resolution per objective (G² = 4096 cells max on the cell frame)
SKY_G = 64


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("x"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )


def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders on the (earliest order date, lowest price) Pareto frontier:
    ``(o_orderkey, date_us, price_cents)`` for every order no other order
    beats on both objectives (with at least one strict)."""
    from ..cachereg import persist_scoped

    pts = _points(spark, sf_dir)
    stats = pts.agg(
        F.min("x").alias("x_lo"),
        F.max("x").alias("x_hi"),
        F.min("y").alias("y_lo"),
        F.max("y").alias("y_hi"),
    )
    g = SKY_G - 1
    q = persist_scoped(
        pts.crossJoin(F.broadcast(stats)).select(
            "o_orderkey",
            "x",
            "y",
            F.expr(f"((x - x_lo) * {g}) div (x_hi - x_lo)").alias("qx"),
            F.expr(f"((y - y_lo) * {g}) div (y_hi - y_lo)").alias("qy"),
        )
    )
    cells = q.select("qx", "qy").distinct()
    # staircase prune on the cell frame: prefix_min(i-1) of per-qx min qy;
    # a cell (i, j) with j > that prefix min has a non-empty cell strictly
    # southwest of it, and every point inside is certainly dominated
    per_qx = cells.groupBy("qx").agg(F.min("qy").alias("min_qy"))
    w = Window.orderBy("qx").rowsBetween(Window.unboundedPreceding, -1)
    pref = per_qx.select(
        "qx", F.min("min_qy").over(w).alias("pref_min_qy")
    )
    keep_cells = (
        cells.join(F.broadcast(pref), "qx", "left")
        .filter(
            F.col("pref_min_qy").isNull()
            | (F.col("qy") <= F.col("pref_min_qy"))
        )
        .select("qx", "qy")
    )
    cand = q.join(F.broadcast(keep_cells), ["qx", "qy"], "semi")
    # exact dominance among the staircase candidates only
    d = cand.select(
        F.col("x").alias("dx"), F.col("y").alias("dy")
    )
    sky = cand.join(
        F.broadcast(d),
        (F.col("dx") <= F.col("x"))
        & (F.col("dy") <= F.col("y"))
        & ((F.col("dx") < F.col("x")) | (F.col("dy") < F.col("y"))),
        "left_anti",
    )
    return sky.select(
        "o_orderkey",
        F.col("x").alias("date_us"),
        F.col("y").alias("price_cents"),
    )


# the brute-force NOT EXISTS IS the oracle: output equality proves the
# grid prune dropped only dominated points (completeness), every round
ORACLES: dict[str, str] = {
    "skyline_orders": """
    WITH p AS (
      SELECT o_orderkey, epoch_us(o_orderdate) AS x,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS y
      FROM orders)
    SELECT o_orderkey, x AS date_us, y AS price_cents
    FROM p c
    WHERE NOT EXISTS (
      SELECT 1 FROM p d
      WHERE d.x <= c.x AND d.y <= c.y AND (d.x < c.x OR d.y < c.y))
    """,
}
