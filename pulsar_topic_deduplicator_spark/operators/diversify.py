"""MMR (maximal marginal relevance) diversified top-K selection over the
embedding corpus — the diversity-aware retrieval/sampling step between
"nearest neighbors" (similarity tier) and "representatives per cluster"
(`cluster_representatives`): pick K items that are RELEVANT to a query
while being mutually DISSIMILAR (Carbonell & Goldstein, SIGIR 1998).

NOT in the reference (no vector ops there — SURVEY.md §2.3). In an LLM
data pipeline this is the dedup-aware sampler: top-k retrieval floods the
context with near-duplicates of the best hit; MMR trades relevance
against redundancy greedily, one pick per round.

**Exactness discipline (the `kmeans_assign` fixed-point shape).** Classic
MMR on float cosines is unreproducible across engines; here the algorithm
is *defined* in integer fixed-point:

- components quantized once to non-negative micro-units
  ``q = round((x - min_dim) * 1e6)`` (identical HALF-UP rounding of the
  non-negative operand on both engines — the kmeans/SQ8 calibration);
- relevance = exact BIGINT squared distance to the query vector (closer =
  more relevant); diversity = exact BIGINT squared distance to the
  nearest ALREADY-SELECTED item;
- the query is data-derived and deterministic: the corpus vector with the
  smallest vec_id (no RNG anywhere);
- greedy step r picks argmax(min_div - rel_dist) over the remaining pool
  (equal-weight MMR, lambda = 1/2 — the weights are integers so the score
  is an exact BIGINT), ties -> smaller vec_id; the first pick is the most
  relevant item.

Every step is order-free, so the K-round unrolled DuckDB CTE chain
reproduces the selection bit-for-bit.

**Scale shape.** The distributed work is the relevance pass: ONE
broadcast join of the long-form corpus against the 64-row query frame +
one (vec) partial aggregate, then a TakeOrdered(MMR_POOL) — a single scan
at any corpus size, never a global sort. The greedy refinement runs on
the pool only: pool pairwise distances are one small self-join
(MMR_POOL² × dims rows, KB-sized by construction), and the sequential
K-round argmax — inherently order-dependent, the part no engine
parallelizes — touches ≤ MMR_POOL rows per round, collected to the
driver like the IVF/PQ codebooks (`similarity.py`). At 100 TB the pool
stage bounds everything: corpus size only affects the one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import persist_scoped
from ..sources.io import load_table
from .clustering import KMEANS_SCALE as MMR_SCALE
from .clustering import _quantized

#: diversified picks returned — pinned small so the unrolled oracle CTE
#: chain stays readable; the kernel is K-generic.
MMR_K = 6

#: relevance candidate pool refined by the greedy loop. Pool selection is
#: the distributed stage; pool² bounds all downstream work.
MMR_POOL = 32


def _pool_plan(spark: SparkSession, sf_dir: str):
    """(pool_df, pairs_df): the MMR_POOL most query-relevant vectors
    ``(vec_id, rel_dist_q)`` and their exact pairwise squared distances
    ``(va, vb, d)`` — both KB-sized by construction, as unresolved plans
    so `tests/test_diversify.py` can assert their physical shape
    (TakeOrdered pool cut, broadcast relevance join — never a global
    sort, never a corpus-sized exchange)."""
    q = persist_scoped(_quantized(spark, sf_dir))
    query_id = q.agg(F.min("vec_id")).collect()[0][0]  # scalar, sanctioned
    qvec = F.broadcast(
        q.filter(F.col("vec_id") == query_id).select(
            "dim", F.col("q").alias("c")
        )
    )
    d = F.col("q") - F.col("c")
    rel = (
        q.filter(F.col("vec_id") != query_id)
        .join(qvec, "dim")
        .groupBy("vec_id")
        .agg(F.sum(d * d).alias("rel_dist_q"))
    )
    pool = F.broadcast(
        rel.orderBy("rel_dist_q", "vec_id").limit(MMR_POOL)
    )
    pdims = persist_scoped(pool.join(q, "vec_id"))
    dd = F.col("a.q") - F.col("b.q")
    pairs = (
        pdims.alias("a")
        .join(pdims.alias("b"), "dim")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .groupBy(
            F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
        )
        .agg(F.sum(dd * dd).alias("d"))
    )
    return pool, pairs


def _pool_frames(spark: SparkSession, sf_dir: str):
    """Collected (pool_rows, pair_rows) for the sequential greedy loop —
    ≤ MMR_POOL and ≤ MMR_POOL² rows respectively (the IVF/PQ codebook
    collect precedent)."""
    pool, pairs = _pool_plan(spark, sf_dir)
    return pool.collect(), pairs.collect()


def mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(rank, vec_id, rel_dist_q, min_div_q)`` — the MMR_K diversified
    picks in selection order. ``rel_dist_q`` is the exact integer squared
    distance to the query (micro-unit space); ``min_div_q`` the exact
    squared distance to the nearest earlier pick (0 for rank 1, where no
    pick precedes)."""
    pool_rows, pair_rows = _pool_frames(spark, sf_dir)
    rel = {r["vec_id"]: r["rel_dist_q"] for r in pool_rows}
    dist = {(r["va"], r["vb"]): r["d"] for r in pair_rows}

    picked: list[tuple[int, int, int, int]] = []
    remaining = set(rel)
    while remaining and len(picked) < MMR_K:
        if not picked:
            # rank 1: pure relevance (ties -> smaller vec_id)
            best = min(remaining, key=lambda v: (rel[v], v))
            picked.append((1, best, rel[best], 0))
        else:
            chosen = [p[1] for p in picked]
            # argmax(min_div - rel_dist); ties -> smaller vec_id
            best = min(
                remaining,
                key=lambda v: (
                    -(min(dist[(v, s)] for s in chosen) - rel[v]),
                    v,
                ),
            )
            md = min(dist[(best, s)] for s in chosen)
            picked.append((len(picked) + 1, best, rel[best], md))
        remaining.discard(best)

    return spark.createDataFrame(
        picked,
        "rank int, vec_id bigint, rel_dist_q bigint, min_div_q bigint",
    )


def _mmr_cte() -> str:
    """The unrolled K-round oracle CTE chain: quantize, relevance pool,
    pool pairwise distances, then one sel{r} CTE per greedy pick."""
    parts = [
        f"""
    dims AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    mins AS (SELECT dim, min(x) AS mn FROM dims GROUP BY dim),
    q AS MATERIALIZED (
      SELECT d.vec_id, d.dim,
             CAST(round((d.x - m.mn) * {MMR_SCALE}, 0) AS BIGINT) AS q
      FROM dims d JOIN mins m ON d.dim = m.dim),
    qid AS (SELECT min(vec_id) AS v FROM q),
    qvec AS (SELECT dim, q AS c FROM q, qid WHERE q.vec_id = qid.v),
    pool AS MATERIALIZED (
      SELECT q.vec_id, sum((q.q - c.c) * (q.q - c.c)) AS rel_dist_q
      FROM q JOIN qvec c ON q.dim = c.dim, qid
      WHERE q.vec_id <> qid.v
      GROUP BY q.vec_id
      ORDER BY rel_dist_q, vec_id LIMIT {MMR_POOL}),
    pdims AS (SELECT p.vec_id, q.dim, q.q
              FROM pool p JOIN q ON q.vec_id = p.vec_id),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             sum((a.q - b.q) * (a.q - b.q)) AS d
      FROM pdims a JOIN pdims b ON a.dim = b.dim
      WHERE a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id),
    sel1 AS MATERIALIZED (
      SELECT 1 AS rank, vec_id, rel_dist_q, CAST(0 AS BIGINT) AS min_div_q
      FROM pool ORDER BY rel_dist_q, vec_id LIMIT 1)"""
    ]
    for r in range(2, MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT rank, vec_id FROM sel{i}" for i in range(1, r)
        )
        parts.append(f"""
    chosen{r} AS MATERIALIZED ({prev}),
    sel{r} AS MATERIALIZED (
      SELECT {r} AS rank, p.vec_id, p.rel_dist_q, min(pr.d) AS min_div_q
      FROM pool p
      JOIN pairs pr ON pr.va = p.vec_id
      JOIN chosen{r} c ON pr.vb = c.vec_id
      WHERE p.vec_id NOT IN (SELECT vec_id FROM chosen{r})
      GROUP BY p.vec_id, p.rel_dist_q
      ORDER BY min(pr.d) - p.rel_dist_q DESC, p.vec_id LIMIT 1)""")
    return ",".join(parts)


ORACLES: dict[str, str] = {
    "mmr_diversify": f"""
        WITH {_mmr_cte()}
        SELECT rank, vec_id,
               CAST(rel_dist_q AS BIGINT) AS rel_dist_q,
               CAST(min_div_q AS BIGINT) AS min_div_q
        FROM (
          {" UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, MMR_K + 1))}
        ) ORDER BY rank
    """,
}


#: per-label variant: pool refined per class and picks per class — pinned
#: small so the unrolled per-group oracle stays readable.
MMR_G_POOL = 8
MMR_G_K = 4


def mmr_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(label, rank, vec_id, rel_dist_q, min_div_q)`` — MMR_G_K
    diversified picks PER LABEL, the curation read ("K diverse examples
    per topic/class for an SFT mixture"). Same fixed-point algebra as
    ``mmr_diversify`` with the query replaced by each label's own
    integer-mean centroid (the kmeans ``sum div count`` update — exact on
    the non-negative micro-units), and — the scale upgrade over the
    single-query variant — the greedy argmax runs DISTRIBUTED: each round
    is one join + one per-label window over the labels×MMR_G_POOL frame,
    every label advancing in the same round. No driver-side loop over
    data; the R-round plan composition is the kmeans/PageRank pattern.

    Scale shape: corpus-touching work is the centroid aggregate, the
    relevance aggregate, and ONE per-label TopK window (rank over
    (label) — a single corpus-sized exchange); everything after operates
    on labels×pool rows. Labels with fewer than MMR_G_K pool members
    simply emit fewer picks (both engines derive the same shortfall)."""
    from pyspark.sql import Window

    # q feeds both the centroid/relevance pass and the pool-dims join —
    # pin it so the corpus quantization runs once (plan-audit finding)
    q = persist_scoped(_quantized(spark, sf_dir))
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ql = q.join(lab, "vec_id")
    cent = ql.groupBy("label", "dim").agg(
        F.expr("sum(q) div count(1)").alias("c")
    )
    d = F.col("q") - F.col("c")
    rel = (
        ql.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(F.sum(d * d).alias("rel_dist_q"))
    )
    by_rel = Window.partitionBy("label").orderBy("rel_dist_q", "vec_id")
    pool = persist_scoped(
        rel.withColumn("rn", F.row_number().over(by_rel))
        .filter(F.col("rn") <= MMR_G_POOL)
        .drop("rn")
    )
    pdims = pool.join(q, "vec_id")
    dd = F.col("a.q") - F.col("b.q")
    pairs = persist_scoped(
        pdims.alias("a")
        .join(
            pdims.alias("b"),
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
        )
        .agg(F.sum(dd * dd).alias("d"))
    )
    selected = (
        pool.withColumn("rn", F.row_number().over(by_rel))
        .filter(F.col("rn") == 1)
        .select(
            "label",
            F.lit(1).alias("rank"),
            "vec_id",
            "rel_dist_q",
            F.lit(0).cast("long").alias("min_div_q"),
        )
    )
    pairs_r = pairs.select(
        F.col("label").alias("plabel"), "va", "vb", "d"
    )
    for r in range(2, MMR_G_K + 1):
        chosen = selected.select(
            F.col("label").alias("clabel"), F.col("vec_id").alias("cv")
        )
        cand = (
            pool.join(
                chosen.select(
                    F.col("clabel").alias("label"),
                    F.col("cv").alias("vec_id"),
                ),
                ["label", "vec_id"],
                "left_anti",
            )
            .join(
                pairs_r,
                (F.col("label") == F.col("plabel"))
                & (F.col("vec_id") == F.col("va")),
            )
            .join(
                chosen,
                (F.col("label") == F.col("clabel"))
                & (F.col("vb") == F.col("cv")),
            )
            .groupBy("label", "vec_id", "rel_dist_q")
            .agg(F.min("d").alias("min_div_q"))
        )
        by_score = Window.partitionBy("label").orderBy(
            (F.col("min_div_q") - F.col("rel_dist_q")).desc(), "vec_id"
        )
        # checkpoint each round's KB-sized pick: later rounds reference the
        # selected set twice (anti-join + min-div join), and without the
        # cut the union plan re-evaluates every earlier round's windows
        # exponentially (the MATERIALIZED-CTE lesson, Spark edition);
        # localCheckpoint (the PageRank round pattern) truncates lineage
        # without occupying cache-registry slots
        pick = (
            cand.withColumn("rn", F.row_number().over(by_score))
            .filter(F.col("rn") == 1)
            .select(
                "label",
                F.lit(r).alias("rank"),
                "vec_id",
                "rel_dist_q",
                "min_div_q",
            )
            .localCheckpoint(eager=True)
        )
        selected = selected.unionByName(pick)
    return selected


def _mmr_label_cte() -> str:
    """Unrolled per-label oracle: centroid relevance pool, within-label
    pairs, then one per-group greedy pick per round."""
    parts = [
        f"""
    dims AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    mins AS (SELECT dim, min(x) AS mn FROM dims GROUP BY dim),
    q AS MATERIALIZED (
      SELECT d.vec_id, d.dim,
             CAST(round((d.x - m.mn) * {MMR_SCALE}, 0) AS BIGINT) AS q
      FROM dims d JOIN mins m ON d.dim = m.dim),
    ql AS MATERIALIZED (
      SELECT e.label, q.vec_id, q.dim, q.q
      FROM q JOIN embeddings e ON e.vec_id = q.vec_id),
    cent AS (SELECT label, dim, sum(q) // count(*) AS c
             FROM ql GROUP BY label, dim),
    rel AS MATERIALIZED (
      SELECT l.label, l.vec_id,
             sum((l.q - c.c) * (l.q - c.c)) AS rel_dist_q
      FROM ql l JOIN cent c ON c.label = l.label AND c.dim = l.dim
      GROUP BY l.label, l.vec_id),
    pool AS MATERIALIZED (
      SELECT label, vec_id, rel_dist_q FROM (
        SELECT *, row_number() OVER (PARTITION BY label
          ORDER BY rel_dist_q, vec_id) AS rn FROM rel)
      WHERE rn <= {MMR_G_POOL}),
    pdims AS (SELECT p.label, p.vec_id, q.dim, q.q
              FROM pool p JOIN q ON q.vec_id = p.vec_id),
    pairs AS MATERIALIZED (
      SELECT a.label, a.vec_id AS va, b.vec_id AS vb,
             sum((a.q - b.q) * (a.q - b.q)) AS d
      FROM pdims a JOIN pdims b
        ON a.label = b.label AND a.dim = b.dim
       AND a.vec_id <> b.vec_id
      GROUP BY a.label, a.vec_id, b.vec_id),
    sel1 AS MATERIALIZED (
      SELECT label, 1 AS rank, vec_id, rel_dist_q,
             CAST(0 AS BIGINT) AS min_div_q
      FROM (SELECT *, row_number() OVER (PARTITION BY label
              ORDER BY rel_dist_q, vec_id) AS rn FROM pool)
      WHERE rn = 1)"""
    ]
    for r in range(2, MMR_G_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT label, vec_id FROM sel{i}" for i in range(1, r)
        )
        parts.append(f"""
    chosen{r} AS MATERIALIZED ({prev}),
    cand{r} AS (
      SELECT p.label, p.vec_id, p.rel_dist_q, min(pr.d) AS min_div_q
      FROM pool p
      JOIN pairs pr ON pr.label = p.label AND pr.va = p.vec_id
      JOIN chosen{r} c ON c.label = p.label AND c.vec_id = pr.vb
      WHERE NOT EXISTS (SELECT 1 FROM chosen{r} cc
                        WHERE cc.label = p.label
                          AND cc.vec_id = p.vec_id)
      GROUP BY p.label, p.vec_id, p.rel_dist_q),
    sel{r} AS MATERIALIZED (
      SELECT label, {r} AS rank, vec_id, rel_dist_q, min_div_q FROM (
        SELECT *, row_number() OVER (PARTITION BY label
          ORDER BY min_div_q - rel_dist_q DESC, vec_id) AS rn
        FROM cand{r})
      WHERE rn = 1)""")
    return ",".join(parts)


ORACLES["mmr_per_label"] = f"""
    WITH {_mmr_label_cte()}
    SELECT label, rank, vec_id,
           CAST(rel_dist_q AS BIGINT) AS rel_dist_q,
           CAST(min_div_q AS BIGINT) AS min_div_q
    FROM ({" UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, MMR_G_K + 1))})
    ORDER BY label, rank
"""
