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
