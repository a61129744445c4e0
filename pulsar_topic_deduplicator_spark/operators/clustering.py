"""Multi-round distributed k-means over the embedding corpus.

NOT in the reference (no vector ops there — SURVEY.md §2.3); this completes
the clustering tier the similarity module only touches as single Lloyd
rounds inside IVF/PQ codebook training (``similarity.py:361,538``): a full
K-cluster, R-round Lloyd's loop — the kernel behind corpus bucketing for
SemDeDup-style dedup, IVF cell training, and topic-balanced sampling.

**Exactness discipline (why this oracle can be bit-exact).** Classic
k-means on floats is partition-order sensitive (float centroid means).
Here the algorithm is *defined* in integer fixed-point:

- each component is quantized once to non-negative micro-units
  ``q = round((x - min_dim) * 1e6)`` (the SQ8 calibration shape; the one
  float rounding, identical HALF-UP for the non-negative operand on both
  engines);
- distances are exact BIGINT sums of squared differences (≤ 64·(1e6)² ≈
  6.4e13 per pair — no overflow);
- centroid updates are integer means ``sum div count`` — floor and
  truncating division agree because every q is non-negative by
  construction;
- seeds are the K smallest vec_ids; argmin ties break on the smaller
  cluster id; an emptied cluster keeps its previous centroid.

Every step is therefore order-free and the R-round unrolled DuckDB oracle
reproduces the assignment bit-for-bit.

**Scale shape.** The corpus stays in long form (vec_id, dim, q), computed
once and reused across rounds (scoped persist). Per round: one BROADCAST
join against the K×64-row centroid frame (KB-sized), one (vec, k) partial
aggregate + per-vec integer argmin, and one (k, dim) aggregate for the
update — two shuffles per round, R rounds, no driver-side data beyond the
broadcast centroid frame Catalyst ships. At 100 TB this is the canonical
distributed Lloyd plan: centroids KB-sized at any corpus size, per-round
cost linear in the corpus, K× inflation only inside the partial-agg stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import persist_scoped
from ..sources.io import load_table

#: cluster count — small and pinned so the unrolled oracle stays readable;
#: the kernel is K-generic (K only sizes the broadcast centroid frame).
KMEANS_K = 4

#: Lloyd rounds — pinned for the oracle unroll; convergence-stop variants
#: would follow the ``pagerank_converged_suppliers`` checkpoint pattern.
KMEANS_ROUNDS = 3

#: fixed-point scale: micro-units per component (≈6 significant digits of
#: the float corpus — quantization error is part of the model definition).
KMEANS_SCALE = 1_000_000


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim, q): the corpus in long form, each component quantized
    to non-negative integer micro-units above the per-dimension minimum."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    mins = dims.groupBy("dim").agg(F.min("x").alias("mn"))
    return dims.join(F.broadcast(mins), "dim").select(
        "vec_id",
        "dim",
        F.round((F.col("x") - F.col("mn")) * KMEANS_SCALE, 0)
        .cast("long")
        .alias("q"),
    )


def _seed_centroids(q: DataFrame) -> DataFrame:
    """(k, dim, c): the K smallest vec_ids as initial centroids."""
    from pyspark.sql import Window

    seeds = (
        q.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(KMEANS_K)
        .withColumn(
            "k",
            F.row_number().over(Window.orderBy("vec_id")) - 1,
        )
    )
    return F.broadcast(seeds).join(q, "vec_id").select(
        "k", "dim", F.col("q").alias("c")
    )


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cluster_id, dist_q): integer argmin assignment of every
    vector to its nearest centroid (tie → smaller cluster id)."""
    d = F.col("q") - F.col("c")
    per_k = (
        q.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "k")
        .agg(F.sum(d * d).alias("dist"))
    )
    best = per_k.groupBy("vec_id").agg(
        F.min(F.struct(F.col("dist"), F.col("k"))).alias("m")
    )
    return best.select(
        "vec_id",
        F.col("m.k").alias("cluster_id"),
        F.col("m.dist").alias("dist_q"),
    )


def _update(q: DataFrame, assign: DataFrame, prev: DataFrame) -> DataFrame:
    """(k, dim, c): integer-mean centroid update; an emptied cluster keeps
    its previous centroid (left-join coalesce)."""
    newc = (
        assign.select("vec_id", F.col("cluster_id").alias("k"))
        .join(q, "vec_id")
        .groupBy("k", "dim")
        .agg(F.expr("sum(q) div count(1)").alias("c_new"))
    )
    return prev.join(newc, ["k", "dim"], "left").select(
        "k", "dim", F.coalesce("c_new", "c").alias("c")
    )


def _kmeans_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run the pinned R-round loop; returns (final_assignment,
    final_centroids). The loop is driver control flow only — no data
    reaches the driver (centroid frames move as broadcast plans)."""
    q = persist_scoped(_quantized(spark, sf_dir))
    cents = _seed_centroids(q)
    assign = None
    for _ in range(KMEANS_ROUNDS):
        assign = _assign(q, cents)
        cents = _update(q, assign, cents)
    return assign, cents


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-round cluster assignment ``(vec_id, cluster_id, dist_q)`` —
    dist_q is the exact integer squared distance (micro-unit space) to the
    centroid that won the final assignment round."""
    assign, _ = _kmeans_frames(spark, sf_dir)
    return assign


def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model after the final update, in long form
    ``(k, dim, c)`` — the array-free oracle shape; K×64 rows total."""
    _, cents = _kmeans_frames(spark, sf_dir)
    return cents


def _kmeans_cte() -> str:
    """The unrolled R-round oracle CTE chain (shared by both entries)."""
    parts = [
        f"""
    dims AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    mins AS (SELECT dim, min(x) AS mn FROM dims GROUP BY dim),
    q AS (
      SELECT d.vec_id, d.dim,
             CAST(round((d.x - m.mn) * {KMEANS_SCALE}, 0) AS BIGINT) AS q
      FROM dims d JOIN mins m ON d.dim = m.dim),
    seeds AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS k
      FROM (SELECT DISTINCT vec_id FROM q ORDER BY vec_id
            LIMIT {KMEANS_K})),
    cent0 AS (SELECT s.k, q.dim, q.q AS c
              FROM seeds s JOIN q ON q.vec_id = s.vec_id)"""
    ]
    for r in range(1, KMEANS_ROUNDS + 1):
        parts.append(f"""
    assign{r} AS (
      SELECT vec_id, k, dist FROM (
        SELECT q.vec_id, c.k,
               sum((q.q - c.c) * (q.q - c.c)) AS dist,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY sum((q.q - c.c) * (q.q - c.c)) ASC, c.k ASC)
                 AS rn
        FROM q JOIN cent{r - 1} c ON q.dim = c.dim
        GROUP BY q.vec_id, c.k) t WHERE rn = 1),
    cent{r} AS (
      SELECT p.k, p.dim, COALESCE(n.c, p.c) AS c
      FROM cent{r - 1} p
      LEFT JOIN (
        SELECT a.k, q.dim, sum(q.q) // count(*) AS c
        FROM assign{r} a JOIN q ON q.vec_id = a.vec_id
        GROUP BY a.k, q.dim) n ON n.k = p.k AND n.dim = p.dim)""")
    return ",".join(parts)


ORACLES: dict[str, str] = {
    "kmeans_assign": f"""
        WITH {_kmeans_cte()}
        SELECT vec_id, k AS cluster_id, CAST(dist AS BIGINT) AS dist_q
        FROM assign{KMEANS_ROUNDS}
    """,
    "kmeans_centroids": f"""
        WITH {_kmeans_cte()}
        SELECT k, dim, CAST(c AS BIGINT) AS c FROM cent{KMEANS_ROUNDS}
    """,
}


def kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster EXACT silhouette readout for the trained k-means
    model — the clustering tier's quality eval beside the NB
    classifier's AUC/PR and SQ8's ranking eval: every model family the
    engine trains gets a checked number. Centroid-based silhouette on
    SQUARED micro-unit distances: per vector, a = distance to its
    assigned centroid, b = distance to the runner-up; s = (b − a) /
    max(a, b) in integer ppb. The model is evaluated AS DEPLOYED — the
    final-round assignment against the centroids that produced it
    (``cent_{R-1}``) — so a is the argmin by construction, b ≥ a, every
    numerator is non-negative, and floor (DuckDB ``//``) agrees with
    truncation (Spark ``div``). A low mean_sil_ppb cluster is a merge
    candidate; a high one is well-separated.

    Exactness: distances are exact BIGINT (≤ 64·(1e6)² ≈ 6.4e13);
    1e9·(b − a) overflows int64, so the ppb ratio runs in DECIMAL(38,0)
    / HUGEINT. Degenerate a = b = 0 (vector equal to two centroids)
    emits s = 0 in both engines.

    Scale: the Lloyd loop's own cost (R − 1 rounds) + ONE more
    broadcast-join distance pass — the per-(vec, k) partial aggregate is
    the same K×-inflation stage every round pays; the rank-2 window runs
    per vec_id over K rows. Per-cluster rollup is a K-row aggregate."""
    from pyspark.sql import Window

    q = persist_scoped(_quantized(spark, sf_dir))
    cents = _seed_centroids(q)
    for _ in range(KMEANS_ROUNDS - 1):
        assign = _assign(q, cents)
        cents = _update(q, assign, cents)
    d = F.col("q") - F.col("c")
    per_k = (
        q.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "k")
        .agg(F.sum(d * d).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "k")
    ranked = per_k.select(
        "vec_id", "k", "dist", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 2)
    ab = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("k"))).alias("cluster_id"),
        F.max(F.when(F.col("rn") == 1, F.col("dist"))).alias("a"),
        F.max(F.when(F.col("rn") == 2, F.col("dist"))).alias("b"),
    )
    s = ab.select(
        "cluster_id",
        F.expr(
            "CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT) ELSE "
            "CAST((1000000000 * CAST(b - a AS DECIMAL(38,0)))"
            " div CAST(greatest(a, b) AS DECIMAL(38,0)) AS BIGINT) END"
        ).alias("s_ppb"),
    )
    return s.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr("sum(s_ppb) div count(1)").alias("mean_sil_ppb"),
        F.min("s_ppb").alias("min_sil_ppb"),
        F.max("s_ppb").alias("max_sil_ppb"),
    )


ORACLES["kmeans_silhouette"] = f"""
    WITH {_kmeans_cte()},
    perk AS (
      SELECT q.vec_id, c.k,
             sum((q.q - c.c) * (q.q - c.c)) AS dist,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY sum((q.q - c.c) * (q.q - c.c)) ASC, c.k ASC) AS rn
      FROM q JOIN cent{KMEANS_ROUNDS - 1} c ON q.dim = c.dim
      GROUP BY q.vec_id, c.k),
    ab AS (
      SELECT vec_id,
             max(CASE WHEN rn = 1 THEN k END) AS cluster_id,
             max(CASE WHEN rn = 1 THEN dist END) AS a,
             max(CASE WHEN rn = 2 THEN dist END) AS b
      FROM perk WHERE rn <= 2 GROUP BY vec_id),
    s AS (
      SELECT cluster_id,
             CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT) ELSE
               CAST((1000000000 * CAST(b - a AS HUGEINT))
                    // CAST(greatest(a, b) AS HUGEINT) AS BIGINT) END
               AS s_ppb
      FROM ab)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(s_ppb) // count(*) AS BIGINT) AS mean_sil_ppb,
           CAST(min(s_ppb) AS BIGINT) AS min_sil_ppb,
           CAST(max(s_ppb) AS BIGINT) AS max_sil_ppb
    FROM s GROUP BY cluster_id
"""
