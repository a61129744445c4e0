"""Similarity search over the ``embeddings`` table (array<float> vectors).

NOT in the reference — training-data-pipeline tier (project brief): given an
embedding column, find nearest neighbors by cosine similarity.

* ``embedding_topk_cosine`` — brute-force top-k for one query vector: a
  single scan with a codegen'd dot product, then TakeOrderedAndProject
  (per-partition heap, driver merges k rows — no global sort). The baseline
  and the verify stage.
* ``knn_self_join_top1`` — every vector's nearest neighbor, brute force:
  the quadratic ground truth, feasible at bench scale; at 100 TB this is
  what the LSH path replaces.
* ``ann_cosine_lsh`` — random-hyperplane LSH: vectors are bucketed by the
  sign pattern of dot products with H fixed pseudo-random hyperplanes; only
  same-bucket pairs are compared. Linear candidate generation; recall is
  tested against the brute-force truth in tests/test_similarity.py.
  (Rows-only in the oracle: the hyperplane constants are derived from a
  seeded generator, reproducible in Spark but unwieldy as inline SQL.)

All vector math happens in double (see functions/vectors.py) so the
brute-force operators are bit-identical to DuckDB's ``list_dot_product`` /
``list_cosine_similarity`` on double-cast lists.

Scale notes: the query vector and hyperplanes ride along as literals
(broadcast-equivalent, no shuffle); norms are computed once per row; the
LSH bucket join shuffles only (bucket, vec_id, vector) tuples.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot, l2_norm
from ..sources.io import load_table

TOP_K = 20
QUERY_VEC_ID = 0
EMBEDDING_DIM = 64

# Random-hyperplane LSH: H fixed hyperplanes (seed 7), values in [-0.5, 0.5).
NUM_HYPERPLANES = 8
_rng = random.Random(7)
HYPERPLANES = [
    [_rng.random() - 0.5 for _ in range(EMBEDDING_DIM)]
    for _ in range(NUM_HYPERPLANES)
]


def _query_vector(emb: DataFrame):
    row = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    return [float(x) for x in row["embedding"]]


def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the corpus query vector (vec_id=0).

    The query vector is collected once (a single row — driver-side literal,
    the distributed-systems equivalent of a broadcast variable) and inlined,
    so the scan side never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.lit(_query_vector(emb)).cast("array<double>")
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            "label",
            cosine_similarity(F.col("embedding"), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


def knn_self_join_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest neighbor for every vector (brute-force self-join).

    Norms are precomputed per side so the O(n²) inner loop is a plain dot
    product; the small side is broadcast. Ground truth for the LSH path."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    with_norm = emb.withColumn("nrm", l2_norm(F.col("v")))
    a = with_norm.alias("a")
    b = with_norm.alias("b")
    w_cos = (
        a.join(F.broadcast(b), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nn_id"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
    return (
        w_cos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn_id", "cosine")
    )


def _bucket_expr():
    """LSH bucket id: bit j = sign(v · hyperplane_j). Pure codegen math."""
    bucket = None
    for j, plane in enumerate(HYPERPLANES):
        p = F.lit(plane).cast("array<double>")
        bit = F.when(dot(F.col("v"), p) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return bucket.cast("int")


def ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbor via random-hyperplane LSH: compare only
    vectors sharing a sign-pattern bucket. Rows-only check (hyperplane
    constants are seeded-generator output); recall vs. brute force is
    asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("bucket", _bucket_expr()).withColumn(
        "nrm", l2_norm(F.col("v"))
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nn_id"),
        (
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn_id", "cosine")
    )


ORACLES: dict[str, str] = {
    "embedding_topk_cosine": f"""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID})
        SELECT vec_id, label,
               list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))) AS cosine
        FROM embeddings, q
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id
        LIMIT {TOP_K}
    """,
    "knn_self_join_top1": """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        pairs AS (
          SELECT a.vec_id, b.vec_id AS nn_id,
                 list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cosine,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY list_dot_product(a.e, b.e) / (a.nrm * b.nrm) DESC,
                                             b.vec_id) AS rn
          FROM n a JOIN n b ON a.vec_id <> b.vec_id)
        SELECT vec_id, nn_id, cosine FROM pairs WHERE rn = 1
    """,
}
