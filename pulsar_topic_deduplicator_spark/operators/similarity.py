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
  FULL value oracle since round 14: the seeded planes inline into the
  DuckDB SQL as exact round-trip literals (see ORACLES["ann_cosine_lsh"]).

All vector math happens in double (see functions/vectors.py) so the
brute-force operators are bit-identical to DuckDB's ``list_dot_product`` /
``list_cosine_similarity`` on double-cast lists.

Scale notes: the query vector and hyperplanes ride along as literals
(broadcast-equivalent, no shuffle); norms are computed once per row; the
LSH bucket join shuffles only (bucket, vec_id, vector) tuples.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot, l2_norm
from ..sources.io import load_table

TOP_K = 20
QUERY_VEC_ID = 0
EMBEDDING_DIM = 64

# Random-hyperplane LSH, multi-table: L independent tables of b hyperplanes
# each (seed 7, Gaussian components). A vector lands in one bucket per table
# (the sign pattern of b dot products); two vectors are candidates if they
# share a bucket in ANY table. For the observed top-1 similarity of this
# corpus (cos ≈ 0.36 ⇒ per-plane collision p ≈ 0.62), L=8 × b=4 simulates
# ≈ 0.69 top-1 recall. b should grow with log2(N) at scale (bucket occupancy
# N/2^b drives candidate cost); recall rises steeply with the similarity of
# the true neighbor, which is why LSH is the right tool for near-dup
# retrieval and only a blunt one for arbitrary-NN over near-orthogonal data.
NUM_TABLES = 8
BITS_PER_TABLE = 4
_rng = random.Random(7)
HYPERPLANES = [
    [[_rng.gauss(0.0, 1.0) for _ in range(EMBEDDING_DIM)] for _ in range(BITS_PER_TABLE)]
    for _ in range(NUM_TABLES)
]


def _topk_indices(sims, k: int):
    """Row-wise top-k column indices by DESCENDING value: argmax for k=1,
    argpartition + a k-wide sort otherwise — O(width) per row instead of
    the full-row argsort's O(width·log width), which MEASURED as the
    dominant cost of the blockwise kernel (3.9 s vs ~0.02 s for the
    2000×2000 sims matrix at sf0.1 on this container). Ties at full
    double precision remain engine-arbitrary — the documented ulp
    boundary of every BLAS-backed kNN entry (their registry entries
    round to 6 dp at the harness boundary; identity is pinned only
    where the top-2 gap exceeds ulp noise, see tests)."""
    import numpy as np

    kk = min(k, sims.shape[1])
    if kk == 1:
        return np.argmax(sims, axis=1)[:, None]
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    vals = np.take_along_axis(sims, part, axis=1)
    order = np.argsort(-vals, axis=1)
    return np.take_along_axis(part, order, axis=1)


def _query_vector(emb: DataFrame):
    row = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    return [float(x) for x in row["embedding"]]


def _broadcast_catalog(emb: DataFrame):
    """Collect the catalog ONCE and torrent-broadcast ``(ids, unit-rows)``.

    Executors fetch the matrix once per node instead of deserializing it
    from every task closure (the round-1 collect-into-closure hazard).
    The driver still materializes one copy — acceptable for a dim-table-sized
    catalog; when the catalog itself is huge, use ``knn_topk_tiled``, which
    never assembles the matrix anywhere."""
    import numpy as np

    tbl = emb.select("vec_id", "embedding").toArrow()  # zero-copy columnar
    ids = tbl.column("vec_id").to_numpy()
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # id→row-index map built ONCE here, not O(catalog) per task in scorers
    index_of = {int(i): k for k, i in enumerate(ids)}
    return emb.sparkSession.sparkContext.broadcast((ids, mat, index_of))


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


def ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-1 neighbor via multi-table random-hyperplane LSH.

    Division of labor: the embarrassingly-vectorizable pieces (sign-pattern
    bucket ids = one matmul against the plane matrix; candidate scoring =
    one normalized row-gather product) run as Arrow-batched numpy — 32
    separate higher-order-function dot expressions made a plan so large
    that compile+interpretation dominated (5.8 s for 2000 rows). The
    genuinely distributed piece — finding same-bucket pairs and deduping
    them across tables — stays a Spark equi-join + distinct, which is the
    part that must scale with corpus size. FULL value oracle since round
    14 via the registry's 6-dp boundary wrapper (ORACLES note below);
    recall vs. brute force is pinned in tests."""
    import numpy as np
    import pandas as pd

    planes = np.array(HYPERPLANES, dtype=np.float64)  # (L, b, dim)
    flat_planes = planes.reshape(NUM_TABLES * BITS_PER_TABLE, EMBEDDING_DIM)
    bits = 1 << np.arange(BITS_PER_TABLE)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def bucketize(batches):
        for pdf in batches:
            ids = np.array(pdf["vec_id"], dtype=np.int64)
            v = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            signs = (v @ flat_planes.T >= 0).reshape(len(ids), NUM_TABLES, BITS_PER_TABLE)
            buckets = (signs * bits).sum(axis=2)  # (n, L)
            tbl = np.tile(np.arange(NUM_TABLES), len(ids))
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, NUM_TABLES),
                    "tbl": tbl,
                    "bucket": buckets.ravel(),
                }
            )

    tables = emb.mapInPandas(bucketize, schema="vec_id long, tbl int, bucket long")
    a, b = tables.alias("a"), tables.alias("b")
    # no distinct(): a pair colliding in k tables is scored k times — the
    # final max-per-vec_id dedupes it anyway, and skipping the distinct
    # removes a full shuffle of the candidate stream (scoring a duplicate
    # row in vectorized numpy is far cheaper than shuffling it)
    cands = a.join(
        b,
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("nn_id"))

    # scoring: catalog matrix is a broadcast VARIABLE (fetched once per
    # executor, not shipped per task); per candidate batch one vectorized
    # gather + row product. Tiled-join scoring (knn_topk_tiled) is the
    # catalog-too-big-to-broadcast path.
    bc = _broadcast_catalog(emb)

    def score(batches):
        cat_ids, cat, index_of = bc.value
        for pdf in batches:
            ia = np.array([index_of[int(x)] for x in pdf["vec_id"]], dtype=np.int64)
            ib = np.array([index_of[int(x)] for x in pdf["nn_id"]], dtype=np.int64)
            cos = np.einsum("ij,ij->i", cat[ia], cat[ib])
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "nn_id": pdf["nn_id"], "cosine": cos}
            )

    scored = cands.mapInPandas(score, schema="vec_id long, nn_id long, cosine double")
    best = F.max(
        F.struct(F.col("cosine"), (-F.col("nn_id")).alias("neg_id"), F.col("nn_id"))
    ).alias("b")
    return (
        scored.groupBy("vec_id")
        .agg(best)
        .select("vec_id", F.col("b.nn_id").alias("nn_id"), F.col("b.cosine").alias("cosine"))
    )


#: knn_topk_blockwise refuses to broadcast a catalog estimated above this —
#: a broadcast variable is fetched onto EVERY executor, so a multi-GB
#: catalog multiplies across the cluster and evicts executor memory; the
#: tiled cogroup twin handles that regime without assembling the matrix
#: anywhere. 1 GiB is the conventional ceiling for comfortable torrent
#: broadcast on mainstream executor sizes.
MAX_BROADCAST_CATALOG_BYTES = 1 << 30


def knn_topk_blockwise(
    spark: SparkSession,
    sf_dir: str,
    k: int = 1,
    max_broadcast_bytes: int = MAX_BROADCAST_CATALOG_BYTES,
) -> DataFrame:
    """Blockwise brute-force k-NN: the catalog is a broadcast VARIABLE
    (one torrent fetch per executor — not a per-task closure copy) and each
    Arrow batch of query vectors hits it with a single BLAS matmul instead
    of millions of per-pair fold expressions. ~40× faster than the HOF
    self-join at sf0.1.

    The driver materializes one catalog copy to build the broadcast — the
    right trade while the catalog fits one machine. This is explicitly the
    SMALL-CATALOG variant: the catalog size is estimated (row count ×
    dim × 8 bytes — parquet metadata count, no scan) before collecting
    anything, and a catalog above ``max_broadcast_bytes`` raises rather
    than silently assembling a cluster-killing broadcast; use
    ``knn_topk_tiled``, the both-sides-distributed variant, for that
    regime.

    Oracle-hashed at the 6-dp harness boundary (numpy's pairwise
    summation differs from sequential sums in the last ulp — see
    _KNN_TOP1_ROUNDED_ORACLE); agreement with the exact
    ``knn_self_join_top1`` on neighbor identity is pinned in
    tests/test_similarity.py."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    est_bytes = emb.count() * EMBEDDING_DIM * 8
    if est_bytes > max_broadcast_bytes:
        raise ValueError(
            f"catalog estimated at {est_bytes} bytes exceeds the broadcast "
            f"ceiling ({max_broadcast_bytes}); knn_topk_blockwise is the "
            "small-catalog variant — use knn_topk_tiled, which keeps both "
            "sides distributed and never assembles the catalog matrix"
        )
    bc = _broadcast_catalog(emb)

    def block(batches):
        cat_ids, cat_norm, _index_of = bc.value
        for pdf in batches:
            ids = np.array(pdf["vec_id"], dtype=np.int64)
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ cat_norm.T
            # mask self-matches, then top-k per row
            sims[ids[:, None] == cat_ids[None, :]] = -np.inf
            top = _topk_indices(sims, k)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, k),
                    "nn_id": cat_ids[top].ravel(),
                    "cosine": np.take_along_axis(sims, top, axis=1).ravel(),
                }
            )

    return emb.mapInPandas(block, schema="vec_id long, nn_id long, cosine double")


def knn_topk_tiled(
    spark: SparkSession, sf_dir: str, k: int = 1, tiles: int = 4
) -> DataFrame:
    """Block-partitioned exact k-NN — the 100 TB plan: NEITHER side is ever
    assembled on the driver or broadcast whole.

    Classic block matmul as a cogroup: queries are hashed into Q row-blocks
    and replicated across the C catalog tiles; the catalog is hashed into C
    tiles and replicated across the Q query blocks. Each (qb, c) cogroup
    scores one query-block × catalog-tile pair with a single BLAS matmul and
    emits its per-tile top-k; a final groupBy merges tiles to the global
    top-k (the global top-k is a subset of the per-tile top-k's union, so
    the merge shuffles only Q·C·k rows per query block — scalar-sized).

    Communication is O(N·(Q+C)) vector transfers — choose Q=C≈√(cluster
    parallelism) so each cogroup's tile fits executor memory; no single node
    ever holds more than N/C catalog rows. Oracle-hashed at the 6-dp
    harness boundary (BLAS sums — see _KNN_TOP1_ROUNDED_ORACLE); neighbor
    identity vs ``knn_self_join_top1`` is pinned in tests."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q_rep = (
        emb.withColumn("qb", F.pmod(F.hash("vec_id"), F.lit(tiles)))
        .withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(tiles - 1))))
    )
    c_rep = (
        emb.withColumn("c", F.pmod(F.hash("vec_id"), F.lit(tiles)))
        .withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(tiles - 1))))
    )

    def score_tile(_key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"vec_id": [], "nn_id": [], "cosine": []}).astype(
                {"vec_id": "int64", "nn_id": "int64", "cosine": "float64"}
            )
        qids = qpdf["vec_id"].to_numpy(dtype=np.int64)
        cids = cpdf["vec_id"].to_numpy(dtype=np.int64)
        q = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
        c = np.array(cpdf["embedding"].tolist(), dtype=np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        sims = q @ c.T
        sims[qids[:, None] == cids[None, :]] = -np.inf
        top = _topk_indices(sims, k)
        kk = top.shape[1]
        cos = np.take_along_axis(sims, top, axis=1).ravel()
        keep = np.isfinite(cos)  # all-self tile edge case
        return pd.DataFrame(
            {
                "vec_id": np.repeat(qids, kk)[keep],
                "nn_id": cids[top].ravel()[keep],
                "cosine": cos[keep],
            }
        )

    partial = (
        q_rep.groupBy("qb", "c")
        .cogroup(c_rep.groupBy("qb", "c"))
        .applyInPandas(score_tile, schema="vec_id long, nn_id long, cosine double")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "nn_id", "cosine")
    )


IVF_CELLS = 16
IVF_PROBES = 4


def _unit_rows_foldexact(mat):
    """Unit-normalize matrix rows with a LEFT-TO-RIGHT fold norm — the exact
    arithmetic ``sqrt(list_dot_product(x, x))`` performs in DuckDB and the
    HOF ``l2_norm`` performs in Spark. ``np.linalg.norm`` (BLAS nrm2, a
    scaled algorithm) can differ in the last ulp, which matters wherever a
    codebook COMPONENT flows into the oracle bit-for-bit (seed fills for
    empty cells, the driver-side ADC LUT) rather than just into a
    tie-robust argmax. Driver-side only — rows are codebook-sized."""
    import numpy as np

    out = np.empty_like(mat, dtype=np.float64)
    for i, row in enumerate(mat):
        acc = 0.0
        for x in row:
            acc += x * x
        out[i] = row / math.sqrt(acc)
    return out


def _ivf_train_assign(spark: SparkSession, sf_dir: str, n_cells: int):
    """Shared IVF trainer: one distributed Lloyd iteration over
    deterministic seeds (the first ``n_cells`` vectors). Assign =
    Arrow-batched matmul against the broadcast centroid matrix
    (n_cells×dim — kilobytes); update = per-cell mean via posexplode
    partial sums (the ``label_centroids`` shape, scalar-sized shuffle).
    Returns ``(assigned_df, refined_centroids)`` where assigned_df carries
    (vec_id, cell, embedding)."""
    import numpy as np
    import pandas as pd

    sc = spark.sparkContext
    emb = load_table(spark, sf_dir, "embeddings")

    def norm_rows(m: np.ndarray) -> np.ndarray:
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    seeds_tbl = (
        emb.filter(F.col("vec_id") < n_cells)
        .orderBy("vec_id")
        .select("embedding")
        .toArrow()
    )
    # fold-exact: seed components can survive into the refined codebook
    # verbatim (empty-cell fill), where the oracle needs them bit-for-bit
    cents = _unit_rows_foldexact(
        np.array(seeds_tbl.column("embedding").to_pylist(), np.float64)
    )

    def assigner(bc):
        def assign(batches):
            c_mat = bc.value
            for pdf in batches:
                v = norm_rows(np.array(pdf["embedding"].tolist(), np.float64))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cell": np.argmax(v @ c_mat.T, axis=1).astype(np.int32),
                        "embedding": pdf["embedding"],
                    }
                )

        return assign

    schema = "vec_id long, cell int, embedding array<float>"
    assigned = emb.mapInPandas(assigner(sc.broadcast(cents)), schema=schema)

    # one Lloyd update: per-cell mean of UNIT-normalized components (the
    # assigner scores unit vectors — averaging raw components would bias
    # centroids toward long vectors); scalar-sized shuffle, n_cells×dim rows
    # back to the driver (kilobytes) to form the refined codebook.
    #
    # DETERMINISM (round 14, full-oracle conversion): a double F.avg here
    # is partition-order-dependent (Spark's own partial-sum order varies),
    # which is what kept the ivf_* entries rows-only. The update is now
    # fixed-point: each unit component is floored to an integer number of
    # 1e-12 steps — floor() is exact on the binary double in BOTH engines
    # (no round-via-shortest-repr divergence, unlike round()) and the
    # inputs (val cast to double, nrm from the HOF left-fold) are
    # bit-identical to DuckDB's list_dot_product path — then summed in
    # DECIMAL(38,0) (order-free exact integer sum; overflow is loud, and
    # 1e12-scaled unit components sum safely to ~1e26 members per cell).
    # The mean is one pinned double expression, float(s)/cnt/1e12, applied
    # identically in the SQL oracle. The 0.5e-12 floor bias is irrelevant
    # to an ANN coarse quantizer and buys bit-reproducible centroids.
    vecs_nrm = assigned.withColumn(
        "nrm", l2_norm(F.col("embedding").cast("array<double>"))
    )
    mean_rows = (
        vecs_nrm.select(
            "cell", "nrm", F.posexplode("embedding").alias("dim", "val")
        )
        .groupBy("cell", "dim")
        .agg(
            F.sum(
                F.floor(
                    (F.col("val").cast("double") / F.col("nrm")) * F.lit(1e12)
                ).cast("decimal(38,0)")
            ).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    refined = np.array(cents)
    for r in mean_rows:
        refined[r["cell"], r["dim"]] = float(r["s"]) / r["cnt"] / 1e12
    # fold-exact renorm: makes the refined codebook bit-identical to the
    # oracle's list_transform(x -> x / sqrt(list_dot_product)) path
    refined = _unit_rows_foldexact(refined)
    return emb.mapInPandas(assigner(sc.broadcast(refined)), schema=schema), refined


def _ivf_probe_cells(emb: DataFrame, refined, n_probe: int):
    """The query vector's ``n_probe`` nearest cells + its normalized self.

    ``kind="stable"`` pins the tie order to lowest-cell-first — the default
    quicksort breaks ties arbitrarily, which would make the probe set (and
    therefore the full-oracle result) run-dependent on exact-tie scores."""
    import numpy as np

    q = _query_vector(emb)
    q_arr = np.array(q, np.float64)
    q_arr /= np.linalg.norm(q_arr)
    order = np.argsort(-(refined @ q_arr), kind="stable")
    return q, [int(c) for c in order[:n_probe]]


def ivf_topk_cosine(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBES,
) -> DataFrame:
    """IVF (inverted-file) ANN — the index-backed scale path: coarse-quantize
    the corpus into ``n_cells`` Voronoi cells, then answer a query by
    scanning only the ``n_probe`` nearest cells' inverted lists (~n_probe/
    n_cells of the corpus) instead of everything.

    This entry computes assignments inline (index build + probe in one
    plan); ``ivf_topk_indexed`` materializes the same assignments as a
    cell-partitioned table so the probe is a partition-pruned scan — the
    100 TB deployment shape. Candidate scoring is the exact HOF cosine.
    FULL value oracle since round 14 (was rows-only): the fixed-point
    Lloyd update made the codebook bit-reproducible, and every other
    stage was already SQL-expressible — see _IVF_TOPK_ORACLE. Recall vs
    ``embedding_topk_cosine`` is pinned in tests.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, refined = _ivf_train_assign(spark, sf_dir, n_cells)
    q, probe_cells = _ivf_probe_cells(emb, refined, n_probe)

    q_lit = F.lit(q).cast("array<double>")
    return (
        assigned.filter(
            F.col("cell").isin(probe_cells) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select(
            "vec_id",
            "cell",
            cosine_similarity(F.col("embedding"), q_lit).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk_indexed(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    k: int = TOP_K,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBES,
) -> DataFrame:
    """IVF ANN against a MATERIALIZED index: the cell assignments are
    written once as a parquet table partitioned BY ``cell``, and each probe
    is then a partition-pruned scan that reads only ``n_probe``/``n_cells``
    of the corpus from disk (PartitionFilters in the plan — asserted in
    tests). This is the deployment shape at 100 TB: train/assign cost is
    paid once per index build, probes touch ~n_probe/n_cells of the data,
    and new vectors append to their cell partition without touching the
    rest. Results are identical to ``ivf_topk_cosine`` (same assignments,
    same exact-cosine scoring)."""
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, refined = _ivf_train_assign(spark, sf_dir, n_cells)
    if index_dir is None:
        index_dir = tempfile.mkdtemp("ivf_index")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(index_dir)

    q, probe_cells = _ivf_probe_cells(emb, refined, n_probe)
    q_lit = F.lit(q).cast("array<double>")
    index = spark.read.parquet(index_dir)
    return (
        index.filter(
            F.col("cell").isin(probe_cells) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            cosine_similarity(F.col("embedding"), q_lit).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


PQ_M = 8  # subquantizers (64-dim → 8 subspaces of 8 dims)
PQ_K = 16  # centroids per subspace → one uint4-sized code each
PQ_SUB = EMBEDDING_DIM // PQ_M  # dims per subspace
PQ_CANDIDATES = 100  # ADC shortlist size before exact re-rank


def pq_topk_cosine(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_candidates: int = PQ_CANDIDATES,
) -> DataFrame:
    """Product-quantization ANN (IVF-PQ's compression half): vectors are
    encoded as ``PQ_M`` sub-space centroid codes — 8 small ints instead of
    64 doubles, a ~16× smaller table to scan, which is the memory/IO story
    at 100 TB (the full vectors stay in their own table and are fetched
    only for the shortlist). Query answering is classic ADC: a driver-side
    lookup table of query-subvector × centroid dots (M×K floats), a
    code-gather scan for approximate scores, then an EXACT re-rank of the
    top ``n_candidates`` by joining back to the full vectors — returned
    cosines are exact HOF values (identical to brute force for every id
    returned, pinned in tests alongside recall).

    Codebooks train like the IVF coarse quantizer: deterministic seeds
    (sub-vectors of the first ``PQ_K`` vectors) + one distributed Lloyd
    iteration per subspace (posexplode partial sums — scalar-sized
    shuffle). FULL exact oracle since round 14 (was rows-only): the
    fixed-point update + fold-exact LUT make the ADC shortlist
    bit-reproducible — see ORACLES["pq_topk_cosine"]."""
    import numpy as np
    import pandas as pd

    sc = spark.sparkContext
    emb = load_table(spark, sf_dir, "embeddings")

    def norm_rows(m: np.ndarray) -> np.ndarray:
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    seeds_tbl = (
        emb.filter(F.col("vec_id") < PQ_K)
        .orderBy("vec_id")
        .select("embedding")
        .toArrow()
    )
    # fold-exact (round 14): seed sub-vectors survive into the refined
    # codebook verbatim for empty (subspace, code) cells and feed the
    # driver-side ADC LUT, where the oracle needs them bit-for-bit
    seed_mat = _unit_rows_foldexact(
        np.array(seeds_tbl.column("embedding").to_pylist(), np.float64)
    )
    dim = seed_mat.shape[1]
    sub = dim // PQ_M
    books = np.stack(
        [seed_mat[:, m * sub : (m + 1) * sub] for m in range(PQ_M)]
    )  # (M, K, sub)

    def encoder(bc):
        def encode(batches):
            bk = bc.value  # (M, K, sub)
            for pdf in batches:
                v = norm_rows(np.array(pdf["embedding"].tolist(), np.float64))
                codes = np.empty((len(v), PQ_M), np.int32)
                for m in range(PQ_M):
                    seg = v[:, m * sub : (m + 1) * sub]
                    # ||x - c||² argmin == (x·c - ½||c||²) argmax
                    scores = seg @ bk[m].T - 0.5 * (bk[m] ** 2).sum(axis=1)
                    codes[:, m] = np.argmax(scores, axis=1)
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "codes": list(codes)}
                )

        return encode

    schema = "vec_id long, codes array<int>"

    # one Lloyd update per subspace: mean of member (unit-normalized, same
    # as the encoder sees them) sub-vector values per (subspace, code, dim)
    # — scalar-sized shuffle, codebook back on driver. Fixed-point since
    # round 14 (the _ivf_train_assign discipline): floor to 1e-12 steps,
    # order-free DECIMAL sum, one pinned mean expression — the codebook is
    # bit-reproducible across partitionings and engines, which is what
    # makes the ADC shortlist (a rank cutoff over float sums) oracle-able.
    vecs = emb.withColumn(
        "nrm", l2_norm(F.col("embedding").cast("array<double>"))
    )
    seg_vals = (
        emb.mapInPandas(encoder(sc.broadcast(books)), schema=schema)
        .join(vecs, "vec_id")
        .select("codes", "nrm", F.posexplode("embedding").alias("d", "val"))
        .select(
            F.expr(f"d div {sub}").alias("m"),
            (F.col("d") % sub).alias("sd"),
            F.expr(f"codes[d div {sub}]").alias("code"),
            F.floor(
                (F.col("val").cast("double") / F.col("nrm")) * F.lit(1e12)
            ).cast("decimal(38,0)").alias("qv"),
        )
        .groupBy("m", "code", "sd")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    refined = np.array(books)
    for r in seg_vals:
        refined[r["m"], r["code"], r["sd"]] = float(r["s"]) / r["cnt"] / 1e12
    assigned = emb.mapInPandas(encoder(sc.broadcast(refined)), schema=schema)

    q = _query_vector(emb)
    # fold-exact unit query + LEFT-TO-RIGHT LUT dots: the ADC scores are
    # sums of LUT entries, so every entry must be bit-identical to the
    # oracle's list_dot_product fold (M×K 8-dim dots — driver-side, tiny)
    qnrm_acc = 0.0
    for x in q:
        qnrm_acc += x * x
    q_unit = [x / math.sqrt(qnrm_acc) for x in q]
    lut = np.empty((PQ_M, PQ_K))
    for m in range(PQ_M):
        for kk in range(PQ_K):
            acc = 0.0
            for d in range(sub):
                acc += refined[m, kk, d] * q_unit[m * sub + d]
            lut[m, kk] = acc

    def adc(bc):
        def score(batches):
            table = bc.value
            for pdf in batches:
                codes = np.array(pdf["codes"].tolist(), np.int32)
                s = np.zeros(len(codes))
                for m in range(PQ_M):
                    s += table[m][codes[:, m]]
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "approx": s}
                )

        return score

    shortlist = (
        assigned.mapInPandas(adc(sc.broadcast(lut)), schema="vec_id long, approx double")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.col("approx").desc(), F.col("vec_id"))
        .limit(n_candidates)
    )
    q_lit = F.lit(q).cast("array<double>")
    return (
        shortlist.join(emb, "vec_id")
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), q_lit).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


EMBED_NEAR_DUP_THRESHOLD = 0.4


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector member of the dedup
    family): all pairs with cosine ≥ threshold, exact.

    Quadratic ground truth — feasible at oracle scale; the 100 TB path is
    the same LSH bucketing as ``ann_cosine_lsh`` (restrict to same-bucket
    pairs) or blockwise matmul with a threshold, both of which this exact
    set verifies. Exact HOF arithmetic keeps it oracle-checkable."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    with_norm = emb.withColumn("nrm", l2_norm(F.col("v")))
    a, b = with_norm.alias("a"), with_norm.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= EMBED_NEAR_DUP_THRESHOLD)
    )


def embedding_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups over the embedding-cosine near-dup graph: connected
    components (large-star/small-star, O(log n) rounds) of the exact
    ≥-threshold pair set — the vector-modality twin of
    ``near_dup_clusters_lss``, composing two already-verified operators.
    Cluster id = component's minimum vec_id; deterministic fixpoint."""
    from pyspark.sql import Window

    from .neardup import connected_components_lss

    pairs = embedding_near_dup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    labels = connected_components_lss(pairs)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("id").alias("vec_id"), F.col("label").alias("cluster_id")
    ).withColumn("cluster_size", F.count(F.lit(1)).over(w))


#: hot-cell bound for semantic_dedup: within-cell pairwise work is sub-
#: bucketed once a cell exceeds this many vectors, capping any single
#: task's pair count at ~MAX_CELL_SIZE² regardless of how skewed the
#: duplicate mass is. High enough that it never engages on the test
#: corpus (cells there are O(100)), so the oracle-pinned whole-cell
#: contracts stay exact; at 100 TB it is the knob that keeps one
#: duplicate-heavy cell from going quadratic in a single task.
MAX_CELL_SIZE = 4096


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = IVF_CELLS,
    tau: float = EMBED_NEAR_DUP_THRESHOLD,
    max_cell_size: int = MAX_CELL_SIZE,
    assert_no_subbuckets: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv 2303.09540): coarse-cluster the embedding space, then drop any
    vector with a LOWER-id same-cell neighbor at cosine ≥ ``tau`` — keep
    the minimum id of each within-cell near-dup group, deterministically.

    Clustering reuses the IVF coarse quantizer (deterministic seeds, one
    distributed Lloyd round, KB-sized broadcast codebook). The pairwise
    test runs WITHIN cells only — that is the method's whole point: cell
    count grows with the corpus, cell size stays bounded, so the work is
    Σ sz² over cells instead of n² — and cross-cell near-dup misses are
    the published recall tradeoff vs the exact pair graph
    (``embedding_near_dup_pairs`` is the ground-truth twin here).

    HOT-CELL BOUND (VERDICT r5 item 3): duplicate-heavy corpora — the
    exact workload this operator exists for — concentrate mass in few
    cells, and AQE skew-split can spread a hot cell's shuffle but cannot
    reduce its pair count. Any cell larger than ``max_cell_size`` is
    therefore sub-bucketed by ``xxhash64(vec_id) mod ceil(n/cap)`` and the
    pairwise test runs within (cell, bucket): per-task pair work is capped
    at ~cap² always. The cost is the documented SemDeDup-style recall
    tradeoff one level down — a drop decision only sees lower ids in its
    OWN bucket, so a hot cell keeps ~one representative per bucket instead
    of one per cell (deterministic: the bucket hash is content-id-keyed).
    Sub-bucketing engages only above the cap, so results are bit-identical
    to the unbounded plan for every cell ≤ cap.

    Output: (vec_id, cell, kept, max_dup_cosine). FULL exact oracle since
    round 14 (was rows-only): the fixed-point Lloyd update made the cell
    assignment bit-reproducible, and the pairwise test is HOF arithmetic —
    the oracle expresses the no-sub-bucketing regime (every cell ≤
    ``max_cell_size``), which the registry wrapper asserts loudly (the
    ``stream_near_dup`` single-batch-guard pattern);
    ``semantic_dedup_contracts`` remains the invariant twin.
    """
    from ..cachereg import persist_scoped

    assigned, _ = _ivf_train_assign(spark, sf_dir, n_cells)
    # FOUR consumers fork this lineage (per-cell counts + both self-join
    # sides + the final id/cell frame); persist the Arrow assign output
    # once — everything downstream (broadcast count join, sub-bucket hash,
    # norm) is cheap codegen over the cached pass
    base = persist_scoped(
        assigned.select(
            "vec_id",
            "cell",
            F.col("embedding").cast("array<double>").alias("v"),
        ).withColumn("nrm", l2_norm(F.col("v")))
    )
    # per-cell counts: n_cells scalar rows, broadcast back onto the rows
    # to derive each row's sub-bucket count/assignment
    counts = base.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))
    if assert_no_subbuckets:
        # oracle-regime guard (round 14): the FULL value oracle expresses
        # the n_sub = 1 plan, exact only while no cell exceeds the cap.
        # Checked over the persisted `base`, so the action just
        # materializes a cache every downstream consumer reuses anyway.
        hot = counts.filter(F.col("cell_n") > max_cell_size).collect()
        if hot:
            raise AssertionError(
                f"oracle-bearing semantic_dedup saw cells over "
                f"max_cell_size={max_cell_size}: "
                f"{[(r['cell'], r['cell_n']) for r in hot]} — the hot-cell "
                "sub-bucketing would engage and the no-sub-bucketing "
                "oracle no longer applies (see ORACLES['semantic_dedup'])"
            )
    v = (
        base.join(F.broadcast(counts), "cell")
        .withColumn(
            "n_sub",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("cell_n") / F.lit(max_cell_size)),
            ).cast("int"),
        )
        .withColumn(
            "sub",
            F.pmod(F.xxhash64(F.col("vec_id")), F.col("n_sub")).cast("int"),
        )
    )
    a, b = v.alias("a"), v.alias("b")
    dup_best = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= tau)
        .groupBy("vec_id")
        .agg(F.max("cosine").alias("max_dup_cosine"))
    )
    return (
        v.select("vec_id", "cell")
        .join(dup_best, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("max_dup_cosine").isNull().alias("kept"),
            "max_dup_cosine",
        )
    )


def semantic_dedup_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable CONTRACT of ``semantic_dedup`` (the
    ann_recall_contracts pattern — Spark-side verdicts, oracle pins
    constants plus one exact total):

    * ``conservation_ok`` — kept + dropped = corpus size (nothing lost);
    * ``no_kept_pair_above_tau`` — recomputed independently: among KEPT
      vectors no same-cell pair reaches the threshold (the keep-min-id
      rule guarantees this: if u < v and cos ≥ τ, v is dropped);
    * ``dropped_have_cause`` — every dropped vector really has a lower-id
      same-cell neighbor at cosine ≥ τ (nothing dropped for free);
    * ``drops_something`` — the planted near-dups make the op non-vacuous.
    """
    out = semantic_dedup(spark, sf_dir).persist()
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        n_vecs = emb.count()
        n_kept = out.filter(F.col("kept")).count()
        n_dropped = out.filter(~F.col("kept")).count()
        conservation_ok = n_kept + n_dropped == n_vecs

        v = out.join(
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            ),
            "vec_id",
        ).withColumn("nrm", l2_norm(F.col("v")))
        a, b = v.alias("a"), v.alias("b")
        cell_pairs = a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        ).select(
            F.col("a.vec_id").alias("hi"),
            F.col("a.kept").alias("hi_kept"),
            F.col("b.kept").alias("lo_kept"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        thresh = cell_pairs.filter(
            F.col("cosine") >= EMBED_NEAR_DUP_THRESHOLD
        ).persist()
        no_kept_pair_above_tau = (
            thresh.filter(F.col("hi_kept") & F.col("lo_kept")).count() == 0
        )
        caused = thresh.select(F.col("hi").alias("vec_id")).distinct()
        dropped_ids = out.filter(~F.col("kept")).select("vec_id")
        dropped_have_cause = (
            dropped_ids.join(caused, "vec_id", "left_anti").count() == 0
        )
        thresh.unpersist()
    finally:
        out.unpersist()
    return spark.createDataFrame(
        [
            (
                n_vecs,
                conservation_ok,
                no_kept_pair_above_tau,
                dropped_have_cause,
                n_dropped > 0,
            )
        ],
        schema=(
            "n_vecs bigint, conservation_ok boolean, "
            "no_kept_pair_above_tau boolean, dropped_have_cause boolean, "
            "drops_something boolean"
        ),
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column in LONG form
    ``(label, dim, mean_val)`` — the vector AGGREGATE member of the
    similarity tier (topk/knn are vector×vector; this is many-vectors→one).
    posexplode → groupBy(label, dim) keeps the shuffle payload scalar-sized
    (rows×64 small values, map-side partial sums). ``mean_val`` is rounded
    to 9 decimals at the query boundary: double partial-sum order differs
    per engine/partitioning by last-ulp only, and 9-dp rounding makes a
    cross-engine hash match overwhelmingly likely — not guaranteed (Spark
    rounds via HALF_UP on the shortest decimal repr, DuckDB via double
    arithmetic; a mean landing at a 9th-decimal half-boundary could still
    differ). The exact-vector form is ``label_centroid_vectors``; numpy
    parity pinned in test_similarity."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), 9).alias("mean_val"))
    )


#: a vector anti-correlated with its own label centroid is a mislabel /
#: noise suspect — ~5% of the corpus at this threshold (measured p5 ≈ −0.05)
CENTROID_OUTLIER_THRESHOLD = 0.0


def centroid_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space OUTLIER detection for curation: cosine of every
    vector to its own label centroid; vectors below
    ``CENTROID_OUTLIER_THRESHOLD`` are flagged as mislabel/noise suspects —
    the embedding-modality member of the quality-gate family
    (gopher_quality_flags is the text twin).

    Long-form math end to end: posexplode → per-(label, dim) mean →
    broadcast-joined back per dim → one groupBy(vec_id) for the dot/norm
    sums — the centroid side is labels×64 rows (broadcast), the vector side
    never leaves long form, one shuffle total. ``cos_to_centroid`` is
    rounded 6 dp at the boundary and the flag derives from the ROUNDED
    value on both engines (the label_centroids last-ulp discipline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    )
    cent = ex.groupBy("label", "dim").agg(F.avg("v").alias("m"))
    per_vec = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("m")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("n1"),
            F.sum(F.col("m") * F.col("m")).alias("n2"),
        )
    )
    cos = F.round(F.col("dot") / F.sqrt(F.col("n1") * F.col("n2")), 6)
    return per_vec.select(
        "vec_id",
        "label",
        cos.alias("cos_to_centroid"),
        (cos < CENTROID_OUTLIER_THRESHOLD).alias("is_outlier"),
    )


def label_centroid_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroids reassembled into ``array<double>`` vectors (one row per
    label) — the API a downstream vector consumer wants; the long-form
    driver-facing twin is ``label_centroids``. Full precision (no rounding):
    values are pinned against numpy in test_similarity.

    Intentionally NOT in ``__spark_entry__.queries()``: the array column is
    not canonicalizable by the driver harness (pandas cannot sort/hash list
    cells); it is a consumer/test helper outside the driver surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("label", "dim", (F.col("s") / F.col("n")).alias("mean_val"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
                lambda x: x["mean_val"],
            ).alias("centroid"),
            F.max("dim").alias("max_dim"),
        )
        .select("label", "centroid", (F.col("max_dim") + 1).alias("dim"))
    )


_PAIRS_CTE = f"""
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cosine
          FROM n a JOIN n b ON a.vec_id < b.vec_id
          WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm)
                >= {EMBED_NEAR_DUP_THRESHOLD})"""

ORACLES: dict[str, str] = {
    "label_centroids": """
        WITH exploded AS (
          SELECT label,
                 CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                 unnest(embedding) AS val
          FROM embeddings)
        SELECT label, dim, round(avg(CAST(val AS DOUBLE)), 9) AS mean_val
        FROM exploded GROUP BY label, dim
    """,
    "centroid_outlier_flags": """
        WITH ex AS (
          SELECT vec_id, label,
                 CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
        c AS (SELECT label, dim, avg(v) AS m FROM ex GROUP BY label, dim),
        j AS (
          SELECT e.vec_id, e.label,
                 sum(e.v * c.m) AS dot, sum(e.v * e.v) AS n1,
                 sum(c.m * c.m) AS n2
          FROM ex e JOIN c ON e.label = c.label AND e.dim = c.dim
          GROUP BY e.vec_id, e.label)
        SELECT vec_id, label,
               round(dot / sqrt(n1 * n2), 6) AS cos_to_centroid,
               (round(dot / sqrt(n1 * n2), 6) < 0.0) AS is_outlier
        FROM j
    """,
    "embedding_near_dup_pairs": f"""
        WITH {_PAIRS_CTE}
        SELECT vec_a, vec_b, cosine FROM pairs
    """,
    "embedding_near_dup_clusters": f"""
        WITH RECURSIVE {_PAIRS_CTE},
        edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
                  UNION SELECT vec_b, vec_a FROM pairs),
        reach AS (
          SELECT DISTINCT src AS id, src AS label FROM edges
          UNION
          SELECT e.dst AS id, r.label
          FROM reach r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id AS vec_id, min(label) AS cluster_id
                 FROM reach GROUP BY id)
        SELECT vec_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM comp
    """,
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

# The BLAS-backed kNN twins (blockwise / tiled) compute the same exact top-1
# as knn_self_join_top1 — neighbor identity is ulp-robust — but their matmul
# partial-sum order differs from a sequential fold, so the cosine VALUE can
# differ in the last ulp. The driver-facing entries round to 6 dp at the
# harness boundary (__spark_entry__), making a cross-engine hash match
# overwhelmingly likely (a value within ~1e-15 of a 6-dp half-boundary could
# still flip — same caveat as label_centroids). Oracle = the exact SQL kNN
# with the same rounding.
_KNN_TOP1_ROUNDED_ORACLE = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        pairs AS (
          SELECT a.vec_id, b.vec_id AS nn_id,
                 list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cosine,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY list_dot_product(a.e, b.e) / (a.nrm * b.nrm) DESC,
                                             b.vec_id) AS rn
          FROM n a JOIN n b ON a.vec_id <> b.vec_id)
        SELECT vec_id, nn_id, round(cosine, 6) AS cosine
        FROM pairs WHERE rn = 1
    """

ORACLES["knn_topk_blockwise"] = _KNN_TOP1_ROUNDED_ORACLE
ORACLES["knn_topk_tiled"] = _KNN_TOP1_ROUNDED_ORACLE


def _hyperplanes_values_clause() -> str:
    """The 32 seeded hyperplanes as a DuckDB VALUES clause, generated from
    the SAME ``HYPERPLANES`` constant the Spark kernel uses. ``repr`` of a
    Python float is its shortest round-trip decimal, and DuckDB parses a
    decimal literal to the nearest double, so the SQL constants are
    bit-identical to the numpy plane matrix — the bucket bits in both
    engines come from sign tests against the same doubles."""
    rows = []
    for tbl, table in enumerate(HYPERPLANES):
        for bit, plane in enumerate(table):
            vec = ", ".join(repr(x) for x in plane)
            rows.append(f"({tbl}, {bit}, [{vec}]::DOUBLE[])")
    return ",\n          ".join(rows)


#: FULL value oracle for ``ann_cosine_lsh`` (round 14 — VERDICT r13 item 2;
#: rows-only through r13 on the belief that the seeded hyperplanes are
#: "unwieldy as inline SQL"; they are merely large: 32 planes × 64 dims
#: inline to ~45 KB of exact round-trip literals). The pipeline is
#: SQL-expressible end to end: bucket id = integer sum of sign bits,
#: candidates = same-(tbl, bucket) pairs, top-1 = max cosine with
#: lowest-nn_id tie-break (the Spark max(struct(cosine, -nn_id)) rule).
#: Two documented ulp caveats, both the knn_topk precedent: (1) the cosine
#: VALUE is rounded to 6 dp at the harness boundary because Spark scores
#: normalized unit rows via BLAS while the oracle divides a sequential-fold
#: dot by norms; (2) a hyperplane dot within ~1 ulp of ZERO could flip a
#: bucket bit between the BLAS matmul and the sequential fold — for seeded
#: Gaussian planes against real embeddings, P(|dot| < 1e-13) per test is
#: vanishing, and three-scale parity (sf0.001/0.01/0.1) is pinned in
#: tests/test_similarity.py.
ORACLES["ann_cosine_lsh"] = f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        planes(tbl, bit, p) AS (VALUES
          {_hyperplanes_values_clause()}),
        buckets AS (
          SELECT v.vec_id, pl.tbl,
                 sum(CASE WHEN list_dot_product(v.e, pl.p) >= 0
                          THEN (1 << pl.bit) ELSE 0 END) AS bucket
          FROM v CROSS JOIN planes pl
          GROUP BY v.vec_id, pl.tbl),
        cands AS (
          SELECT DISTINCT a.vec_id, b.vec_id AS nn_id
          FROM buckets a
          JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
                        AND a.vec_id <> b.vec_id),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        scored AS (
          SELECT c.vec_id, c.nn_id,
                 list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cosine
          FROM cands c
          JOIN n na ON na.vec_id = c.vec_id
          JOIN n nb ON nb.vec_id = c.nn_id),
        ranked AS (
          SELECT vec_id, nn_id, cosine,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, nn_id) AS rn
          FROM scored)
        SELECT vec_id, nn_id, round(cosine, 6) AS cosine
        FROM ranked WHERE rn = 1
    """


#: FULL value oracle for the IVF pair (round 14, alongside the
#: ann_cosine_lsh conversion — the same "the constants are merely data"
#: realization): every stage of the pipeline is SQL-expressible once the
#: Lloyd update is fixed-point (see _ivf_train_assign) —
#:   seeds        = first IVF_CELLS vectors, unit-normalized;
#:   assignment   = argmax cell of dot(unit(v), seed_unit), first-max =
#:                  lowest cell (numpy argmax ≡ row_number ties by cell);
#:   Lloyd update = per-(cell, dim) mean of floor((val/nrm)·1e12) steps —
#:                  floor is exact on the binary double in both engines,
#:                  the integer sum is order-free, and the mean is the one
#:                  pinned expression CAST(s AS DOUBLE)/cnt/1e12;
#:   refined      = seed component where a cell got no members, renormed;
#:   probe        = top IVF_PROBES cells by dot(refined, q_unit), ties to
#:                  the lowest cell (argsort kind="stable");
#:   result       = exact HOF cosine (bit-identical to list_dot_product —
#:                  functions/vectors.py discipline), ORDER BY cosine
#:                  DESC, vec_id, LIMIT TOP_K. No boundary rounding.
#: Remaining ulp caveat (documented, the knn class): the Spark assigner
#: and probe ranker run BLAS matmuls whose partial-sum order differs from
#: the SQL fold — an argmax/argsort can flip only when two cells tie
#: within ~1 ulp, vanishing for real embeddings; three-scale parity is
#: pinned in tests/test_similarity.py and the driver harness.
#: shared CTE chain reproducing _ivf_train_assign bit-for-bit: seeds →
#: first-pass assignment → fixed-point Lloyd update → refined codebook →
#: second-pass assignment (the trainer's returned assigned_df). Composed
#: by the ivf_topk and semantic_dedup oracles.
_IVF_CODEBOOK_CTES = f"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        su AS (SELECT vec_id AS cell, list_transform(e, x -> x / nrm) AS c
               FROM n WHERE vec_id < {IVF_CELLS}),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT nn.vec_id, su.cell,
                   row_number() OVER (
                     PARTITION BY nn.vec_id
                     ORDER BY list_dot_product(
                       list_transform(nn.e, x -> x / nn.nrm), su.c) DESC,
                       su.cell) AS rn
            FROM n nn CROSS JOIN su) WHERE rn = 1),
        comps AS (
          SELECT a.cell,
                 CAST(generate_subscripts(nn.e, 1) - 1 AS INT) AS dim,
                 CAST(floor(unnest(nn.e) / nn.nrm * 1e12) AS HUGEINT) AS qv
          FROM assign a JOIN n nn USING (vec_id)),
        upd AS (SELECT cell, dim,
                       CAST(sum(qv) AS DOUBLE) / count(*) / 1e12 AS m
                FROM comps GROUP BY cell, dim),
        grid AS (SELECT cell,
                        CAST(generate_subscripts(c, 1) - 1 AS INT) AS dim,
                        unnest(c) AS sv
                 FROM su),
        rawc AS (SELECT g.cell, g.dim, COALESCE(u.m, g.sv) AS rv
                 FROM grid g
                 LEFT JOIN upd u ON u.cell = g.cell AND u.dim = g.dim),
        rl AS (SELECT cell, list(rv ORDER BY dim) AS rvec
               FROM rawc GROUP BY cell),
        refined AS (
          SELECT cell,
                 list_transform(
                   rvec, x -> x / sqrt(list_dot_product(rvec, rvec))) AS rc
          FROM rl),
        -- the trainer RE-ASSIGNS against the refined codebook (the
        -- returned assigned_df is the second pass; the seed-centroid
        -- first pass above only feeds the Lloyd update)
        assign2 AS (
          SELECT vec_id, cell FROM (
            SELECT nn.vec_id, r.cell,
                   row_number() OVER (
                     PARTITION BY nn.vec_id
                     ORDER BY list_dot_product(
                       list_transform(nn.e, x -> x / nn.nrm), r.rc) DESC,
                       r.cell) AS rn
            FROM n nn CROSS JOIN refined r) WHERE rn = 1)"""

_IVF_TOPK_ORACLE = f"""
        WITH {_IVF_CODEBOOK_CTES},
        qv AS (SELECT e, nrm, list_transform(e, x -> x / nrm) AS qu
               FROM n WHERE vec_id = {QUERY_VEC_ID}),
        probe AS (
          SELECT cell FROM (
            SELECT r.cell,
                   row_number() OVER (
                     ORDER BY list_dot_product(r.rc, q.qu) DESC,
                              r.cell) AS rn
            FROM refined r CROSS JOIN qv q) WHERE rn <= {IVF_PROBES})
        SELECT vec_id, cell, cosine FROM (
          SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
                 list_dot_product(nn.e, q.e) / (nn.nrm * q.nrm) AS cosine
          FROM assign2 a
          JOIN n nn USING (vec_id)
          CROSS JOIN qv q
          WHERE a.cell IN (SELECT cell FROM probe)
            AND a.vec_id <> {QUERY_VEC_ID})
        ORDER BY cosine DESC, vec_id
        LIMIT {TOP_K}
    """

ORACLES["ivf_topk_cosine"] = _IVF_TOPK_ORACLE
# the indexed twin materializes the same assignments as a cell-partitioned
# parquet table and prunes partitions at probe time — results are defined
# to be identical, so it shares the exact oracle
ORACLES["ivf_topk_indexed"] = _IVF_TOPK_ORACLE

#: FULL exact oracle for ``pq_topk_cosine`` (round 14, completing the
#: codebook-tier conversions): same recipe as _IVF_TOPK_ORACLE — seeds =
#: first PQ_K unit vectors sliced per subspace, pass-1 encode feeds the
#: fixed-point Lloyd update, pass-2 encode + a bit-exact ADC LUT (the
#: Spark side computes the LUT with driver-side left-to-right folds, so
#: every LUT entry equals DuckDB's list_dot_product) produce approx
#: scores whose 8-term sum is order-pinned (a0+a1+…+a7 both sides); the
#: rank-``PQ_CANDIDATES`` shortlist is therefore identical, and the
#: final re-rank is the exact HOF cosine. No boundary rounding. The
#: remaining ulp caveat is the same argmax class as IVF: the BLAS
#: encoder can flip a code only when two codebook entries tie within
#: ~1 ulp for a vector.
#: FULL exact oracle for ``semantic_dedup`` (round 14 — the last codebook
#: raw): cells come from the shared bit-reproducible codebook CTEs, the
#: within-cell pair test is HOF arithmetic (bit-exact both engines), and
#: kept/max_dup_cosine follow by a lower-id max-aggregate. REGIME: the SQL
#: expresses the no-sub-bucketing plan (n_sub = 1 for every cell), exact
#: whenever no cell exceeds MAX_CELL_SIZE — the registry wrapper asserts
#: that loudly (the stream_near_dup single-batch-guard pattern), so a
#: corpus that would engage the hot-cell bound turns the entry red rather
#: than silently diverging.
ORACLES["semantic_dedup"] = f"""
        WITH {_IVF_CODEBOOK_CTES},
        pairs AS (
          SELECT a.vec_id,
                 list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cosine
          FROM assign2 a
          JOIN assign2 b ON a.cell = b.cell AND b.vec_id < a.vec_id
          JOIN n na ON na.vec_id = a.vec_id
          JOIN n nb ON nb.vec_id = b.vec_id),
        dup_best AS (
          SELECT vec_id, max(cosine) AS max_dup_cosine
          FROM pairs WHERE cosine >= {EMBED_NEAR_DUP_THRESHOLD}
          GROUP BY vec_id)
        SELECT a2.vec_id, CAST(a2.cell AS INT) AS cell,
               (d.max_dup_cosine IS NULL) AS kept, d.max_dup_cosine
        FROM assign2 a2
        LEFT JOIN dup_best d ON d.vec_id = a2.vec_id
    """

ORACLES["pq_topk_cosine"] = f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS vu FROM n),
        m_idx AS (SELECT unnest(range({PQ_M})) AS m),
        books0 AS (
          SELECT m.m, u.vec_id AS code,
                 u.vu[m.m * {PQ_SUB} + 1 : m.m * {PQ_SUB} + {PQ_SUB}] AS c
          FROM u CROSS JOIN m_idx m WHERE u.vec_id < {PQ_K}),
        enc1 AS (
          SELECT vec_id, m, code FROM (
            SELECT uu.vec_id, b.m, b.code,
                   row_number() OVER (
                     PARTITION BY uu.vec_id, b.m
                     ORDER BY list_dot_product(
                         uu.vu[b.m * {PQ_SUB} + 1 : b.m * {PQ_SUB} + {PQ_SUB}],
                         b.c) - 0.5 * list_dot_product(b.c, b.c) DESC,
                       b.code) AS rn
            FROM u uu CROSS JOIN books0 b) WHERE rn = 1),
        segs AS (
          SELECT e1.m, e1.code,
                 u2.vu[e1.m * {PQ_SUB} + 1 : e1.m * {PQ_SUB} + {PQ_SUB}] AS seg
          FROM enc1 e1 JOIN u u2 USING (vec_id)),
        comps AS (
          SELECT m, code,
                 CAST(generate_subscripts(seg, 1) - 1 AS INT) AS sd,
                 CAST(floor(unnest(seg) * 1e12) AS HUGEINT) AS qv
          FROM segs),
        upd AS (SELECT m, code, sd,
                       CAST(sum(qv) AS DOUBLE) / count(*) / 1e12 AS cval
                FROM comps GROUP BY m, code, sd),
        grid AS (SELECT m, code,
                        CAST(generate_subscripts(c, 1) - 1 AS INT) AS sd,
                        unnest(c) AS sv
                 FROM books0),
        raw1 AS (SELECT g.m, g.code, g.sd, COALESCE(u3.cval, g.sv) AS bv
                 FROM grid g
                 LEFT JOIN upd u3
                   ON u3.m = g.m AND u3.code = g.code AND u3.sd = g.sd),
        books1 AS (SELECT m, code, list(bv ORDER BY sd) AS c
                   FROM raw1 GROUP BY m, code),
        enc2 AS (
          SELECT vec_id, m, code FROM (
            SELECT uu.vec_id, b.m, b.code,
                   row_number() OVER (
                     PARTITION BY uu.vec_id, b.m
                     ORDER BY list_dot_product(
                         uu.vu[b.m * {PQ_SUB} + 1 : b.m * {PQ_SUB} + {PQ_SUB}],
                         b.c) - 0.5 * list_dot_product(b.c, b.c) DESC,
                       b.code) AS rn
            FROM u uu CROSS JOIN books1 b) WHERE rn = 1),
        qq AS (SELECT e, nrm, list_transform(e, x -> x / nrm) AS qu
               FROM n WHERE vec_id = {QUERY_VEC_ID}),
        lut AS (SELECT b.m, b.code,
                       list_dot_product(
                         b.c,
                         q.qu[b.m * {PQ_SUB} + 1 : b.m * {PQ_SUB} + {PQ_SUB}]
                       ) AS lv
                FROM books1 b CROSS JOIN qq q),
        adc AS (
          SELECT e2.vec_id,
                 max(CASE WHEN e2.m = 0 THEN l.lv END) AS a0,
                 max(CASE WHEN e2.m = 1 THEN l.lv END) AS a1,
                 max(CASE WHEN e2.m = 2 THEN l.lv END) AS a2,
                 max(CASE WHEN e2.m = 3 THEN l.lv END) AS a3,
                 max(CASE WHEN e2.m = 4 THEN l.lv END) AS a4,
                 max(CASE WHEN e2.m = 5 THEN l.lv END) AS a5,
                 max(CASE WHEN e2.m = 6 THEN l.lv END) AS a6,
                 max(CASE WHEN e2.m = 7 THEN l.lv END) AS a7
          FROM enc2 e2 JOIN lut l ON l.m = e2.m AND l.code = e2.code
          GROUP BY e2.vec_id),
        short AS (
          SELECT vec_id, a0 + a1 + a2 + a3 + a4 + a5 + a6 + a7 AS approx
          FROM adc WHERE vec_id <> {QUERY_VEC_ID}
          ORDER BY approx DESC, vec_id LIMIT {PQ_CANDIDATES})
        SELECT vec_id, cosine FROM (
          SELECT s.vec_id,
                 list_dot_product(nn.e, q.e) / (nn.nrm * q.nrm) AS cosine
          FROM short s JOIN n nn USING (vec_id) CROSS JOIN qq q)
        ORDER BY cosine DESC, vec_id
        LIMIT {TOP_K}
    """


def ann_recall_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable CONTRACT of the approximate-retrieval tier (the
    bloom_digest_prefilter pattern): the ANN results themselves are
    engine-specific (seeded hyperplanes, numpy-trained codebooks), but the
    property that makes them USEFUL — recall against the exact brute-force
    answer — is a verdict the oracle pins as a constant, so a recall
    collapse turns a CORRECTNESS row red instead of hiding behind a
    rows-only check. Floors match the pytest gates (tests/test_similarity):
    IVF/PQ top-20 ≥ 0.5 (observed ~0.85/0.9), LSH top-1 ≥ 0.6.

    All comparisons are Spark-side joins over k-sized results — driver
    work is nil, and the exact sides reuse the oracle-checked operators."""
    # the exact top-k is a k-row constant across all three comparisons —
    # collect it once instead of re-running the brute-force scan+sort (and
    # its count) per method
    exact_ids = {
        r["vec_id"]
        for r in embedding_topk_cosine(spark, sf_dir).select("vec_id").collect()
    }
    exact_topk = spark.createDataFrame(
        [(i,) for i in sorted(exact_ids)], "vec_id long"
    )
    rows = []

    def topk_recall(method: str, approx: DataFrame, floor: float):
        n_exact = len(exact_ids)
        n_hit = approx.select("vec_id").join(exact_topk, "vec_id").count()
        rows.append((method, TOP_K, floor, n_hit / max(n_exact, 1) >= floor))

    topk_recall("ivf", ivf_topk_cosine(spark, sf_dir), 0.5)
    topk_recall("ivf_indexed", ivf_topk_indexed(spark, sf_dir), 0.5)
    topk_recall("pq", pq_topk_cosine(spark, sf_dir), 0.5)

    exact_nn = knn_self_join_top1(spark, sf_dir).select(
        "vec_id", F.col("nn_id").alias("exact_nn")
    )
    lsh = ann_cosine_lsh(spark, sf_dir).select("vec_id", "nn_id")
    joined = lsh.join(exact_nn, "vec_id")
    n = joined.count()
    n_hit = joined.filter(F.col("nn_id") == F.col("exact_nn")).count()
    rows.append(("lsh", 1, 0.6, n_hit / max(n, 1) >= 0.6))

    return spark.createDataFrame(
        rows, schema="method string, top_k int, recall_floor double, recall_ok boolean"
    )


ORACLES["ann_recall_contracts"] = """
    SELECT 'ivf' AS method, CAST(20 AS INTEGER) AS top_k,
           CAST(0.5 AS DOUBLE) AS recall_floor, TRUE AS recall_ok
    UNION ALL
    SELECT 'ivf_indexed', CAST(20 AS INTEGER), CAST(0.5 AS DOUBLE), TRUE
    UNION ALL
    SELECT 'pq', CAST(20 AS INTEGER), CAST(0.5 AS DOUBLE), TRUE
    UNION ALL
    SELECT 'lsh', CAST(1 AS INTEGER), CAST(0.6 AS DOUBLE), TRUE
"""

#: contract-oracle twin of the rows-only ``semantic_dedup`` — constants +
#: one exact total (the stream_near_dup_contracts pattern)
ORACLES["semantic_dedup_contracts"] = """
    SELECT count(*) AS n_vecs,
           TRUE AS conservation_ok,
           TRUE AS no_kept_pair_above_tau,
           TRUE AS dropped_have_cause,
           TRUE AS drops_something
    FROM embeddings
"""


#: int8 scalar-quantization levels (the classic SQ8 vector-compression
#: tier next to PQ: 4 bytes/dim → 1 byte/dim, per-dimension min-max
#: calibration — the FAISS ScalarQuantizer / Milvus SQ8 shape)
SQ8_LEVELS = 255


def _sq8_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim, x, mn, mx, code): the corpus in long form with each
    dimension's calibration range joined on and its quantized code.
    code = round((x−mn)·255/(mx−mn)) — the one float rounding, identical
    HALF-UP on both engines for the non-negative operand; a degenerate
    constant dimension (mx=mn) codes to 0."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "xf"),
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = dims.join(F.broadcast(stats), "dim")
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.round(
            (F.col("x") - F.col("mn"))
            * SQ8_LEVELS
            / (F.col("mx") - F.col("mn")),
            0,
        ).cast("int"),
    ).otherwise(F.lit(0))
    return j.select("vec_id", "dim", "x", "mn", "mx", code.alias("code"))


def sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus — the vector-
    compression tier between raw floats and PQ: per-DIMENSION min-max
    calibration over the corpus, then each value quantized to an 8-bit
    level. Emitted in long form ``(vec_id, dim, code)`` (the array-free
    oracle shape, like ``minhash_signatures``); at rest the codes pack to
    1 byte/dim — 4× smaller scans for ANN shortlisting, with the exact
    re-rank reading the full vectors only for the shortlist (the PQ/ADC
    pattern, one tier simpler).

    Plan: posexplode → ONE dim-keyed aggregate for the 64-row calibration
    table (broadcast back) → zero-shuffle code projection. At 100 TB the
    calibration table is KB-sized and the quantization is a pure scan."""
    return _sq8_frame(spark, sf_dir).select("vec_id", "dim", "code")


def sq8_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SQ8 reconstruction error — the quantization-quality
    audit (decide 'is 1 byte/dim enough for this corpus' from data):
    recon = mn + code·(mx−mn)/255, per-dim squared error pinned to
    integer PICO units (round(d²·1e12) — same fixed-point acceptance as
    the nano-nat family; only the per-dim double arithmetic precedes the
    rounding, in identical operand order on both engines), summed exactly
    per vector as BIGINT. Returns (vec_id, n_dims, sse_pico, max_code).

    The error sum deliberately avoids a raw double Σ — partial-sum order
    differs per partitioning; integer pico-units make the aggregate
    order-free and the oracle bit-exact."""
    f = _sq8_frame(spark, sf_dir)
    recon = F.col("mn") + F.col("code").cast("double") * (
        F.col("mx") - F.col("mn")
    ) / F.lit(float(SQ8_LEVELS))
    d = F.col("x") - recon
    pico = F.round(d * d * 1e12, 0).cast("long")
    return (
        f.select("vec_id", pico.alias("p"), "code")
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.sum("p").alias("sse_pico"),
            F.max("code").alias("max_code"),
        )
    )


_SQ8_CTE = f"""
    dims AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    stats AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM dims GROUP BY dim),
    j AS (
      SELECT d.vec_id, d.dim, d.x, s.mn, s.mx,
             CASE WHEN s.mx > s.mn
                  THEN CAST(round((d.x - s.mn) * {SQ8_LEVELS}
                                  / (s.mx - s.mn), 0) AS INTEGER)
                  ELSE 0 END AS code
      FROM dims d JOIN stats s ON d.dim = s.dim),
    jd AS (
      SELECT vec_id, code,
             x - (mn + CAST(code AS DOUBLE) * (mx - mn)
                       / {float(SQ8_LEVELS)!r}) AS d
      FROM j)"""

ORACLES["sq8_codes"] = f"""
    WITH {_SQ8_CTE}
    SELECT vec_id, dim, code FROM j
"""

ORACLES["sq8_reconstruction_error"] = f"""
    WITH {_SQ8_CTE}
    SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(CAST(round(d * d * 1000000000000.0, 0) AS BIGINT))
                AS BIGINT) AS sse_pico,
           max(code) AS max_code
    FROM jd GROUP BY vec_id
"""


#: PCA power-iteration knobs: signed micro-unit quantization (the kmeans
#: discipline, without the min-shift — the direction must see signed
#: values), fixed rounds, and the rescale denominator trick that keeps
#: every product inside int64: dividing by ``greatest(max|x| div 1e6, 1)``
#: caps magnitudes near 1e6 WITHOUT the overflow-prone multiply-first form.
PCA_SCALE = 1_000_000
PCA_ROUNDS = 4


def pca_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER ITERATION
    on the Gram matrix, in exact integer arithmetic — the linear-algebra
    classic of the iterative tier (PageRank/HITS/BFS/k-core/k-means are
    graph- or cluster-shaped; this is the spectral one). Returns
    ``(dim, loading)``: the d=64 fixed-point components of the iterate
    after PCA_ROUNDS rounds (deterministic sign: the all-positive start).

    Like the fixed-k PageRank entries, the operator CONTRACTS the R-round
    iterate, not the limit: this corpus's spectrum is near-degenerate
    (λ2/λ1 ≈ 0.93 — synthetic near-isotropic embeddings), so the
    DIRECTION converges slowly, but the iterate's Rayleigh quotient
    reaches ≥ 0.8·λ1 by round 4 (vs a ~0.54 random baseline) — the
    energy-capture contract pinned in tests/test_similarity.py. Corpora
    with a real dominant direction converge the direction too.

    Method: components quantize to SIGNED micro-units (round(x·1e6) — no
    centering: these embeddings are near zero-mean by construction, so
    this is the top direction of the second moment, documented); the Gram
    G = Σ_vec qqᵀ accumulates in BIGINT (associative — no float-sum
    order dependence anywhere); each round is v ← rescale(G·v), with the
    division-first rescale keeping |values| ≤ ~1e6. Both engines truncate
    integer division toward zero (verified for negatives), so the
    unrolled CTE oracle replays the identical rounds bit-for-bit.

    Scale: the Gram build is the only corpus-sized work, and it runs as
    an Arrow-batched per-partition integer ``syrk`` fold (numpy int64
    QᵀQ per batch — EXACT, no float matmul anywhere) merged by one
    d²-row sum — the Misra-Gries mergeable-summary shape; no d²-per-row
    explode or self-join ever materializes. Iterations touch only the
    d²-row G and d-row v — driver-free KBs."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def syrk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            if x.size == 0:
                continue
            y = x * PCA_SCALE
            # Spark/DuckDB round() is HALF AWAY FROM ZERO; numpy rounds
            # half-to-even — emulate the SQL semantics exactly
            q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
            p = q.T @ q  # int64 matmul: exact
            acc = p if acc is None else acc + p
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "g": acc.ravel(),
                }
            )

    gram = (
        emb.mapInPandas(syrk, schema="i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )
    gm = gram.agg(F.max(F.abs(F.col("g"))).alias("m"))
    gs = (
        gram.crossJoin(F.broadcast(gm))
        .select(
            "i",
            "j",
            F.expr(f"g div greatest(m div {PCA_SCALE}, 1)").alias("g"),
        )
        .localCheckpoint(eager=True)
    )

    v = gs.select(F.col("j").alias("dim")).distinct().select(
        "dim", F.lit(PCA_SCALE).cast("long").alias("v")
    )
    for _ in range(PCA_ROUNDS):
        w = (
            gs.join(F.broadcast(v), gs.j == v.dim)
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("w"))
        )
        wm = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(wm))
            .select(
                F.col("i").alias("dim"),
                F.expr(f"w div greatest(m div {PCA_SCALE}, 1)").alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select("dim", F.col("v").alias("loading"))


def _pca_oracle() -> str:
    steps = []
    prev = "v0"
    for r in range(1, PCA_ROUNDS + 1):
        steps.append(
            f"""w{r} AS (
          SELECT g.i, CAST(sum(g.g * p.v) AS BIGINT) AS w
          FROM gs g JOIN {prev} p ON g.j = p.dim GROUP BY g.i),
        v{r} AS MATERIALIZED (
          SELECT i AS dim,
                 w // greatest((SELECT max(abs(w)) FROM w{r})
                               // {PCA_SCALE}, 1) AS v
          FROM w{r})"""
        )
        prev = f"v{r}"
    chain = ",\n        ".join(steps)
    return f"""
    WITH q AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * {PCA_SCALE}, 0)
                  AS BIGINT) AS q
      FROM embeddings),
    gram AS MATERIALIZED (
      SELECT a.dim AS i, b.dim AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
      FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY a.dim, b.dim),
    gs AS MATERIALIZED (
      SELECT i, j,
             g // greatest((SELECT max(abs(g)) FROM gram)
                           // {PCA_SCALE}, 1) AS g
      FROM gram),
    v0 AS (SELECT DISTINCT j AS dim, CAST({PCA_SCALE} AS BIGINT) AS v
           FROM gs),
    {chain}
    SELECT dim, v AS loading FROM {prev}
    """


ORACLES["pca_power_component"] = _pca_oracle()


# ─── Contrastive pair mining (hard positives / hard negatives) ──────────────


def contrastive_pair_mining(
    spark: SparkSession,
    sf_dir: str,
    max_broadcast_bytes: int = MAX_BROADCAST_CATALOG_BYTES,
) -> DataFrame:
    """``(vec_id, label, pos_id, pos_cosine, neg_id, neg_cosine,
    margin)`` — for every anchor vector, the HARDEST POSITIVE (most
    similar same-label vector) and HARDEST NEGATIVE (most similar
    different-label vector), plus the contrastive margin
    ``pos_cosine − neg_cosine``: the standard mining step for
    triplet/contrastive embedding training (Schroff et al. 2015, FaceNet
    semi-hard mining — here the batch-global exact variant). A negative
    margin flags an anchor whose nearest neighbor crosses the class
    boundary — exactly the labels-vs-geometry disagreement a curation
    pass wants to surface. Past the broadcast ceiling the kernel switches
    to the ``knn_topk_tiled`` shape (both sides distributed, per-tile
    argmax + a scalar-sized tile merge) instead of raising (VERDICT r11
    item 4) — and the switch is the genuine scale path, not a degraded
    mode: at a 20k×64 catalog the tiled kernel MEASURED 59 s vs the
    broadcast kernel's 135 s with winners identical on all 20000 anchors
    (smaller per-tile temporaries — the broadcast path allocates
    catalog-width mask/score copies per Arrow batch — and tile-level
    parallelism beyond the input partition count).

    Kernel: the ``knn_topk_blockwise`` shape — the (ids, labels,
    unit-rows) catalog rides ONE torrent broadcast, each Arrow batch of
    anchors scores against it with a single BLAS matmul, and the per-side
    winners are row-wise argmaxes under label masks (argmax's
    first-index-on-tie IS the smallest vec_id: the catalog is assembled
    in vec_id order). Two pure-HOF drafts measured 23–27 s at sf0.1
    (4M zip_with/aggregate folds dominate regardless of how the argmax
    is expressed); this kernel does the same work in one matmul per
    batch. Same small-catalog guard and ``knn_topk_tiled``-style escape
    hatch as blockwise kNN; at 100 TB mining runs per-batch or against a
    label-filtered ANN index (the published in-batch-mining shape).

    Cross-engine boundary: BLAS partial-sum order differs from the
    oracle's sequential fold in the last ulp, so the registry entry
    rounds the cosines to 6 dp and derives the margin FROM THE ROUNDED
    columns on both engines (the ``knn_topk_blockwise`` acceptance);
    winner IDENTITY is ulp-robust and pinned unrounded against a numpy
    brute force in tests/test_round10_ops.py. Anchors whose label has no
    second member emit NULL positive columns, never vanish."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    est_bytes = emb.count() * EMBEDDING_DIM * 8
    if est_bytes > max_broadcast_bytes:
        # over the ceiling: never assemble the catalog — degrade to the
        # tiled both-sides-distributed kernel (correct winners, O(N·(Q+C))
        # vector transfers) instead of raising. Tile count follows the
        # cluster: tiles ≈ √parallelism gives tiles² cogroups ≈ one per
        # core, so the scale path widens with the cluster instead of
        # capping at a fixed 4-way replication (ADVICE round 12).
        par = spark.sparkContext.defaultParallelism
        tiles = max(2, int(math.isqrt(max(par, 4))))
        return _contrastive_pair_mining_tiled(emb, tiles=tiles)
    cat_rows = emb.orderBy("vec_id").collect()
    cat_ids = np.array([r["vec_id"] for r in cat_rows], dtype=np.int64)
    cat_labels = np.array([r["label"] for r in cat_rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in cat_rows], dtype=np.float64)
    cat_norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((cat_ids, cat_labels, cat_norm))

    def block(batches):
        ids_c, labels_c, cat = bc.value
        for pdf in batches:
            ids = np.array(pdf["vec_id"], dtype=np.int64)
            labels = np.array(pdf["label"], dtype=np.int64)
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ cat.T
            sims[ids[:, None] == ids_c[None, :]] = -np.inf  # mask self
            same = labels[:, None] == labels_c[None, :]
            out = {"vec_id": ids, "label": labels}
            for side, mask in (("pos", same), ("neg", ~same)):
                s = np.where(mask, sims, -np.inf)
                best = np.argmax(s, axis=1)  # first index on tie = min id
                val = s[np.arange(len(ids)), best]
                has = np.isfinite(val)
                out[f"{side}_id"] = pd.array(
                    np.where(has, ids_c[best], 0), dtype="Int64"
                )
                out[f"{side}_id"][~has] = pd.NA
                out[f"{side}_cosine"] = np.where(has, val, np.nan)
            pdf_out = pd.DataFrame(out)
            pdf_out.loc[
                ~np.isfinite(pdf_out["pos_cosine"]), "pos_cosine"
            ] = None
            pdf_out.loc[
                ~np.isfinite(pdf_out["neg_cosine"]), "neg_cosine"
            ] = None
            yield pdf_out

    return emb.mapInPandas(
        block,
        schema=(
            "vec_id long, label int, pos_id long, pos_cosine double, "
            "neg_id long, neg_cosine double"
        ),
    )


def _contrastive_pair_mining_tiled(emb: DataFrame, tiles: int = 4) -> DataFrame:
    """Over-ceiling escape hatch for ``contrastive_pair_mining`` — the
    ``knn_topk_tiled`` block-matmul cogroup, with per-side (pos/neg)
    argmaxes per tile and a scalar-sized cross-tile merge.

    Each cogroup scores one query-block × catalog-tile pair with a single
    BLAS matmul (catalog tile sorted by vec_id so argmax's
    first-index-on-tie stays the smallest id WITHIN a tile); the merge is
    ONE (vec_id, label) aggregate of struct-maxes ordered
    (cosine DESC, candidate id ASC) — the same global tie-break the
    broadcast kernel gets from its id-ordered catalog — over the
    scalar-sized per-tile winners (≤ 2·tiles rows per anchor). Anchors
    whose label has no second member emit NULL positive columns, never
    vanish: the c=0 cogroup emits one ``side='anchor'`` marker row per
    anchor, so the merge needs NO join back to the (attribute-shared)
    input frame — Catalyst's self-join attribute dedup otherwise prunes
    the cogroup's right-side columns to the grouping keys.
    Communication: each side is replicated ``tiles`` ways — choose
    tiles ≈ √parallelism at scale; no node ever holds more than
    N/tiles catalog rows."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {"vec_id": [], "label": [], "side": [], "cand_id": [], "cosine": []}
    ).astype(
        {
            "vec_id": "int64",
            "label": "int64",
            "side": "str",
            "cand_id": "int64",
            "cosine": "float64",
        }
    )

    q_rep = (
        emb.withColumn("qb", F.pmod(F.hash("vec_id"), F.lit(tiles)))
        .withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(tiles - 1))))
    )
    c_rep = (
        emb.withColumn("c", F.pmod(F.hash("vec_id"), F.lit(tiles)))
        .withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(tiles - 1))))
    )

    def score_tile(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty:
            return empty
        qids = qpdf["vec_id"].to_numpy(dtype=np.int64)
        qlabels = qpdf["label"].to_numpy(dtype=np.int64)
        parts = []
        if int(key[1]) == 0:
            # exactly-once anchor marker per vec_id (every anchor appears
            # in precisely one c=0 cogroup); cand_id/cosine are unread
            # under side='anchor'
            parts.append(
                pd.DataFrame(
                    {
                        "vec_id": qids,
                        "label": qlabels,
                        "side": "anchor",
                        "cand_id": np.zeros(len(qids), dtype=np.int64),
                        "cosine": np.zeros(len(qids), dtype=np.float64),
                    }
                )
            )
        if not cpdf.empty:
            cpdf = cpdf.sort_values("vec_id")
            cids = cpdf["vec_id"].to_numpy(dtype=np.int64)
            clabels = cpdf["label"].to_numpy(dtype=np.int64)
            q = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
            c = np.array(cpdf["embedding"].tolist(), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = q @ c.T
            sims[qids[:, None] == cids[None, :]] = -np.inf  # mask self
            same = qlabels[:, None] == clabels[None, :]
            for side, mask in (("pos", same), ("neg", ~same)):
                s = np.where(mask, sims, -np.inf)
                best = np.argmax(s, axis=1)  # first index on tie = min id
                val = s[np.arange(len(qids)), best]
                has = np.isfinite(val)
                parts.append(
                    pd.DataFrame(
                        {
                            "vec_id": qids[has],
                            "label": qlabels[has],
                            "side": side,
                            "cand_id": cids[best][has],
                            "cosine": val[has],
                        }
                    )
                )
        if not parts:
            return empty
        out = pd.concat(parts, ignore_index=True)
        return out if len(out) else empty

    partial = (
        q_rep.groupBy("qb", "c")
        .cogroup(c_rep.groupBy("qb", "c"))
        .applyInPandas(
            score_tile,
            schema="vec_id long, label int, side string, "
            "cand_id long, cosine double",
        )
    )

    def _best(side: str):
        # struct max = lexicographic (max cosine, then max(-cand_id) =
        # MIN candidate id) — the broadcast kernel's tie-break
        return F.max(
            F.when(
                F.col("side") == side,
                F.struct(
                    F.col("cosine").alias("cos"),
                    (-F.col("cand_id")).alias("mid"),
                ),
            )
        ).alias(side)

    merged = partial.groupBy("vec_id", "label").agg(_best("pos"), _best("neg"))
    return merged.select(
        "vec_id",
        "label",
        (-F.col("pos.mid")).cast("long").alias("pos_id"),
        F.col("pos.cos").alias("pos_cosine"),
        (-F.col("neg.mid")).cast("long").alias("neg_id"),
        F.col("neg.cos").alias("neg_cosine"),
    )


def contrastive_pair_mining_rounded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-boundary form: cosines rounded to 6 dp, margin derived from
    the ROUNDED columns (both engines compute the identical subtraction on
    bit-identical 6-dp doubles — the knn_topk boundary discipline)."""
    out = contrastive_pair_mining(spark, sf_dir)
    pos6 = F.round("pos_cosine", 6)
    neg6 = F.round("neg_cosine", 6)
    return out.select(
        "vec_id",
        "label",
        "pos_id",
        pos6.alias("pos_cosine"),
        "neg_id",
        neg6.alias("neg_cosine"),
        (pos6 - neg6).alias("margin"),
    )


ORACLES["contrastive_pair_mining"] = """
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm
          FROM v),
    pairs AS (
      SELECT a.vec_id, a.label, b.vec_id AS nn_id,
             a.label = b.label AS same,
             list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cosine
      FROM n a JOIN n b ON a.vec_id <> b.vec_id),
    pos AS (
      SELECT vec_id, nn_id AS pos_id,
             round(cosine, 6) AS pos_cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY cosine DESC, nn_id) AS rn
        FROM pairs WHERE same) WHERE rn = 1),
    neg AS (
      SELECT vec_id, nn_id AS neg_id,
             round(cosine, 6) AS neg_cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY cosine DESC, nn_id) AS rn
        FROM pairs WHERE NOT same) WHERE rn = 1)
    SELECT a.vec_id, a.label, pos_id, pos_cosine, neg_id, neg_cosine,
           pos_cosine - neg_cosine AS margin
    FROM v a
    LEFT JOIN pos ON a.vec_id = pos.vec_id
    LEFT JOIN neg ON a.vec_id = neg.vec_id
"""


# --- SQ8 ranking-quality eval ---------------------------------------------------

#: retrieval-eval split: the first EVAL_Q vec_ids are the eval queries, the
#: rest the catalog (disjoint, so a query can never retrieve itself)
EVAL_Q = 8
#: system shortlist depth the MRR / hit rate is measured at
EVAL_TOPK = 10


def sq8_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware quantization-quality eval: for each eval query, where
    does the TRUE nearest neighbor (full-precision max-inner-product
    top-1; the corpus is unit-norm, so identical to cosine) land in the
    SQ8-quantized shortlist? One row per query —
    ``(q_id, true_id, sq8_rank, rr_ppb, hit_at_10)`` — the MRR/hit@K
    facts that decide "is 1 byte/dim enough for this corpus's RETRIEVAL
    quality" (``sq8_reconstruction_error`` answers only the geometric
    half; ranking damage is what retrieval actually pays for).

    The system score is the dot product of the SQ8 RECONSTRUCTIONS
    (``mn + code·(mx−mn)/255`` — scoring raw codes would rank by the
    per-dimension affine shifts, not similarity), quantized to SIGNED
    micro-units (``round(recon·1e6)`` — the PCA/kmeans fixed-point
    discipline; Spark and DuckDB both round half away from zero) so the
    score, the shortlist, and every rank are EXACT INTEGERS with no ulp
    boundary anywhere. The only float is the truth side's full-precision
    fold (``functions/vectors.py`` discipline).

    Scale: Q is a small constant — the quantized scoring is one broadcast
    of Q micro-unit arrays against a catalog scan (zero shuffle for the
    score), then a per-query top-K; at corpus scale the shortlist rides
    the tiled kNN machinery (``knn_topk_tiled``) instead of a per-query
    window, and the truth side is exactly the exact-rerank tier ANN
    already pays."""
    from pyspark.sql import Window

    from ..functions.vectors import dot as vec_dot

    f = _sq8_frame(spark, sf_dir)
    recon = F.col("mn") + F.col("code").cast("double") * (
        F.col("mx") - F.col("mn")
    ) / F.lit(float(SQ8_LEVELS))
    rq = F.round(recon * F.lit(1e6), 0).cast("long")
    arrs = (
        f.select("vec_id", "dim", rq.alias("rq"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "rq"))),
                lambda s: s.rq,
            ).alias("cv")
        )
    )
    queries = arrs.filter(F.col("vec_id") < EVAL_Q).select(
        F.col("vec_id").alias("q_id"), F.col("cv").alias("qv")
    )
    catalog = arrs.filter(F.col("vec_id") >= EVAL_Q).select(
        F.col("vec_id").alias("c_id"), "cv"
    )
    qdot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = catalog.crossJoin(F.broadcast(queries)).select(
        "q_id", "c_id", qdot.alias("qdot")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("qdot").desc(), "c_id")
    short = (
        scored.select("q_id", "c_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= EVAL_TOPK)
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qe = emb.filter(F.col("vec_id") < EVAL_Q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qemb")
    )
    ce = emb.filter(F.col("vec_id") >= EVAL_Q).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    ip = vec_dot(F.col("embedding"), F.col("qemb"))
    wt = Window.partitionBy("q_id").orderBy(F.col("ip").desc(), "c_id")
    truth = (
        ce.crossJoin(F.broadcast(qe))
        .select("q_id", "c_id", ip.alias("ip"))
        .select("q_id", "c_id", F.row_number().over(wt).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("c_id").alias("true_id"))
    )
    # both sides are Q- / Q·K-row frames; without the hint Catalyst plans
    # a SortMergeJoin here (KB data, two needless sort exchanges)
    return truth.join(
        F.broadcast(short.withColumnRenamed("c_id", "true_id")),
        ["q_id", "true_id"],
        "left",
    ).select(
        "q_id",
        "true_id",
        F.col("rnk").cast("long").alias("sq8_rank"),
        F.expr("coalesce(1000000000 div rnk, 0)").cast("long").alias("rr_ppb"),
        F.col("rnk").isNotNull().alias("hit_at_10"),
    )


ORACLES["sq8_ranking_eval"] = f"""
    WITH {_SQ8_CTE},
    r AS (
      SELECT vec_id, dim,
             CAST(round((mn + CAST(code AS DOUBLE) * (mx - mn)
                              / {float(SQ8_LEVELS)!r}) * 1000000.0, 0)
                  AS BIGINT) AS rq
      FROM j),
    qc AS (SELECT vec_id AS q_id, dim, rq FROM r WHERE vec_id < {EVAL_Q}),
    cc AS (SELECT vec_id AS c_id, dim, rq FROM r WHERE vec_id >= {EVAL_Q}),
    dots AS (
      SELECT q_id, c_id, CAST(sum(qc.rq * cc.rq) AS BIGINT) AS qdot
      FROM qc JOIN cc USING (dim) GROUP BY q_id, c_id),
    short AS (
      SELECT q_id, c_id, rnk FROM (
        SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY qdot DESC, c_id) AS rnk
        FROM dots)
      WHERE rnk <= {EVAL_TOPK}),
    qe AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {EVAL_Q}),
    ce AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= {EVAL_Q}),
    truth AS (
      SELECT q_id, c_id AS true_id FROM (
        SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id ORDER BY
                 list_dot_product(cv, qv) DESC, c_id) AS rn
        FROM qe, ce)
      WHERE rn = 1)
    SELECT t.q_id, t.true_id, CAST(s.rnk AS BIGINT) AS sq8_rank,
           CAST(coalesce(1000000000 // s.rnk, 0) AS BIGINT) AS rr_ppb,
           s.rnk IS NOT NULL AS hit_at_10
    FROM truth t
    LEFT JOIN short s ON s.q_id = t.q_id AND s.c_id = t.true_id
"""
