"""Data-layout analytics — zone-map pruning statistics and Z-order
(Morton-curve) bucketing.

NOT in the reference (it stores nothing — SURVEY.md §2.3); added to the
engine tier because physical layout is THE dominant cost lever at 100 TB:
a parquet/Delta/Iceberg table carries per-file min/max statistics ("zone
maps"), and the fraction of files a predicate can skip is decided entirely
by how rows were clustered into files at write time. These operators make
that decision measurable inside the engine — the same min/max-per-bucket
arithmetic the scan planner runs, expressed declaratively so the DuckDB
oracle replays it exactly.

The WRITE side of this tier already exists in ``sources/layout.py``
(``write_zordered`` / ``write_partitioned`` / ``write_bucketed_table``,
with real parquet-footer skip measurements in tests/test_layout.py); these
operators are the ANALYTIC counterpart — the same pruning arithmetic as
driver-checkable, oracle-exact queries, so layout quality is a number the
correctness gate verifies rather than a claim.

Two operators:

- ``zonemap_prune_stats`` — lay the SAME lineitem rows out three ways
  (hash-random, natural ingest order, sorted by ``l_shipdate``), build the
  per-bucket zone map, and report how many buckets a fixed ship-date range
  predicate skips under each layout, plus the false-scan rows (rows read
  from surviving buckets that don't match). The sorted layout skips ~90 %+
  of buckets; hash/natural skip ≈ none — the quantified argument for
  sort-on-write.
- ``zorder_bucket_spans`` — quantize two order dimensions (order date ×
  total price) to 8 bits each, interleave the bits into a 16-bit Morton
  code, and bucket by its top byte (a 16×16 grid cell). Reports per-layout
  span totals (a Z-bucket is bounded in BOTH dimensions; an x-sorted bucket
  is bounded in one) and the bucket-prune counts for a fixed 2-D predicate
  — the multi-dimension clustering story (``OPTIMIZE ZORDER BY`` in Delta,
  ``sort_order`` in Iceberg) reduced to exact integer arithmetic.

Determinism/oracle notes: bucket assignment must be a pure function of the
data, so the sorted layouts use ``ntile(N) OVER (ORDER BY <total order>)``
(ANSI semantics, identical in Spark and DuckDB) and the hash layout uses the
engine's stable sha2-derived ``stable_uint60``. Quantization is affine
integer arithmetic against the global min/max (one-row aggregate, broadcast
— no collect), and the Morton interleave is generated as pure div/mod/add
terms so the identical formula runs on both engines. Every output column is
BIGINT — no floats anywhere.

Scale notes: ``ntile`` over a global ORDER BY is the deterministic
test-bench stand-in for what a production writer does with
``repartitionByRange`` (sampled range boundaries — same bucket shape, not
bit-reproducible across samplings); the zone-map aggregation itself is one
groupBy(bucket) over the scan, i.e. the metadata pass a table format runs
at commit time, linear and shuffle-light at any scale. The Z-value is a
per-row expression (no shuffle at all); at 100 TB you'd write files with
``repartitionByRange(z)`` and get the measured 2-D skipping on every scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_uint60
from ..sources.io import load_table
from ._oracle_fragments import duck_stable_uint60

#: zone-map bucket count ("files" in the table-format analogy)
N_BUCKETS = 64

#: ship-date range predicate for the prune readout: [1998-01-01, 1998-07-01)
#: in epoch micros — ~7 % of the ~7-year ship-date domain.
PRED_LO_US = 883_612_800_000_000
PRED_HI_US = 899_251_200_000_000

#: Z-order quantization width (bits per dimension) and derived grid shape:
#: top ``Z_CELL_BITS`` of each dimension form the bucket ⇒ 16×16 = 256 cells.
Q_BITS = 8
Q_MAX = (1 << Q_BITS) - 1  # 255
Z_CELL_BITS = 4
Z_BUCKET_DIV = 1 << (2 * Q_BITS - 2 * Z_CELL_BITS)  # z div 256 → top byte

#: 2-D predicate for the Z-order prune readout (raw domain): order date in
#: [1997-01-01, 1998-01-01) AND total price in [100 000, 200 000) dollars
#: (price carried as exact cents).
Z_PRED_X_LO = 852_076_800_000_000
Z_PRED_X_HI = 883_612_800_000_000
Z_PRED_Y_LO = 10_000_000
Z_PRED_Y_HI = 20_000_000


def _morton16(qx: str, qy: str, divop: str) -> str:
    """Bit-interleave two ``Q_BITS``-bit ints into a Morton code using only
    div/mod/add — the same generated formula runs verbatim on Spark
    (``divop='div'``) and DuckDB (``divop='//'``), so the oracle is exact
    without either engine needing bit-shift builtins."""
    terms = []
    for i in range(Q_BITS):
        terms.append(f"(({qx} {divop} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({qy} {divop} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zonemap_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (per-bucket min/max) pruning effectiveness of three physical
    layouts of lineitem under the fixed ship-date range predicate.

    Returns one row per layout: ``(layout, n_buckets, n_pruned,
    rows_skipped, rows_scanned, false_scan_rows)`` where a bucket is pruned
    iff its ship-date zone [min, max] cannot intersect the predicate, and
    ``false_scan_rows`` counts rows the scan must still read from surviving
    buckets that do NOT match — the layout-quality residual (0 for a
    perfectly clustered layout)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        # l_shipdate arrives as TIMESTAMP_NTZ; the cast re-tags it under the
        # session's pinned UTC zone so unix_micros yields the same naive-µs
        # integer DuckDB's epoch_us computes (same pattern as profile_orders)
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("x"),
    )

    row_key = F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber"))
    hash_b = (stable_uint60(row_key) % N_BUCKETS).alias("bucket")
    natural_b = (
        F.ntile(N_BUCKETS)
        .over(Window.orderBy("l_orderkey", "l_linenumber"))
        .cast("long")
        .alias("bucket")
    )
    sorted_b = (
        F.ntile(N_BUCKETS)
        .over(Window.orderBy("x", "l_orderkey", "l_linenumber"))
        .cast("long")
        .alias("bucket")
    )

    tagged = None
    for name, bucket in (
        ("hash", hash_b),
        ("natural", natural_b),
        ("shipdate_sorted", sorted_b),
    ):
        t = li.select(F.lit(name).alias("layout"), bucket, "x")
        tagged = t if tagged is None else tagged.unionByName(t)

    match = (F.col("x") >= PRED_LO_US) & (F.col("x") < PRED_HI_US)
    zones = tagged.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.sum(match.cast("long")).alias("n_match"),
    )
    pruned = (F.col("x_max") < PRED_LO_US) | (F.col("x_min") >= PRED_HI_US)
    return (
        zones.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(pruned.cast("long")).alias("n_pruned"),
            F.sum(F.when(pruned, F.col("cnt")).otherwise(0)).alias(
                "rows_skipped"
            ),
            F.sum(F.when(~pruned, F.col("cnt")).otherwise(0)).alias(
                "rows_scanned"
            ),
            F.sum(
                F.when(~pruned, F.col("cnt") - F.col("n_match")).otherwise(0)
            ).alias("false_scan_rows"),
        )
        .orderBy("layout")
    )


def _zonemap_oracle() -> str:
    h = duck_stable_uint60(
        "CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)"
    )
    return f"""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, epoch_us(l_shipdate) AS x
      FROM lineitem),
    tagged AS (
      SELECT 'hash' AS layout, {h} % {N_BUCKETS} AS bucket, x FROM li
      UNION ALL
      SELECT 'natural' AS layout,
             ntile({N_BUCKETS}) OVER (ORDER BY l_orderkey, l_linenumber)
               AS bucket, x
      FROM li
      UNION ALL
      SELECT 'shipdate_sorted' AS layout,
             ntile({N_BUCKETS}) OVER (ORDER BY x, l_orderkey, l_linenumber)
               AS bucket, x
      FROM li),
    zones AS (
      SELECT layout, bucket, count(*) AS cnt, min(x) AS x_min,
             max(x) AS x_max,
             sum(CASE WHEN x >= {PRED_LO_US} AND x < {PRED_HI_US}
                      THEN 1 ELSE 0 END) AS n_match
      FROM tagged GROUP BY layout, bucket),
    flagged AS (
      SELECT *, (x_max < {PRED_LO_US} OR x_min >= {PRED_HI_US}) AS pruned
      FROM zones)
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned,
           CAST(sum(CASE WHEN pruned THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_skipped,
           CAST(sum(CASE WHEN pruned THEN 0 ELSE cnt END) AS BIGINT)
             AS rows_scanned,
           CAST(sum(CASE WHEN pruned THEN 0 ELSE cnt - n_match END)
                AS BIGINT) AS false_scan_rows
    FROM flagged GROUP BY layout ORDER BY layout
    """


def _quantized_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with both Z dimensions quantized to [0, Q_MAX] by exact
    affine integer arithmetic against the global min/max (one-row broadcast
    aggregate — no driver collect; ``(v - min) * Q_MAX div (max - min)``
    maps min→0, max→Q_MAX)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("x"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    stats = o.agg(
        F.min("x").alias("x_lo"),
        F.max("x").alias("x_hi"),
        F.min("y").alias("y_lo"),
        F.max("y").alias("y_hi"),
    )
    q = o.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        "x",
        "y",
        F.expr(f"((x - x_lo) * {Q_MAX}) div (x_hi - x_lo)").alias("qx"),
        F.expr(f"((y - y_lo) * {Q_MAX}) div (y_hi - y_lo)").alias("qy"),
    )
    return q.withColumn("z", F.expr(_morton16("qx", "qy", "div")))


def zorder_bucket_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs single-dimension-sort layout quality over orders.

    Buckets orders two ways — ``zorder`` (top byte of the 16-bit Morton code
    of quantized (order date, price), i.e. a 16×16 grid cell) and ``xsort``
    (the quantized date alone — what a date-sorted write produces) — and
    reports, per layout: the per-bucket quantized span totals in BOTH
    dimensions (Z buckets are tight in both; xsort buckets span the entire
    price axis) and the zone-map prune counts for the fixed 2-D predicate.
    One row per layout, all-BIGINT columns."""
    q = _quantized_orders(spark, sf_dir)
    zb = q.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"z div {Z_BUCKET_DIV}").alias("bucket"),
        "x",
        "y",
        "qx",
        "qy",
    )
    xb = q.select(
        F.lit("xsort").alias("layout"),
        F.col("qx").alias("bucket"),
        "x",
        "y",
        "qx",
        "qy",
    )
    buckets = (
        zb.unionByName(xb)
        .groupBy("layout", "bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.max("qx") - F.min("qx")).alias("x_span"),
            (F.max("qy") - F.min("qy")).alias("y_span"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
    pruned = (
        (F.col("x_max") < Z_PRED_X_LO)
        | (F.col("x_min") >= Z_PRED_X_HI)
        | (F.col("y_max") < Z_PRED_Y_LO)
        | (F.col("y_min") >= Z_PRED_Y_HI)
    )
    return (
        buckets.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("x_span").alias("sum_x_span"),
            F.max("x_span").alias("max_x_span"),
            F.sum("y_span").alias("sum_y_span"),
            F.max("y_span").alias("max_y_span"),
            F.sum(pruned.cast("long")).alias("n_pruned"),
            F.sum(F.when(pruned, F.col("cnt")).otherwise(0)).alias(
                "rows_skipped"
            ),
        )
        .orderBy("layout")
    )


def _zorder_oracle() -> str:
    z = _morton16("qx", "qy", "//")
    return f"""
    WITH o AS (
      SELECT o_orderkey, epoch_us(o_orderdate) AS x,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS y
      FROM orders),
    stats AS (
      SELECT min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi
      FROM o),
    q AS (
      SELECT o_orderkey, x, y,
             ((x - x_lo) * {Q_MAX}) // (x_hi - x_lo) AS qx,
             ((y - y_lo) * {Q_MAX}) // (y_hi - y_lo) AS qy
      FROM o CROSS JOIN stats),
    zq AS (SELECT *, {z} AS z FROM q),
    tagged AS (
      SELECT 'zorder' AS layout, z // {Z_BUCKET_DIV} AS bucket, x, y, qx, qy
      FROM zq
      UNION ALL
      SELECT 'xsort' AS layout, qx AS bucket, x, y, qx, qy FROM zq),
    buckets AS (
      SELECT layout, bucket, count(*) AS cnt,
             max(qx) - min(qx) AS x_span, max(qy) - min(qy) AS y_span,
             min(x) AS x_min, max(x) AS x_max,
             min(y) AS y_min, max(y) AS y_max
      FROM tagged GROUP BY layout, bucket),
    flagged AS (
      SELECT *, (x_max < {Z_PRED_X_LO} OR x_min >= {Z_PRED_X_HI}
                 OR y_max < {Z_PRED_Y_LO} OR y_min >= {Z_PRED_Y_HI})
               AS pruned
      FROM buckets)
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(x_span) AS BIGINT) AS sum_x_span,
           CAST(max(x_span) AS BIGINT) AS max_x_span,
           CAST(sum(y_span) AS BIGINT) AS sum_y_span,
           CAST(max(y_span) AS BIGINT) AS max_y_span,
           CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned,
           CAST(sum(CASE WHEN pruned THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_skipped
    FROM flagged GROUP BY layout ORDER BY layout
    """


ORACLES: dict[str, str] = {
    "zonemap_prune_stats": _zonemap_oracle(),
    "zorder_bucket_spans": _zorder_oracle(),
}
