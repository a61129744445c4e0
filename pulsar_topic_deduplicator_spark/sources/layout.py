"""Physical data layout: partitioned sinks and bucketed tables.

At 100 TB, layout IS the optimization: a date/category-partitioned sink
gives partition PRUNING (untouched directories are never listed), and
bucketing both sides of a recurring join on the join key gives co-located,
shuffle-free joins. These helpers wrap the standard Spark mechanisms; the
plan-level guarantees (PartitionFilters, no Exchange) are asserted in
tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout: one directory per partition value.
    Readers filtering on ``partition_cols`` prune at the file-listing level
    (shows as PartitionFilters in the scan, not PushedFilters)."""
    (df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path))


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Two
    tables bucketed on the same key with the same bucket count join WITHOUT
    a shuffle — each bucket pair joins locally."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction — the standard follow-up job for any streaming
    sink (each micro-batch writes at least one file per partition, and a
    long-running ingest degrades into millions of KB-sized files whose
    LISTING alone dominates scan time at 100 TB).

    Sizing is measured, not guessed: the source tree is walked through the
    Hadoop FileSystem API (works on any Spark-supported FS, not just
    local), and the output partition count is ceil(bytes / target_mb) — so
    output files land near the FS block / row-group sweet spot regardless
    of how fragmented the input was. The rewrite is one repartition
    (round-robin — balanced output sizes with no key skew) into a fresh
    directory; callers swap directories atomically at the catalog/manifest
    level, which is why dst is not an in-place overwrite.

    A Hive-partitioned source tree (``col=value`` directories) is detected
    from the file paths and PRESERVED: the rewrite goes through
    ``partitionBy`` on the same columns, so partition pruning keeps working
    on the compacted copy (flattening the tree would silently turn pruned
    scans into full scans — the exact failure mode compaction exists to
    prevent).

    Returns the compaction report (input file count/bytes, output
    partition count, preserved partition columns) so an orchestrator can
    log/act on it."""
    import math

    df = spark.read.format(fmt).load(src_path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = root.getFileSystem(hconf)
    root_uniform = fs.makeQualified(root).toString().rstrip("/")
    files = fs.listFiles(root, True)
    total_bytes = 0
    n_files = 0
    part_cols: list[str] = []
    while files.hasNext():
        st = files.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # commit markers / checksums, not data
        total_bytes += st.getLen()
        n_files += 1
        # partition columns = the ordered col=value directory levels between
        # the root and the file (identical for every file in a valid tree;
        # the first data file is representative)
        if not part_cols:
            rel = fs.makeQualified(st.getPath()).toString()[len(root_uniform):]
            part_cols = [
                seg.split("=", 1)[0]
                for seg in rel.strip("/").split("/")[:-1]
                if "=" in seg
            ]
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    writer = df.repartition(n_out).write.mode("overwrite").format(fmt)
    if part_cols:
        # round-robin + partitionBy can emit up to n_out files per partition
        # value — fine for the target regime (few, large partitions); a tree
        # with thousands of tiny partition values should be compacted
        # per-partition instead of through this helper
        writer = writer.partitionBy(*part_cols)
    writer.save(dst_path)
    return {
        "n_input_files": n_files,
        "input_bytes": total_bytes,
        "n_output_partitions": n_out,
        "partition_columns": part_cols,
    }


#: z-order bits per dimension: 8 bits × up to 4 dims stays inside a long
ZORDER_BITS = 8


def zorder_value(df: DataFrame, cols: list[str]):
    """Z-order (Morton) key column for ``cols``: each column is scaled to a
    ``ZORDER_BITS``-bit bucket between its min and max, and the bucket bits
    are interleaved — rows close in the key are close in EVERY listed
    column, so range predicates on any of them cluster into few files.

    This is the multi-column complement of partitioning/bucketing: a
    Hive partition handles ONE coarse column; sorting handles one ordered
    column; z-ordering gives min/max file-skipping on several numeric
    columns at once (the Delta/Iceberg OPTIMIZE ZORDER idea, built from
    plain expressions). The min/max calibration is one aggregate row —
    scalar-sized driver data, same budget as a broadcast codebook; at
    100 TB use a sampled calibration or known domain bounds instead.

    All bit math is built-in integer expressions (codegen'd); nulls sort
    into bucket 0.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    max_bucket = (1 << ZORDER_BITS) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn = float(stats[f"mn_{c}"])
        span = float(stats[f"mx_{c}"]) - mn
        scaled = (
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span or 1.0))
            * max_bucket
        )
        bucket = F.least(
            F.greatest(F.coalesce(scaled, F.lit(0.0)), F.lit(0.0)),
            F.lit(float(max_bucket)),
        ).cast("long")
        for bit in range(ZORDER_BITS):
            # bit b of column ci lands at interleaved position b*n_cols + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + ci,
                )
            )
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Rewrite ``df`` clustered by the z-order key: range-partition on the
    key (so each output file owns a contiguous z-range) and sort within
    files (so parquet row-group min/max stats are tight). Readers filtering
    on any of ``cols`` then skip most files on footer stats alone —
    measured in tests/test_layout.py against a round-robin layout."""
    (
        df.withColumn("__z", zorder_value(df, cols))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
