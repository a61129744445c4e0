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
