"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a ``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, then compares row count, column names, and
order-insensitive cell values — strict equality, same as a value-hash.
"""

from __future__ import annotations

import math

import duckdb

from pulsar_topic_deduplicator_spark.sources.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — doubles must match bit-for-bit
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_cell(r[i]) for i in order) for r in rows)


# Spark simpleString → DuckDB type names the driver's typed value-hash treats
# as equal. Anything outside the map (HUGEINT, INT128, widened DECIMALs from
# sum(int)/count_if) hashes differently even when the Python values compare
# equal — the round-1 conditional_agg_demo / sessionize_events failure mode.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}  # NOT HUGEINT/DECIMAL
_TYPE_COMPAT = {
    "tinyint": _INTS,
    "smallint": _INTS,
    "int": _INTS,
    "bigint": _INTS,
    "float": {"FLOAT"},
    "double": {"DOUBLE"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "binary": {"BLOB"},
}


def _types_compatible(spark_type: str, duck_type: str) -> bool:
    if spark_type in _TYPE_COMPAT:
        return duck_type in _TYPE_COMPAT[spark_type]
    if spark_type.startswith("decimal"):
        return duck_type.replace(" ", "") == spark_type.upper().replace(" ", "")
    if spark_type.startswith("timestamp"):
        return duck_type.startswith("TIMESTAMP")
    if spark_type.startswith("array<"):
        inner = spark_type[6:-1]
        return duck_type.endswith("[]") and _types_compatible(inner, duck_type[:-2])
    return True  # map/struct: values-only comparison


def type_check(spark_df, rel) -> str | None:
    """Return a description of the first Spark↔DuckDB output-type mismatch
    (in sorted-column order, as the driver hashes), or None if compatible."""
    s = sorted((f.name, f.dataType.simpleString()) for f in spark_df.schema.fields)
    d = sorted((c.lower(), str(t)) for c, t in zip(rel.columns, rel.types))
    for (sn, st), (dn, dt) in zip(s, d):
        if sn == dn and not _types_compatible(st, dt):
            return f"column {sn}: spark={st} duck={dt}"
    return None


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    result = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(c.lower() for c in d_cols),
        "match": False,
        "first_diff": None,
    }
    if sorted(c.lower() for c in s_cols) != result["cols_duck"]:
        result["first_diff"] = "column names differ"
        return result
    type_diff = type_check(spark_df, rel)
    if type_diff is not None:
        result["first_diff"] = f"output types differ: {type_diff}"
        return result
    if len(s_rows) != len(d_rows):
        result["first_diff"] = "row counts differ"
        return result
    ns = normalize(s_cols, s_rows)
    nd = normalize(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(ns, nd)):
        if a != b:
            result["first_diff"] = f"row {i}: spark={a} duck={b}"
            return result
    result["match"] = True
    return result
