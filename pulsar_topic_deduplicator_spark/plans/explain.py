"""Physical-plan inspection helpers.

The scale guarantees this engine claims (filter pushdown into the parquet
scan, column pruning, broadcast dimension joins, bounded shuffle counts) are
properties of the *plan*, not the code style — so tests assert them from
``explain("formatted")`` output instead of trusting the DataFrame DSL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (column pruning)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    The formatted plan lists each Exchange node's partitioning on an
    ``Arguments:`` detail line."""
    plan = formatted_plan(df)
    return len(
        re.findall(
            r"Arguments: (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )
