"""SQL-surface tier: the engine as a SQL engine, not just a DataFrame API.

The reference has no query language (env-var config only — SURVEY.md §2.3);
Spark SQL is what the engine gains for free. These queries register the
test tables as temp views and execute ANSI SQL TEXT through
``spark.sql(...)`` — the SAME text DuckDB runs as the oracle, proving the
two engines agree on parsing + semantics, not just on hand-matched plans.
Catalyst produces identical plans for SQL and DataFrame formulations, so
the scale properties (pushdown, broadcast, partial agg) carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


#: ANSI SQL runnable verbatim by BOTH Spark and DuckDB.
PORTABLE_SQL: dict[str, str] = {
    "sql_revenue_by_nation": """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "sql_order_priority_count": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority
    """,
    # explicit GROUPING SETS with grouping() markers — completes the
    # grouping-sets family next to the DataFrame rollup/cube queries
    "sql_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    # manual pivot via conditional aggregation (count-exact on both engines)
    "sql_case_pivot_status": """
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    # "above the nation's average balance", phrased multiplicatively
    # (value*count > sum) so both engines compare identical doubles — a
    # floating avg() would round differently per accumulation order
    "sql_correlated_subquery_avg": """
        SELECT c_mktsegment,
               count(*) AS n_above_avg
        FROM customer c
        WHERE c_acctbal * (SELECT count(*) FROM customer
                           WHERE c_nationkey = c.c_nationkey)
              > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 FROM customer WHERE c_nationkey = c.c_nationkey)
        GROUP BY c_mktsegment
    """,
}


def _make_sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES = {name: _make_sql_query(sql) for name, sql in PORTABLE_SQL.items()}

# the oracle IS the same text
ORACLES: dict[str, str] = dict(PORTABLE_SQL)
