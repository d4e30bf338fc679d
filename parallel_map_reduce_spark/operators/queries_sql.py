"""The SQL interface: the same engine driven by ANSI SQL text instead of
the DataFrame API.

The reference has no query language at all (its one query is compiled
in, SURVEY §3); this module closes the loop on "DataFrame / SQL" parity:
each query here is ONE ANSI-SQL string executed by BOTH engines —
``spark.sql`` over registered temp views on the Spark side, DuckDB on
the oracle side. A single source of truth, two independent executors,
value-hash-compared by the driver. Catalyst treats the parsed text
identically to the equivalent DataFrame calls (same unresolved logical
plan), so every optimization the DataFrame queries get — pushdown,
broadcast, partial agg — applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parallel_map_reduce_spark.registry import register
from parallel_map_reduce_spark.sources.tables import load_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register every testdata table as a temp view and run the query
    text. Views are lazy (no scan happens at registration), so this
    costs nothing beyond the query itself."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_SQL_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

_SQL_TOP_SEGMENTS = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
WHERE o_orderstatus <> 'F'
GROUP BY c_mktsegment
ORDER BY revenue DESC, c_mktsegment ASC
"""


@register("sql_interface_q6", _SQL_Q6)
def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 as raw SQL text — the SAME string is the DuckDB oracle;
    Spark parses it into the identical logical plan the DataFrame
    version produces (pushdown and partial agg included)."""
    return run_sql(spark, sf_dir, _SQL_Q6)


@register("sql_interface_segments", _SQL_TOP_SEGMENTS)
def q_sql_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + total order, single ANSI text for both
    engines. The customer side broadcasts exactly as in the DataFrame
    twin — SQL entry does not change the physical strategy."""
    return run_sql(spark, sf_dir, _SQL_TOP_SEGMENTS)


_SQL_RECURSIVE_MONTHS = """
WITH RECURSIVE months(m) AS (
  SELECT CAST(TIMESTAMP '1996-01-01 00:00:00' AS TIMESTAMP)
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '1996-12-01 00:00:00'
),
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(months.m AS TIMESTAMP) AS month_start,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(revenue, 0.0) AS revenue
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""


@register("sql_interface_recursive_months", _SQL_RECURSIVE_MONTHS)
def q_sql_recursive_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE executed by BOTH engines from one ANSI text —
    Spark 4 added WITH RECURSIVE, so the month spine + zero-filled monthly
    revenue rollup that previously only the DuckDB oracle could run now
    runs natively under Catalyst too. The recursion generates a
    constant-bounded 12-row spine (driver-side-trivial at any corpus
    size); the data-sized work stays one partial+final agg on the month
    key plus a broadcast-sized left join against the spine."""
    return run_sql(spark, sf_dir, _SQL_RECURSIVE_MONTHS)


_SQL_LATERAL_TOPN = """
SELECT n_name, c_custkey, c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) top_c
"""


@register("sql_interface_lateral_topn", _SQL_LATERAL_TOPN)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    customers by account balance per nation) from ONE ANSI text run by
    both engines.  Catalyst decorrelates the lateral into a
    ranked-window join — the same physical shape as the DataFrame
    row_number() top-N idiom — so the per-group LIMIT never materializes
    the full per-nation sort at scale."""
    return run_sql(spark, sf_dir, _SQL_LATERAL_TOPN)
