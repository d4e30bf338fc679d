"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``parallel_map_reduce_spark``; this module is the
thin registry mapping SURVEY.md §2's operator inventory to (Spark
callable, DuckDB oracle SQL) pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parallel_map_reduce_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word-count over sf0.001 documents (the reference
    engine's entire query surface — SURVEY.md §2.2)."""
    from parallel_map_reduce_spark.operators.wordcount import wordcount
    from parallel_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return wordcount(docs, "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    genuinely non-SQL-expressible ops → driver does rows-only check)."""
    return registry.oracle_sql()
