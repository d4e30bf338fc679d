"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator claimed done in SURVEY.md §2 gets a ``queries()`` entry
here; SQL-expressible ones also get an ``oracle_sql()`` entry with
IDENTICAL column names/types so the driver's order-insensitive value-hash
matches. Computed doubles are rounded to a fixed precision on BOTH sides
so summation-order ulp differences between engines don't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, with an
    optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that contains @register declarations."""
    global _LOADED
    if _LOADED:
        return
    # Import order determines registry dict order, which determines which
    # queries land in the driver's bounded check window: the flagship
    # wordcount family and the relational/TPC-H core must come first.
    from parallel_map_reduce_spark.operators import queries_wordcount  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_relational  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_sessions  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_udf  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_temporal  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_sql  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_llm  # noqa: F401

    _LOADED = True
