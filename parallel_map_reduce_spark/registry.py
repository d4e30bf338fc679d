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


# The driver's correctness check covers the FIRST 50 registry entries per
# round — exactly _WINDOW slots; _load_all() fails loud if this list
# exceeds that or names a query that doesn't exist.  Round-7 rotation
# (PLANS.md "Round-6 window plan", re-issued verbatim by VERDICT r6
# "Next round" #1 because round 6 never applied it): the 8 round-5b
# staged operators registered this round come first (every new query
# must be in-window its first round), then queries NEW in round 7,
# then the 23 r2-latest rows, then the oldest r3-latest rows filling
# the window.  Names not listed keep registration order after these.
_WINDOW = 50
_PRIORITY: list[str] = [
    # 1) the 8 staged registrations — first driver row this round
    "gopher_repetition_stats",
    "bpe_encode_stats",
    "gopher_quality_stats",
    "dsir_importance_weights",
    "soft_dedup_weights",
    "weighted_systematic_sample",
    "snapshot_diff",
    "streaming_incremental_dedup",
    # 1b) queries NEW in round 7 (first driver row this round)
    "pipeline_curate_corpus",
    "knn_ivf_ann_stored",
    "retract_and_readmit",
    "incremental_lsh_dedup_compacted",
    "knn_ivf_ann_appended",
    "knn_pq_ann",
    "knn_ivfpq_ann",
    "knn_sq_ann",
    "knn_opq_ann",
    "knn_pq_ann_stored",
    "knn_pq_ann_appended",
    "knn_ivfpq_ann_stored",
    # 1c) round-7 code-touched: every registered consumer of the shared
    # sequential-fold Gram kernel (functions/gram.py replaced the three
    # hand-copies in similarity.py / curation_extras.py) re-windows so
    # no row is older than the code under it
    "embedding_near_dup_pairs",
    "embedding_near_dup_lsh",
    "semantic_dedup_keep_corpus",
    "semantic_dedup_keep_corpus_ann",
    "semantic_dedup_cluster_sharded",
    "knn_ivf_ann",
    # 2) the 23 r2-latest rows (round-2 row order)
    "cube_flag_status",
    "pivot_status_revenue",
    "string_functions",
    "date_functions",
    "math_functions",
    "conditional_bucketing",
    "events_by_type",
    "events_json_props",
    "events_tumbling_window",
    "tpch_q4_order_priority",
    "tpch_q6_revenue_forecast",
    "tpch_q10_returned_items",
    "grouping_sets_revenue",
    "salted_count_distinct_users",
    "skew_salted_join_top_words",
    "unpivot_lineitem_measures",
    "tpch_q14_promo_revenue",
    "tpch_q7_nation_volume",
    "array_map_functions",
    "tpch_q13_order_distribution",
    "map_functions_events",
    "array_agg_priorities",
    "tpch_q15_top_supplier",
    # 3) 19 oldest r3-latest rows (heaviest / refactor-adjacent first);
    # tail items here are displaced one-for-one by group-4 entries as
    # round 7 registers new queries or touches implementations
    "tpch_q17_small_qty_revenue",
    # tpch_q18_large_volume_customer / tpch_q19_disjunctive_revenue /
    # tpch_q22_dormant_customers / tpch_q8_market_share /
    # events_session_windows / events_sessionization / funnel_conversion /
    # cohort_retention / simhash_near_pairs displaced one-for-one by the
    # nine group-1b queries registered late in round 7; they roll to the
    # round-8 window with the rest of the r3/r4 backlog.
]


def _prioritized(d: dict) -> dict:
    head = {n: d[n] for n in _PRIORITY if n in d}
    tail = {n: v for n, v in d.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _prioritized(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _prioritized(_ORACLES)


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
    from parallel_map_reduce_spark.operators import queries_streaming  # noqa: F401
    from parallel_map_reduce_spark.operators import queries_curation  # noqa: F401

    # A typo'd _PRIORITY name would silently waste one of the driver's
    # check slots (the dict comprehension would just skip it), and a list
    # longer than the window silently drops its tail outside driver
    # coverage (bit round 3: 54 names for 50 slots).  Real exceptions,
    # not asserts — `python -O` strips asserts.
    missing = set(_PRIORITY) - set(_QUERIES)
    if missing:
        raise RuntimeError(f"_PRIORITY names not in registry: {sorted(missing)}")
    if len(_PRIORITY) != len(set(_PRIORITY)):
        raise RuntimeError("_PRIORITY contains duplicate names")
    if len(_PRIORITY) > _WINDOW:
        raise RuntimeError(
            f"_PRIORITY has {len(_PRIORITY)} names but the driver window "
            f"is {_WINDOW} — the tail would silently miss coverage"
        )

    _LOADED = True
