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
# exceeds that or names a query that doesn't exist.  Round-8 rotation
# (PLANS.md "Round-8 window plan", re-issued by VERDICT r7 "Next round"
# #1): queries NEW in round 8 first (every new query must be in-window
# its first round), then round-8 code-touched queries, then ALL 37
# r3-latest rows (the 18 displaced from r7 planning + the 19 already
# scheduled), then the OLDEST r4-latest rows filling the window —
# after this round no query's latest driver row is older than r4.
# Names not listed keep registration order after these.
_WINDOW = 50
_PRIORITY: list[str] = [
    # 1) queries NEW in round 8 — first driver row this round
    "tpch_q12_shipmode_priority",
    "tpch_q21_waiting_suppliers",
    "kmeans_train_converged",
    "semantic_dedup_sharded_miss_audit",
    "knn_range_ivf",
    "knn_range_ivf_stored",
    # 1b) round-8 code-touched: cluster_sharded_pairs gained the
    # hot-cluster block-pair decomposition (and the registered query now
    # exercises it via block_above=40); ivfpq_query_stored now honors a
    # persisted rotation; compact_store_slices' crash ordering changed
    # under incremental_lsh_dedup_compacted
    "semantic_dedup_cluster_sharded",
    "knn_ivfpq_ann_stored",
    "incremental_lsh_dedup_compacted",
    # 2) the 18 r3-latest rows displaced from round-7 planning
    "ngram_jaccard_pairs_capped",
    "decontaminate_corpus",
    "pipeline_clean_corpus",
    "doc_repetition_stats",
    "asof_join_purchase_to_view",
    "interval_join_event_pairs",
    "hll_mergeable_daily_users",
    "stats_aggregates",
    "simhash_block_near_pairs",
    "cohort_retention",
    "simhash_near_pairs",
    "funnel_conversion",
    "events_sessionization",
    "events_session_windows",
    "tpch_q8_market_share",
    "tpch_q22_dormant_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q18_large_volume_customer",
    # 3) the 19 remaining r3-latest rows (r3 row order) — with these,
    # every r3 row re-verifies this round
    "dataset_split_assignment",
    "pack_batches_by_budget",
    "inverted_index_postings",
    "stratified_sample_deterministic",
    "intersect_all_nations",
    "except_all_nations",
    "window_value_functions",
    "ansi_safe_functions",
    "sql_interface_recursive_months",
    "udaf_geomean_price",
    "grouped_zscore_events",
    "udtf_token_lengths",
    "sql_interface_q6",
    "sql_interface_segments",
    "window_ntile_quartiles",
    "window_time_range_sum",
    "latest_event_per_user",
    "daily_revenue_gapfill",
    "events_variant_extract",
    # 4) oldest r4-latest rows (r4 row order) fill the window; the rest
    # of the r4 batch rolls to round 9
    "dedup_exact_groups",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_signatures",
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
