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
# round.  Rounds 1-2 covered the flagship + relational core (81 distinct
# names); this window lists every query that has never had a driver
# CORRECTNESS row, plus the r1-red queries whose fixes landed in r2 but
# never re-entered the window, plus round-3-new queries.  Names not listed
# keep registration order after these.  (VERDICT.md round 2, item 1.)
_PRIORITY: list[str] = [
    # round-3 new: streaming engine, LSH component twins, curation ops
    "streaming_tumbling_counts",
    "streaming_running_user_totals",
    "dedup_group_assignment_lsh",
    "dedup_keep_corpus_lsh",
    "semantic_dedup_keep_corpus",
    "semantic_dedup_keep_corpus_ann",
    "decontaminate_corpus",
    "stratified_sample_deterministic",
    "doc_repetition_stats",
    "simhash_near_pairs",  # oracle upgraded r3: rows-only -> full value-hash
    # (approx_aggregates also upgraded r3 but its r2 row was rows-only, not
    # red — it yields its window slot to the minhash_lsh red-fix below)
    "intersect_all_nations",
    "except_all_nations",
    "window_value_functions",
    "ansi_safe_functions",
    "sql_interface_recursive_months",
    # never driver-checked: UDF / sessions / temporal / SQL-interface
    "udaf_geomean_price",
    "grouped_zscore_events",
    "udtf_token_lengths",
    "events_sessionization",
    "events_session_windows",
    "funnel_conversion",
    "cohort_retention",
    "asof_join_purchase_to_view",
    "interval_join_event_pairs",
    "sql_interface_q6",
    "sql_interface_segments",
    # never driver-checked: r2 scale tiers
    "ngram_jaccard_pairs_capped",
    "ngram_jaccard_pairs_prefix",
    "simhash_block_near_pairs",
    "embedding_near_dup_lsh",
    "multimodal_real_decode",
    "pipeline_training_batches_lsh",
    # never driver-checked: relational stragglers
    "tpch_q8_market_share",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    "window_ntile_quartiles",
    "window_time_range_sum",
    "stats_aggregates",
    "latest_event_per_user",
    "daily_revenue_gapfill",
    "hll_mergeable_daily_users",
    "events_variant_extract",
    # r1-red fixes from r2 that never re-entered the window
    "pipeline_clean_corpus",
    "dataset_split_assignment",
    "pack_batches_by_budget",
    "pipeline_training_batches",
    "inverted_index_postings",
    "minhash_lsh_dedup_pairs",
    # remaining slots: keep the flagship + heaviest relational anchors green
    "wordcount",
    "wordcount_topk",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
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

    # A typo'd _PRIORITY name would silently waste one of the driver's 50
    # check slots (the dict comprehension would just skip it) — fail loud.
    missing = set(_PRIORITY) - set(_QUERIES)
    assert not missing, f"_PRIORITY names not in registry: {sorted(missing)}"

    _LOADED = True
