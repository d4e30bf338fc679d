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
# exceeds that or names a query that doesn't exist.  Round-11 rotation
# (VERDICT r10 "Next round" #1, fill queue recomputed by
# tools/window_plan.py --assume-next 11): queries NEW in round 11
# first, then round-11 code-touched queries, then the OLDEST r6-latest
# rows (all 16, r6 row order), then the oldest r7 rows filling the
# remaining slots in r7 row order. Names not listed keep registration
# order after these.
_WINDOW = 50
_PRIORITY: list[str] = [
    # 1) NEW in round 11 — first driver row this round
    "knn_opq_ivfadc_stored",
    # 1b) round-11 code-touched. The store recover/compact critical
    # section gained the flock-based store_lock (recovery fast path +
    # locked compactors), so every registered row that opens, appends
    # to, or compacts a persisted store re-windows; the PQ/IVFADC
    # builders additionally gained the shared_codebook×rotation
    # resolver. knn_range_ivfsq_stored also carries the prefilter
    # rounding-slack fix; semantic_decontaminate the empty-eval
    # sentinel + oracle mirror; pipeline_curate_corpus the new trained
    # quality-classifier stage (stage 04, stages renumbered).
    "knn_ivf_ann_stored",
    "knn_ivf_ann_appended",
    "knn_range_ivf_stored",
    "knn_ivfpq_ann_stored",
    "knn_pq_ann_stored",
    "knn_pq_ann_appended",
    "knn_pq_compacted",
    "knn_ivfadc_compacted",
    "knn_opq_ann_stored",
    "knn_sq_ann_stored",
    "knn_ivfsq_ann_stored",
    "knn_range_ivfsq_stored",
    "incremental_lsh_dedup_compacted",
    "ism_audit_query",
    "incremental_semantic_dedup_chain",
    "semantic_decontaminate",
    "pipeline_curate_corpus",
    # (quality_classifier_train/_filter NOT re-windowed: the oracle
    # builder refactor is proven byte-identical — see PLANS.md r11 —
    # and their Spark callables are untouched.)
    # 2) the 16 r6-latest rows (r6 row order) — the freshness-debt
    # paydown VERDICT r10 #1 prescribes; after this round no query's
    # latest green predates r7.
    "tpch_q5_local_supplier_volume",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "outer_join_nation_counts",
    "scalar_subquery_above_avg",
    "sort_limit_top_orders",
    "union_distinct_nations",
    "intersect_nations",
    "except_nations",
    "window_rank_orders_per_customer",
    "window_rolling_events",
    "wordcount_per_doc",
    "word_totals",
    "wordcount_rdd",
    "window_lag_lead",
    "rollup_region_nation",
    # 3) oldest r7 rows (r7 row order; pipeline_curate_corpus already
    # holds a touched slot above) fill the remaining 16; the r7 tail
    # rolls to round 12.
    "gopher_repetition_stats",
    "bpe_encode_stats",
    "gopher_quality_stats",
    "dsir_importance_weights",
    "soft_dedup_weights",
    "weighted_systematic_sample",
    "snapshot_diff",
    "streaming_incremental_dedup",
    "retract_and_readmit",
    "knn_pq_ann",
    "knn_ivfpq_ann",
    "knn_opq_ann",
    "embedding_near_dup_pairs",
    "embedding_near_dup_lsh",
    "semantic_dedup_keep_corpus",
    "semantic_dedup_keep_corpus_ann",
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
