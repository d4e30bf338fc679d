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
# exceeds that or names a query that doesn't exist.  Round-10 rotation
# (PLANS.md "Round-10 window plan", re-issued by VERDICT r9 "Next round"
# #1): queries NEW in round 10 first (every new query must be in-window
# its first round), then round-10 code-touched queries, then the OLDEST
# r6-latest rows filling the window in r6 row order (the new/touched
# head displaces the youngest fills one-for-one; the displaced r6 tail
# and the 4 oldest r7 rows roll to round 11).
# Names not listed keep registration order after these.
_WINDOW = 50
_PRIORITY: list[str] = [
    # 1) queries NEW in round 10 — first driver row this round
    "ism_audit_query",
    "knn_ivfadc_compacted",
    "incremental_semantic_dedup_chain",
    "knn_pq_compacted",
    "knn_opq_ann_stored",
    "knn_sq_ann_stored",
    "knn_ivfsq_ann_stored",
    "semantic_decontaminate",
    "quality_classifier_train",
    "quality_classifier_filter",
    "streaming_quality_filter",
    "knn_range_ivfsq_stored",
    # 1b) round-10 code-touched: recover_store_slices was restructured
    # (the _old_ listing moved after the staging-dir check) — every
    # stored reader, appender, and compaction entry runs it, so all
    # stored/appended/compacted rows re-window; the PQ/IVFADC stored
    # readers and all three appenders additionally GAINED
    # recovery-at-entry this round (the r9 deferral closed).
    "knn_ivf_ann_stored",
    "knn_ivf_ann_appended",
    "knn_range_ivf_stored",
    "knn_ivfpq_ann_stored",
    "knn_pq_ann_stored",
    "knn_pq_ann_appended",
    "incremental_lsh_dedup_compacted",
    # knn_sq_ann: its sq_ann implementation refactored onto the shared
    # _sq_encode_expr/_sq_decode_expr/_sq_score_refine helpers the new
    # persisted store uses (answers pytest-pinned identical)
    "knn_sq_ann",
    # 2) oldest r6-latest rows (r6 row order) fill the window; the
    # displaced r6 tail (wordcount_per_doc on) + the 4 oldest r7 rows
    # roll to round 11
    "doc_fingerprints",
    "bigram_frequencies",
    "multimodal_metadata_by_kind",
    "curate_top_docs_per_lang",
    "wordcount",
    "wordcount_topk",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "bloom_decontaminate",
    "sample_exact_n",
    "stratified_exact_n",
    "containment_pairs",
    "cdc_chunks",
    "incremental_lsh_dedup",
    "incremental_lsh_dedup_stored",
    "bigram_lm_doc_scores",
    "ccnet_perplexity_buckets",
    "quality_quantile_filter_approx",
    "publish_dataset_roundtrip",
    "bpe_train_vocab",
    "minhash_lsh_dedup_pairs",
    "dedup_group_assignment_lsh",
    "dedup_keep_corpus_lsh",
    "pipeline_training_batches_lsh",
    "filter_project",
    "distinct_values",
    "agg_global",
    "count_distinct",
    "percentiles",
    "join_orders_customer",
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
