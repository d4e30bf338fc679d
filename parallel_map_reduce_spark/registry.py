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
# exceeds that or names a query that doesn't exist.  Round-4 rotation
# (VERDICT r3 "Next round" #1): freshness — lead with the 24 queries whose
# latest driver row is r1 (several sit on code refactored in r2-r4), then
# the full-oracle upgrades whose newest row predates their oracle
# (approx_aggregates r2-no_oracle; the four ANN audits new in r4;
# semantic exact twin now on the blocked Gram kernel), round-4-new
# queries, the flagship anchors that fell off at r3 slots 51-54, and the
# heaviest r2-latest rows in the remaining slots.  Names not listed keep
# registration order after these.
_WINDOW = 50
_PRIORITY: list[str] = [
    # r1-stale (latest driver row is round 1; code under several refactored
    # since — minhash/simhash/jaccard materialization r3, knn audits r4)
    # bigram_frequencies / doc_fingerprints / lang_id / dedup_exact /
    # curate_top_docs_per_lang / token_stats / multimodal_metadata_by_kind:
    # r1-green and
    # bit-unchanged since r1 (git log -L on each implementation and on
    # functions/{tokenize,hashing}.py) — their rows already postdate
    # their code, so they cede slots to the round-4c batch below;
    # re-window them in round 5.
    "bm25_search",
    "bpe_token_stats",
    "chunk_documents",
    "dedup_exact_groups",
    "dedup_group_assignment",
    "dedup_keep_corpus",
    "embedding_near_dup_pairs",
    "knn_bruteforce",
    "knn_ivf_ann",
    "knn_lsh_ann",
    "minhash_signatures",
    "multimodal_features",
    "multimodal_frame_samples",
    "ngram_jaccard_pairs",
    "quality_scores",
    "simhash_signatures",
    "unigram_lm_doc_scores",
    # full-oracle upgrades whose newest driver row predates the oracle,
    # plus the exact twin that moved onto the blocked Gram kernel in r4
    "approx_aggregates",
    "embedding_near_dup_lsh",
    "semantic_dedup_keep_corpus_ann",
    "semantic_dedup_keep_corpus",
    # round-4 new, plus r3-green rows whose code the r4 imaging /
    # streaming-sink changes touched (rows must postdate the code)
    "multimodal_pixel_stats",
    "multimodal_real_decode",
    "streaming_sliding_means",
    "streaming_dedup_user_totals",
    "streaming_stream_stream_join",
    "streaming_tumbling_counts",
    "streaming_running_user_totals",
    "duplicated_span_stats",
    "substring_dedup_corpus",
    # r4 code changes: prefix-tier dictionary rework (VERDICT r3 #4) and
    # connected-components pointer jumping — every components consumer
    # whose latest green row (r3) predates the r4 CC change re-windows
    # here so no row is older than the code under it
    "ngram_jaccard_pairs_prefix",
    "dedup_group_assignment_lsh",
    "dedup_keep_corpus_lsh",
    "pipeline_training_batches",
    "pipeline_training_batches_lsh",
    # round-4b/4c new queries (never driver-checked — must be in-window;
    # they displace first the four heaviest r2-latest rows and then the
    # flagship anchors (wordcount / wordcount_topk / tpch_q1 / tpch_q3,
    # code unchanged since their r2 green rows, so those rows stay valid
    # — the anchors re-window in round 5 once this batch has its rows)
    "hybrid_retrieval_rrf",
    "heavy_hitters_tokens",
    "domain_mixture_resample",
    "quality_quantile_filter",
    "pii_redaction_stats",
    "line_dedup_stats",
    "embedding_cluster_assign",
    "sql_interface_lateral_topn",
    "embedding_kmeans_refine",
    "bpe_merge_pairs",
    "tfidf_top_terms",
    "event_transition_matrix",
    "multimodal_resize_stats",
    "streaming_session_windows",
    "data_quality_audit",
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
