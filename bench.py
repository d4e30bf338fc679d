#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced to full execution with the noop sink (no driver
collect — measures the distributed plan, not row serialization to the
driver). Reference baseline context (BASELINE.md): the reference engine
aggregates ~30 MB/s of text on 16 threads; Spark's fixed job overhead is
~1-2 s, so per-query seconds at sf0.1 are dominated by real work only for
the heavier queries.

Coverage note: HEADLINE is the flagship + one representative per
operator family plus every row whose cost is worth tracking — NOT the
full registry. Deliberately excluded classes: sub-second relational /
scalar-function rows (timing = fixed job overhead, no signal), the
four unbenched streaming-engine rows (each is a full micro-batch
engine run of pure scheduler overhead; two benched rows already track
that path), and oracle-only audit variants whose ship twin is benched.
Correctness for ALL registered queries is the driver's CORRECTNESS
gate, not this file.

Timing protocol: most rows record best-of-2 (construction re-done both
runs); rows in MEDIAN3 — the most expensive rows, where a single load
spike distorts round-over-round comparison the most — run 3x and
record the MEDIAN (robust to one-sided spikes, unlike min, which can
hide a real regression behind one lucky run). The noise_probe field
quantifies host-load drift within the run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "wordcount",
    "wordcount_per_doc",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "asof_join_purchase_to_view",
    "interval_join_event_pairs",
    "skew_salted_join_top_words",
    "window_rolling_events",
    "events_tumbling_window",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_dedup_pairs",
    "simhash_signatures",
    "knn_bruteforce",
    "knn_lsh_ann",
    "knn_pq_ann",
    "knn_ivfpq_ann",
    "token_stats",
    "quality_scores",
    "pipeline_clean_corpus",
    "multimodal_features",
    "tpch_q18_large_volume_customer",
    "chunk_documents",
    "pack_batches_by_budget",
    "dedup_group_assignment",
    "latest_event_per_user",
    "pipeline_training_batches",
    "pipeline_training_batches_lsh",  # scale-path edge builder; delta vs exact
    "dedup_group_assignment_lsh",  # LSH edge builder vs the exact twin above
    "ngram_jaccard_pairs_prefix",  # prefix-filtered exact tier (100 TB shape)
    "funnel_conversion",
    "bm25_search",
    # round-2 breadth: heavy hitters that were previously unbenched, so
    # round-over-round regressions are visible for the whole surface
    "tpch_q8_market_share",
    "cohort_retention",
    "window_time_range_sum",
    "events_variant_extract",
    "simhash_block_near_pairs",
    "ngram_jaccard_pairs_capped",
    "embedding_near_dup_lsh",
    # round-3 breadth: curation ops + the streaming engine path
    "semantic_dedup_keep_corpus_ann",
    "decontaminate_corpus",
    "stratified_sample_deterministic",
    "streaming_tumbling_counts",
    "streaming_running_user_totals",
    # round-4 breadth: real PNG raster decode to per-image channel stats
    # (streaming_sliding_means / _dedup_user_totals / stream_stream_join
    # are deliberately NOT benched: each is another full engine run at
    # ~5-10 s of pure micro-batch scheduling overhead, and the two
    # benched streaming rows already track that engine path's cost)
    "multimodal_pixel_stats",
    "duplicated_span_stats",  # exact-substring duplication metrics (linear)
    # round-4b breadth: retrieval fusion + sketch/mixture/band curation
    "hybrid_retrieval_rrf",
    "heavy_hitters_tokens",
    "domain_mixture_resample",
    "quality_quantile_filter",
    # round-4c breadth: scrubbing / boilerplate / clustering curation ops
    "pii_redaction_stats",
    "line_dedup_stats",
    "embedding_kmeans_refine",
    "bpe_merge_pairs",
    "tfidf_top_terms",
    "multimodal_resize_stats",
    # round-5 breadth: the registered curation extras + the two deepened
    # pipelines (cluster-sharded SemDeDup, multi-round BPE trainer)
    "bloom_decontaminate",
    "sample_exact_n",
    "stratified_exact_n",
    "containment_pairs",
    "cdc_chunks",
    "incremental_lsh_dedup",
    "incremental_lsh_dedup_stored",
    "bigram_lm_doc_scores",
    # r12: the order-3 KN rung + its CCNet bucket composition (warm
    # ~2.3-2.8 s at sf0.1 — best-of-2 tier like the bigram rows)
    "kn_trigram_lm_doc_scores",
    "kn_trigram_perplexity_buckets",
    "quality_quantile_filter_approx",
    "ccnet_perplexity_buckets",
    "publish_dataset_roundtrip",
    "semantic_dedup_cluster_sharded",
    "bpe_train_vocab",
    # round-7 breadth: the newly registered staged operators + the
    # composed end-to-end curation funnel
    "gopher_quality_stats",
    "gopher_repetition_stats",
    "dsir_importance_weights",
    "soft_dedup_weights",
    "weighted_systematic_sample",
    "snapshot_diff",
    "bpe_encode_stats",
    "pipeline_curate_corpus",
    "retract_and_readmit",
    "knn_sq_ann",
    "knn_opq_ann",
    "knn_pq_ann_stored",
    "knn_ivfpq_ann_stored",
    # round-8 breadth: the two new TPC-H shapes, the converged trainer,
    # and the sharded-semdedup audit (exact all-pairs + two CC runs in
    # one query — audit-carrying BY DESIGN, like the ANN audit rows)
    "tpch_q12_shipmode_priority",
    "tpch_q21_waiting_suppliers",
    "kmeans_train_converged",
    # semantic_dedup_sharded_miss_audit (the UNSAMPLED form) left the
    # bench in r10 per VERDICT r9: its exact generator is all-pairs
    # quadratic — small-sf-only by design — and the sampled twin below
    # is the documented scale form whose cost the bench tracks.
    "knn_range_ivf",
    "knn_range_ivf_stored",
    # round-9 breadth: the sampled (100 TB-safe) miss audit and the
    # trained-topic mixture composite
    "semantic_dedup_sharded_miss_audit_sampled",
    "topic_mixture_resample",
    # round-10 breadth: ingest-time semantic dedup (pruned + exact twin
    # audit row — the *_ship row below times the production path
    # alone), the IVFADC build→append→compact→query lifecycle row, and
    # the 3-batch semantic admission chain with mid-chain compaction
    "ism_audit_query",
    "knn_ivfadc_compacted",
    "incremental_semantic_dedup_chain",
    "knn_pq_compacted",
    "knn_opq_ann_stored",
    # the SQ8 store lifecycle (build → 2 appends → compact → query,
    # audit-carrying like the other lifecycle rows) and the IVF×SQ
    # composed-index lifecycle (FAISS IndexIVFScalarQuantizer)
    "knn_sq_ann_stored",
    "knn_ivfsq_ann_stored",
    # the semantic decontamination tier (broadcast eval side, one
    # training scan, map-side-combined per-id aggregate) and the
    # GD-trained quality classifier (8 one-aggregate rounds)
    "semantic_decontaminate",
    "quality_classifier_train",
    "quality_classifier_filter",
    "streaming_quality_filter",
    # range search served from the byte store (filter-verify bound)
    "knn_range_ivfsq_stored",
    # round-11 breadth: the composed OPQ rotation × cid-partitioned
    # byte store (FAISS OPQ8,IVF16,PQ8 persisted) — the last
    # quantizer-matrix cell, now driver-rowed
    "knn_opq_ivfadc_stored",
    # round-13: predicate-filtered top-k from the stored IVF index
    # (FAISS IDSelector mode; build + filtered query + sliced exact
    # twin over the audit sample)
    "knn_ivf_filtered_stored",
]

# Median-of-3 rows (BENCH_r08's top-20 by cost, plus cdc_chunks — its
# r8 1.35x move needed a noise-robust re-read): the measured noise-probe
# spread is ~2.2x on this shared host, so single-shot/best-of-2 timings
# on expensive rows can't call a <2x regression; the median of 3 can.
MEDIAN3 = {
    "knn_ivfpq_ann_stored",
    "pipeline_curate_corpus",
    "knn_pq_ann_stored",
    "semantic_dedup_keep_corpus_ann",
    "retract_and_readmit",
    "knn_range_ivf_stored",
    "kmeans_train_converged",
    "knn_ivfpq_ann",
    "knn_opq_ann",
    "incremental_lsh_dedup",
    "knn_pq_ann",
    "incremental_lsh_dedup_stored",
    "ngram_jaccard_pairs_prefix",
    "pipeline_training_batches",
    "knn_opq_ann_ship",
    "semantic_dedup_cluster_sharded",
    "semantic_dedup_keep_corpus_ann_ship",
    "dedup_group_assignment",
    "bpe_encode_stats",
    "cdc_chunks",
    # r9-new expensive rows join the robust tier from their first round
    "semantic_dedup_sharded_miss_audit_sampled",
    "topic_mixture_resample",
    # r10: the touched-read-path rows promote to the robust tier —
    # VERDICT r9 flagged knn_range_ivf_ship's +45% best-of-N move as
    # uncallable and asked for median-of-3 on every stored/ship row the
    # recovery-at-entry change touched; r10-new rows join per the
    # first-round rule.
    "knn_range_ivf_ship",
    "knn_ivf_ann_stored_ship",
    "knn_range_ivf_stored_ship",
    "knn_pq_ann_stored_ship",
    "knn_ivfpq_ann_stored_ship",
    "incremental_semantic_dedup_ship",
    "ism_audit_query",
    "knn_ivfadc_compacted",
    "ivfadc_append_compact_ship",
    "incremental_semantic_dedup_chain",
    "knn_pq_compacted",
    "knn_opq_ann_stored",
    "knn_sq_ann_stored",
    "knn_sq_ann_stored_ship",
    "knn_ivfsq_ann_stored",
    "knn_ivfsq_ann_stored_ship",
    "semantic_decontaminate",
    "quality_classifier_train",
    "quality_classifier_filter",
    "knn_range_ivfsq_stored",
    # r11-new expensive row: first-round m3 per protocol
    "knn_opq_ivfadc_stored",
    # r12: the composed store's isolated read path (VERDICT r11 ask #4 —
    # without it a read-path regression would hide inside build noise)
    "knn_opq_ivfadc_stored_ship",
    # r13-new expensive row + its isolated read path: first-round m3
    # per protocol (stored/ship rows are m3 per the r10 rule)
    "knn_ivf_filtered_stored",
    "knn_ivf_filtered_stored_ship",
    # streaming_quality_filter stays in the streaming best-of-3 tier
    # with the rest of the streaming family (scheduler-overhead
    # dominated), not MEDIAN3.
}


def _host_probe_work(_arg) -> int:
    """Module-level so ProcessPoolExecutor can pickle it (a closure
    cannot cross the fork/spawn boundary): ~0.5 GB of md5 per unit —
    a pure-CPU, memory-light work quantum."""
    import hashlib

    h = hashlib.md5()
    b = b"x" * 65536
    for _i in range(8000):
        h.update(b)
    return 1


def _bandwidth_probe_work(_arg) -> int:
    """Memory-BANDWIDTH quantum (r12 addition): 16 copies of a 64 MB
    buffer — far beyond L3, so the timing is DRAM-bound, the dimension
    the md5 quantum (64 KB, cache-resident) cannot see. Motivation: the
    r12 host measured steal 0% / md5 scaling 26x — "healthy" on the r11
    fingerprint — while byte-identical r10 code still ran 1.9x slow on
    bandwidth-bound rows; this probe makes that state distinguishable
    from an actually-healthy host. Returns bytes moved."""
    src = bytearray(64 * 1024 * 1024)
    dst = bytearray(len(src))
    for _i in range(16):
        dst[:] = src
    return 16 * len(src)


def _host_probe() -> dict:
    """Host fingerprint (r11 addition, motivated by a sweep where every
    bandwidth-heavy row moved 1.6-5x on BYTE-IDENTICAL code while the
    tiny noise probe stayed flat — memory-bandwidth contention from a
    VM co-tenant that per-query timings alone cannot attribute):
    single-core CPU time, 32-way parallel scaling, and steal% sampled
    UNDER that load. Spark-free, a few seconds once per run; lets a
    round-over-round comparison separate "the host degraded" from
    "the code regressed" without re-running old commits."""
    import time as _time
    from concurrent.futures import ProcessPoolExecutor

    def _cpu_snap() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    t0 = _time.monotonic()
    _host_probe_work(0)
    single = _time.monotonic() - t0
    s0 = _cpu_snap()
    t0 = _time.monotonic()
    with ProcessPoolExecutor(32) as ex:
        list(ex.map(_host_probe_work, range(64)))
    par = _time.monotonic() - t0
    s1 = _cpu_snap()
    d = [b - a for a, b in zip(s0, s1)]
    tot = sum(d) or 1
    # Copy bandwidth, single then 16-way (not 32: the copy quantum
    # allocates 128 MB/worker, and 16 streams already saturate a socket's
    # memory controllers — more workers measure allocator contention,
    # not DRAM). GB/s, aggregate for the parallel figure.
    t0 = _time.monotonic()
    moved = _bandwidth_probe_work(0)
    bw_single = moved / (_time.monotonic() - t0) / 1e9
    t0 = _time.monotonic()
    with ProcessPoolExecutor(16) as ex:
        total_moved = sum(ex.map(_bandwidth_probe_work, range(16)))
    bw_par = total_moved / (_time.monotonic() - t0) / 1e9
    return {
        "md5_single_s": round(single, 3),
        "md5_scaling_x": round(64 * single / par, 1),
        "steal_pct_under_load": round(100.0 * d[7] / tot, 1),
        "copy_gbps_single": round(bw_single, 2),
        "copy_gbps_16x": round(bw_par, 2),
    }


def _measure(run, name: str) -> float:
    """Row timing dispatch: MEDIAN3 rows run 3x → median; streaming
    rows best-of-3 (scheduler-overhead dominated, 3-5x load-sensitive);
    everything else best-of-2."""
    if name in MEDIAN3:
        ts = sorted(_timed(run) for _ in range(3))
        return round(ts[1], 3)
    attempts = 3 if name.startswith("streaming_") else 2
    return round(min(_timed(run) for _ in range(attempts)), 3)


def _timed(fn) -> float:
    # Drop the PREVIOUS query's lingering references first: eager
    # localCheckpoint blocks are freed by the JVM ContextCleaner only
    # after the Python DataFrame objects are collected, and carrying
    # tens of queries' dead blocks in executor storage measurably slows
    # later queries (~20% on the checkpoint-heavy dedup tiers). A
    # production executor doesn't run 40 unrelated queries back to
    # back, so per-query isolation is the steady state being measured.
    import gc

    gc.collect()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from parallel_map_reduce_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not first-run JIT; uses the smallest sf to keep warmup cheap.
    try:
        qs["wordcount"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    # Also spin up the Arrow/pandas-UDF Python workers: executors are
    # long-lived in production, so per-query numbers should measure
    # steady-state throughput, not one-time worker fork + import cost.
    try:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(s):
            import numpy as np  # noqa: F401

            return s * 1.0

        from pyspark.sql import functions as F

        spark.range(32, numPartitions=32).select(
            _warm(F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    # Best-of-2 per query (same protocol as the reference-corpus run
    # below): round 2 showed a uniform ~30% slowdown on UNCHANGED plans —
    # the signature of sandbox load/GC variance — and single-shot timings
    # cannot separate that from a real regression. The second run re-does
    # construction too, so eager iterative operators (connected
    # components) still have their full work on the clock.
    # Noise indicator (shared host): the same trivial probe — the warmed
    # sf0.001 wordcount — timed at the start, middle and end of the run.
    # Its spread (max/min) quantifies host-load drift WITHIN the run, and
    # its absolute level is a round-over-round normalization constant:
    # untouched queries historically move 0.74x-1.37x between rounds on
    # identical code, and the probe separates that load band from a real
    # regression when comparing BENCH_r{N} files.
    def _probe() -> float:
        def run_probe():
            qs["wordcount"](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()

        return round(_timed(run_probe), 3)

    # One untimed probe run first: the measured first probe was
    # consistently ~2x the later ones (residual first-run effects the
    # generic warmup above doesn't cover), which would inflate `spread`
    # with a constant artifact instead of actual host-load drift.
    _probe()
    noise_probe: list[float] = [_probe()]

    # Host fingerprint — see _host_probe.
    try:
        host_probe = _host_probe()
    except Exception:  # /proc/stat shape, pool limits — never fail bench
        host_probe = {}

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue

        def run_query(q=qs[name]):
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()

        timings[name] = _measure(run_query, name)
        # Progress line per query ('#'-prefixed so the final JSON stays
        # the only JSON line): the driver records only a bounded stdout
        # tail, and round 4's 57-row result JSON overflowed it
        # ("parsed": null in BENCH_r04.json) — per-query lines first +
        # a compact final dump keep the artifact reconstructable even
        # if the tail cut ever lands mid-JSON again.
        print(f"# {name}: {timings[name]}s", flush=True)

    noise_probe.append(_probe())

    # Ship-path rows for the ANN family. The REGISTERED queries above
    # (knn_lsh_ann, embedding_near_dup_lsh, semantic_dedup_keep_corpus_ann)
    # carry the driver-visible recall audit since round 4 — the exact
    # brute-force twin runs INSIDE the same query — so their timings
    # include O(N²) verification work the deployed operator never does.
    # These rows time the operator a user actually ships at 100 TB
    # (approximate tier only), keeping the audit cost and the ship cost
    # separately visible round-over-round.
    from parallel_map_reduce_spark.operators import similarity as _sim
    from parallel_map_reduce_spark.operators.queries_llm import (
        EMBED_DUP_THRESHOLD,
        KNN_K,
        KNN_QUERY_IDS,
        RANGE_RADIUS as _RANGE_RADIUS,
        _semantic_dedup_keep,
    )
    from parallel_map_reduce_spark.sources.tables import load_table

    def _emb():
        return load_table(spark, sf_dir, "embeddings")

    ship = {
        "knn_lsh_ann_ship": lambda: _sim.lsh_bucket_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_ivf_ann_ship": lambda: _sim.ivf_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "embedding_near_dup_lsh_ship": lambda: _sim.embedding_near_dup_lsh(
            _emb(), threshold=EMBED_DUP_THRESHOLD, num_tables=16
        ),
        "semantic_dedup_keep_corpus_ann_ship": lambda: _semantic_dedup_keep(
            spark, sf_dir, edge_builder="ann"
        ),
        "knn_pq_ann_ship": lambda: _sim.pq_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_ivfpq_ann_ship": lambda: _sim.ivfpq_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_sq_ann_ship": lambda: _sim.sq_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_opq_ann_ship": lambda: _sim.opq_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_range_ivf_ship": lambda: _sim.ivf_range_search(
            _emb(), KNN_QUERY_IDS, _RANGE_RADIUS
        ),
    }
    for name, mk in ship.items():

        def run_ship(mk=mk):
            mk().write.format("noop").mode("overwrite").save()

        timings[name] = _measure(run_ship, name)
        print(f"# {name}: {timings[name]}s", flush=True)

    # Two-phase IVF ship row: the index is a PERSISTED nightly artifact,
    # so the deployed per-query cost is phase 2 alone — build once
    # outside the clock, time only the stored-index answer. Compare
    # against knn_ivf_ann_ship (which retrains + reassigns every call)
    # to read off what persisting the index buys.
    import shutil as _shutil
    import tempfile as _tempfile

    idx_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_ivf_")
    try:
        _sim.ivf_build_index(_emb(), idx_dir)

        def run_ivf_stored():
            _sim.ivf_query_stored(
                spark, idx_dir, query_ids=KNN_QUERY_IDS, k=KNN_K
            ).write.format("noop").mode("overwrite").save()

        timings["knn_ivf_ann_stored_ship"] = _measure(run_ivf_stored, "knn_ivf_ann_stored_ship")
        print(
            f"# knn_ivf_ann_stored_ship: {timings['knn_ivf_ann_stored_ship']}s",
            flush=True,
        )

        # The SAME stored index also serves range queries (FAISS's other
        # query mode) — time it on the artifact already built above.
        def run_range_stored():
            _sim.ivf_range_query_stored(
                spark, idx_dir, KNN_QUERY_IDS, _RANGE_RADIUS
            ).write.format("noop").mode("overwrite").save()

        timings["knn_range_ivf_stored_ship"] = _measure(run_range_stored, "knn_range_ivf_stored_ship")
        print(
            "# knn_range_ivf_stored_ship: "
            f"{timings['knn_range_ivf_stored_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(idx_dir, ignore_errors=True)

    # Ingest-time semantic dedup (registered r10 as ism_audit_query —
    # that row carries the exact twin; this one ships alone): index
    # the even-id half outside the clock — the nightly artifact — and
    # time ONE batch admission (odd ids) against it: IVF-pruned cross
    # search + blocked within-batch Gram, the per-ingest ship cost.
    from pyspark.sql import functions as _F

    sem_idx = _tempfile.mkdtemp(prefix="pmr_spark_bench_semdedup_")
    try:
        _sim.ivf_build_index(
            _emb().filter(_F.col("vec_id") % 2 == 0), sem_idx
        )

        def run_sem_ingest():
            _sim.incremental_semantic_dedup(
                spark,
                _emb().filter(_F.col("vec_id") % 2 == 1),
                sem_idx,
                threshold=EMBED_DUP_THRESHOLD,
            ).write.format("noop").mode("overwrite").save()

        timings["incremental_semantic_dedup_ship"] = _measure(run_sem_ingest, "incremental_semantic_dedup_ship")
        print(
            "# incremental_semantic_dedup_ship: "
            f"{timings['incremental_semantic_dedup_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(sem_idx, ignore_errors=True)

    # Same discipline for the persisted PQ code store: encode once
    # outside the clock, time only the answer-from-codes path — compare
    # against knn_pq_ann_ship (which retrains + re-encodes every call)
    # to read off what persisting the codes buys.
    pq_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_pq_")
    try:
        _sim.pq_build_index(_emb(), pq_dir)

        def run_pq_stored():
            _sim.pq_query_stored(
                spark, pq_dir, _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
            ).write.format("noop").mode("overwrite").save()

        timings["knn_pq_ann_stored_ship"] = _measure(run_pq_stored, "knn_pq_ann_stored_ship")
        print(
            f"# knn_pq_ann_stored_ship: {timings['knn_pq_ann_stored_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(pq_dir, ignore_errors=True)

    # The persisted SQ8 byte-code store: encode once outside the clock,
    # time only the answer-from-codes path — the ONLY stored read path
    # in the family with zero Python anywhere (model as plan literals).
    sq_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_sq_")
    try:
        _sim.sq_build_index(_emb(), sq_dir)

        def run_sq_stored():
            _sim.sq_query_stored(
                spark, sq_dir, _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
            ).write.format("noop").mode("overwrite").save()

        timings["knn_sq_ann_stored_ship"] = _measure(run_sq_stored, "knn_sq_ann_stored_ship")
        print(
            f"# knn_sq_ann_stored_ship: {timings['knn_sq_ann_stored_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(sq_dir, ignore_errors=True)

    # r13: the predicate-filtered query mode served from a
    # metadata-carrying stored index (FAISS IDSelector shape) — build
    # once outside the clock, time only the filtered answer; compare
    # against knn_ivf_ann_stored_ship to read off what the label
    # rowgroup filter costs on the same probed-cell read path.
    filt_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_ivf_filt_")
    try:
        _sim.ivf_build_index(_emb(), filt_dir, meta_cols=("label",))

        def run_filt_stored():
            _sim.ivf_query_stored(
                spark,
                filt_dir,
                query_ids=KNN_QUERY_IDS,
                k=KNN_K,
                nprobe=8,
                where=_F.col("label") == 3,
            ).write.format("noop").mode("overwrite").save()

        timings["knn_ivf_filtered_stored_ship"] = _measure(
            run_filt_stored, "knn_ivf_filtered_stored_ship"
        )
        print(
            "# knn_ivf_filtered_stored_ship: "
            f"{timings['knn_ivf_filtered_stored_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(filt_dir, ignore_errors=True)

    # The composed IVF×SQ index (FAISS IndexIVFScalarQuantizer): both
    # pruning axes live — probed cells only (DPP) AND 1 byte/dim — with
    # an all-JVM corpus side. Build outside the clock, time the answer.
    ivfsq_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_ivfsq_")
    try:
        _sim.ivfsq_build_index(_emb(), ivfsq_dir)

        def run_ivfsq_stored():
            _sim.ivfsq_query_stored(
                spark, ivfsq_dir, _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
            ).write.format("noop").mode("overwrite").save()

        timings["knn_ivfsq_ann_stored_ship"] = _measure(
            run_ivfsq_stored, "knn_ivfsq_ann_stored_ship"
        )
        print(
            "# knn_ivfsq_ann_stored_ship: "
            f"{timings['knn_ivfsq_ann_stored_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(ivfsq_dir, ignore_errors=True)

    # And the composed index: persisted IVFADC (coarse centroids + PQ
    # model + cid-partitioned codes) — the FAISS billion-scale layout.
    ivfpq_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_ivfpq_")
    try:
        _sim.ivfpq_build_index(_emb(), ivfpq_dir)

        def run_ivfpq_stored():
            _sim.ivfpq_query_stored(
                spark, ivfpq_dir, _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
            ).write.format("noop").mode("overwrite").save()

        timings["knn_ivfpq_ann_stored_ship"] = _measure(run_ivfpq_stored, "knn_ivfpq_ann_stored_ship")
        print(
            "# knn_ivfpq_ann_stored_ship: "
            f"{timings['knn_ivfpq_ann_stored_ship']}s",
            flush=True,
        )

        # The nightly maintenance pair on the SAME artifact: one delta
        # append (a 1/16 batch encoded/assigned against the stored
        # quantizers) + the invfile fold back to one file per cell.
        # Each timed run appends then folds, so the store grows ~6%
        # per iteration — within the noise band for a median of 3.
        def run_append_compact():
            _sim.ivfpq_append_to_index(
                _emb().filter(_F.col("vec_id") % 16 == 1), ivfpq_dir
            )
            _sim.compact_ivf_index(spark, ivfpq_dir)

        timings["ivfadc_append_compact_ship"] = _measure(
            run_append_compact, "ivfadc_append_compact_ship"
        )
        print(
            "# ivfadc_append_compact_ship: "
            f"{timings['ivfadc_append_compact_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(ivfpq_dir, ignore_errors=True)

    # The COMPOSED rotation × cell-partitioned store (FAISS
    # ``OPQ8,IVF16,PQ8``): same persisted layout as the ivfpq store
    # above plus the learned OPQ rotation in the model row. Build once
    # outside the clock, time only the stored read path — the driver
    # row knn_opq_ivfadc_stored carries the audit-laden build+query
    # shape (17-25 s), so without this m3 row a regression in the read
    # path alone would hide inside build noise (VERDICT r11 ask #4).
    # Compare against knn_ivfpq_ann_stored_ship to read off what the
    # rotation costs at query time (expected: ~nothing — it rides into
    # the ADC pandas UDF as one extra d×d matmul per batch).
    opq_ivfadc_dir = _tempfile.mkdtemp(prefix="pmr_spark_bench_opqivfadc_")
    try:
        _sim.ivfpq_build_index(_emb(), opq_ivfadc_dir, rotation=True)

        def run_opq_ivfadc_stored():
            _sim.ivfpq_query_stored(
                spark, opq_ivfadc_dir, _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
            ).write.format("noop").mode("overwrite").save()

        timings["knn_opq_ivfadc_stored_ship"] = _measure(
            run_opq_ivfadc_stored, "knn_opq_ivfadc_stored_ship"
        )
        print(
            "# knn_opq_ivfadc_stored_ship: "
            f"{timings['knn_opq_ivfadc_stored_ship']}s",
            flush=True,
        )
    finally:
        _shutil.rmtree(opq_ivfadc_dir, ignore_errors=True)

    noise_probe.append(_probe())

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "noise_probe": {
            "seconds": noise_probe,
            "spread": round(max(noise_probe) / min(noise_probe), 2),
        },
        "headline_timing": "median3",
        "median3_rows": sorted(MEDIAN3 & set(timings)),
        "host_probe": host_probe,
    }

    # Apples-to-apples vs BASELINE.md: the reference's own 13.25 MB corpus
    # (its 16-thread engine: 0.435s / 30.4 MB/s; serial: 0.634s).
    import glob

    ref_paths = sorted(
        p for p in glob.glob("/root/reference/files/*.txt") if "small" not in p
    )
    if ref_paths:
        import math

        from parallel_map_reduce_spark.operators.wordcount import wordcount
        from parallel_map_reduce_spark.sources.tables import read_text_lines

        # Size input splits for the corpus, not for the 128 MB big-data
        # default: target one scan task per core, but never below 768 KB —
        # measured on this corpus, tasks under ~0.75 MB are dominated by
        # per-task fixed cost (70 × 200 KB tasks: 22 MB/s; 25 × 768 KB
        # tasks: 37 MB/s). At cluster scale total/cores exceeds 128 MB and
        # the clamp restores the default, so the rule is scale-neutral.
        total_bytes = sum(os.path.getsize(p) for p in ref_paths)
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        split = min(max(math.ceil(total_bytes / cpus), 768 * 1024), 128 * 1024 * 1024)
        old_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        # 109k distinct words reduce to ~14k groups/task at 8 partitions —
        # fewer, fuller reduce tasks at this input size.
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        def run_ref():
            wc = wordcount(read_text_lines(spark, ref_paths), "value")
            wc.write.format("noop").mode("overwrite").save()

        run_ref()  # warm
        best = min(_timed(run_ref) for _ in range(3))
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        out["reference_corpus_wordcount"] = {
            "seconds": round(best, 3),
            "mb_per_s": round(13.25 / best, 1),
            "baseline_16thread_mb_per_s": 30.4,
            "baseline_serial_mb_per_s": 20.9,
        }

    # The driver records only the LAST 2000 chars of stdout and parses
    # the JSON lines it finds there — the one-line full dump outgrew that
    # tail in rounds 4-6 ("parsed": null), so no complete JSON line
    # survived the cut. Emit three artifacts, most-parseable LAST:
    #   1. BENCH_FULL.json at the repo root — the full-precision result;
    #   2. a '#'-prefixed full-precision line (reconstructable when the
    #      tail happens to cover it);
    #   3. the final stdout line: the same contract with the per-query
    #      map at 2 dp, truncated to the most expensive rows only if
    #      needed to stay inside a 1800-char budget (leaving tail room),
    #      with queries_omitted + queries_file recording the cut.
    full_line = json.dumps(out, separators=(",", ":"))
    repo_root = os.path.dirname(os.path.abspath(__file__))
    # Stamped artifact ALWAYS; BENCH_FULL.json only on explicit promote
    # (VERDICT r11 ask #3): the driver's own bench runs — and ad-hoc
    # smoke runs at other sfs — used to overwrite the committed
    # quiet-close BENCH_FULL.json in the working tree, which rode into
    # a commit once (4d0565c) and dirtied the tree at judging time
    # twice. Runs now land in the gitignored bench_out/ stamped by
    # sf + wall time; the round's chosen quiet close is promoted with
    #   SPARK_GRAFT_BENCH_PROMOTE=1 python bench.py
    # (or by copying a stamped artifact over BENCH_FULL.json by hand).
    out_dir = os.path.join(repo_root, "bench_out")
    os.makedirs(out_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    stamped_name = f"BENCH_sf{sf}_{stamp}.json"
    with open(os.path.join(out_dir, stamped_name), "w") as f:
        f.write(full_line + "\n")
    print(f"# artifact: bench_out/{stamped_name}", flush=True)
    if os.environ.get("SPARK_GRAFT_BENCH_PROMOTE") == "1":
        with open(os.path.join(repo_root, "BENCH_FULL.json"), "w") as f:
            f.write(full_line + "\n")
    print("# full: " + full_line, flush=True)

    budget = 1800
    compact = dict(out)
    # The full name list lives in BENCH_FULL.json; the budgeted stdout
    # line carries only the count so it doesn't crowd out query rows.
    compact["median3_rows"] = len(out["median3_rows"])
    q2 = {k: round(v, 2) for k, v in timings.items()}
    compact["queries"] = q2
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > budget:
        # Point at a path that survives a commit: bench_out/ is
        # gitignored, so a PROMOTED run's compact line must reference
        # BENCH_FULL.json (which the promote path just wrote) or the
        # committed line would dangle (ADVICE r12).
        if os.environ.get("SPARK_GRAFT_BENCH_PROMOTE") == "1":
            compact["queries_file"] = "BENCH_FULL.json"
        else:
            compact["queries_file"] = f"bench_out/{stamped_name}"
        # Worst-case-width placeholder so the measured length never
        # undercounts the final line (the real count is <= len(q2), so
        # its digit width is <= this placeholder's).
        compact["queries_omitted"] = len(q2)
        kept: dict[str, float] = {}
        compact["queries"] = kept
        for k, v in sorted(q2.items(), key=lambda kv: (-kv[1], kv[0])):
            kept[k] = v
            if len(json.dumps(compact, separators=(",", ":"))) > budget:
                # Skip (don't stop): a shorter-keyed row later in the
                # order may still fit inside the budget.
                del kept[k]
                continue
        compact["queries_omitted"] = len(q2) - len(kept)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
