"""Phase-level profiling of the round-14 target rows (guide §1).

Replays each target row's body with a timer around every driver-visible
phase (build, per-batch admission, append, compact, final action), so
the optimization work attacks the measured phase, not a guess. Phases
are labeled (setJobDescription) for UI cross-checks. Run on a quiet
host, one row per invocation:

    python tools/profile_r14_targets.py chain|ivfadc|pqcomp|ngram|keepann
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_t0 = None


def tick(label: str) -> None:
    global _t0
    now = time.monotonic()
    if _t0 is not None:
        print(f"  {label:<44s} {now - _t0:7.3f}s", flush=True)
    _t0 = now


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    which = sys.argv[1]
    from pyspark.sql import functions as F

    from parallel_map_reduce_spark.session import get_spark
    from parallel_map_reduce_spark.sources.tables import load_table

    spark = get_spark(f"profile_r14_{which}")
    # bench-equivalent warmup
    import __spark_entry__ as entrymod

    noop(entrymod.queries()["wordcount"](spark, "/root/testdata/sf0.001"))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    noop(spark.range(32, numPartitions=32).select(_warm(F.col("id").cast("double"))))

    import shutil

    from parallel_map_reduce_spark.operators import similarity as _sim
    from parallel_map_reduce_spark.operators.queries_curation import (
        _ISM_CELLS,
        _ISM_NPROBE,
        _scratch_dir,
    )
    from parallel_map_reduce_spark.operators.queries_llm import (
        EMBED_DUP_THRESHOLD,
    )

    t_all = time.monotonic()
    if which == "chain":
        from functools import reduce

        from pyspark.sql import DataFrame

        emb = load_table(spark, SF_DIR, "embeddings")
        mod = 6
        idx = _scratch_dir("prof_chain", SF_DIR)
        tick("start")
        _sim.ivf_build_index(
            emb.filter(F.col("vec_id") % 2 == 0), idx, num_centroids=_ISM_CELLS
        )
        tick("build_index")
        per_batch, p_crosses, e_crosses = [], [], []
        for k in (1, 2, 3):
            batch = emb.filter(F.col("vec_id") % mod == 2 * k - 1)
            exact, p_cross = _sim.incremental_semantic_dedup_with_audit(
                spark, batch, idx, threshold=EMBED_DUP_THRESHOLD, nprobe=_ISM_NPROBE
            )
            exact = exact.localCheckpoint(eager=False)
            tick(f"batch{k}_with_audit (CC in-call jobs)")
            e_cross = exact.filter(F.col("status") == "cross_dup").select("vec_id")
            p_crosses.append(p_cross)
            e_crosses.append(e_cross)
            agg = exact.agg(
                F.count(F.lit(1)).alias("n_batch"),
                F.sum((F.col("status") == "cross_dup").cast("long")).alias("n_cross"),
            ).withColumn("batch", F.lit(k).cast("long"))
            subset = p_cross.join(e_cross, "vec_id", "left_anti").agg(
                F.count(F.lit(1)).alias("n_false")
            )
            per_batch.append(agg.crossJoin(subset))
            surv_ids = exact.filter(F.col("status") == "kept").select("vec_id")
            _sim.ivf_append_to_index(emb.join(surv_ids, "vec_id"), idx)
            tick(f"batch{k}_append")
            if k == 2:
                _sim.compact_ivf_index(spark, idx)
                tick("mid_chain_compact")
        shutil.rmtree(idx, ignore_errors=True)
        all_p = reduce(DataFrame.unionAll, p_crosses)
        all_e = reduce(DataFrame.unionAll, e_crosses)
        rec = (
            all_e.join(all_p, "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .crossJoin(all_e.agg(F.count(F.lit(1)).alias("n_e_all")))
        )
        out = reduce(DataFrame.unionAll, per_batch).crossJoin(F.broadcast(rec))
        noop(out)
        tick("final_action (aggs+rec)")
    elif which in ("ivfadc", "pqcomp"):
        from parallel_map_reduce_spark.operators.queries_llm import (
            KNN_K,
            KNN_QUERY_IDS,
            knn_audit_sample,
        )
        from parallel_map_reduce_spark.operators.queries_curation import (
            _knn_audit_frame,
        )

        emb = knn_audit_sample(load_table(spark, SF_DIR, "embeddings"))
        tick("start")
        if which == "ivfadc":
            idx = _scratch_dir("prof_ivfadc", SF_DIR)
            _sim.ivfpq_build_index(emb.filter(F.col("vec_id") % 2 == 0), idx)
            tick("build")
            for mres in (1, 3):
                _sim.ivfpq_append_to_index(emb.filter(F.col("vec_id") % 4 == mres), idx)
                tick(f"append_{mres}")
            pre = (
                _sim.ivfpq_query_stored(spark, idx, emb, query_ids=KNN_QUERY_IDS, k=KNN_K)
                .select("query_id", "neighbor_id")
                .localCheckpoint(eager=True)
            )
            tick("pre_query")
            _sim.compact_ivf_index(spark, idx)
            tick("compact")
            post = (
                _sim.ivfpq_query_stored(spark, idx, emb, query_ids=KNN_QUERY_IDS, k=KNN_K)
                .select("query_id", "neighbor_id")
                .localCheckpoint(eager=True)
            )
            tick("post_query")
        else:
            idx = _scratch_dir("prof_pqcomp", SF_DIR)
            _sim.pq_build_index(emb.filter(F.col("vec_id") % 2 == 0), idx)
            tick("build")
            for mres in (1, 3):
                _sim.pq_append_to_index(emb.filter(F.col("vec_id") % 4 == mres), idx)
                tick(f"append_{mres}")
            pre = (
                _sim.pq_query_stored(spark, idx, emb, query_ids=KNN_QUERY_IDS, k=KNN_K)
                .select("query_id", "neighbor_id")
                .localCheckpoint(eager=True)
            )
            tick("pre_query")
            _sim.compact_pq_index(spark, idx)
            tick("compact")
            post = (
                _sim.pq_query_stored(spark, idx, emb, query_ids=KNN_QUERY_IDS, k=KNN_K)
                .select("query_id", "neighbor_id")
                .localCheckpoint(eager=True)
            )
            tick("post_query")
        shutil.rmtree(idx, ignore_errors=True)
        exact = _sim.knn_bruteforce(emb, query_ids=KNN_QUERY_IDS, k=KNN_K)
        diff = (
            pre.exceptAll(post)
            .agg(F.count(F.lit(1)).alias("n_d1"))
            .crossJoin(post.exceptAll(pre).agg(F.count(F.lit(1)).alias("n_d2")))
        )
        noop(_knn_audit_frame(exact, post).crossJoin(diff))
        tick("final_action (exact twin + diff)")
    elif which == "ngram":
        from parallel_map_reduce_spark.operators import dedup
        from parallel_map_reduce_spark.operators.dedup import explode_shingles

        docs = load_table(spark, SF_DIR, "documents")
        tick("start")
        sh = explode_shingles(docs, "text", "doc_id", 3)
        dict_df = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .withColumn("_sid", F.monotonically_increasing_id())
        )
        idx = (
            sh.join(dict_df, "shingle")
            .select("doc_id", "_sid", "_df")
            .localCheckpoint(eager=True)
        )
        tick("idx checkpoint (explode+dict join)")
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("_sid").asc())
        wn = Window.partitionBy("doc_id")
        threshold = 0.5
        prefix = (
            idx.select(
                "doc_id",
                "_sid",
                F.row_number().over(w).alias("_rn"),
                F.count(F.lit(1)).over(wn).alias("n_sh"),
            )
            .filter(F.col("_rn") <= F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1)
            .select("doc_id", "_sid", "n_sh")
            .localCheckpoint(eager=True)
        )
        tick("prefix checkpoint (rank window)")
        a = prefix.select(F.col("doc_id").alias("id_a"), "_sid", F.col("n_sh").alias("n_a"))
        b = prefix.select(F.col("doc_id").alias("id_b"), "_sid", F.col("n_sh").alias("n_b"))
        t = F.lit(threshold)
        candidates = (
            a.join(b, "_sid")
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("n_b") * t <= F.col("n_a"))
                & (F.col("n_a") * t <= F.col("n_b"))
            )
            .select("id_a", "id_b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_cand = candidates.count()
        tick(f"candidates checkpoint (n={n_cand})")
        cand_ids = (
            candidates.select(F.col("id_a").alias("doc_id"))
            .union(candidates.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        sets = (
            idx.join(cand_ids, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_list("_sid").alias("sid_set"))
        )
        sa = sets.select(F.col("doc_id").alias("id_a"), F.col("sid_set").alias("sid_a"))
        sb = sets.select(F.col("doc_id").alias("id_b"), F.col("sid_set").alias("sid_b"))
        inter = F.size(F.array_intersect(F.col("sid_a"), F.col("sid_b")))
        union = F.size("sid_a") + F.size("sid_b") - inter
        jac = inter / union
        out = (
            candidates.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(jac >= threshold)
            .withColumn("jaccard", F.round(jac, 4))
            .select("id_a", "id_b", "jaccard")
        )
        noop(out)
        tick("verify + final action")
    elif which == "keepann":
        from parallel_map_reduce_spark.operators import dedup as _dedup

        docs = load_table(spark, SF_DIR, "documents").select("doc_id")
        emb = load_table(spark, SF_DIR, "embeddings")
        tick("start")
        exact_edges = (
            _sim.embedding_all_pairs_blocked(emb, threshold=EMBED_DUP_THRESHOLD)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        tick("exact edges (blocked Gram)")
        ann_edges = (
            _sim.embedding_near_dup_lsh(emb, threshold=EMBED_DUP_THRESHOLD, num_tables=16)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        tick("ann edges (LSH 16 tables)")
        off = F.lit(1 << 40)
        joint = exact_edges.unionByName(
            ann_edges.select((F.col("id_a") + off).alias("id_a"), (F.col("id_b") + off).alias("id_b"))
        )
        comp = _dedup.connected_components(joint)
        tick("connected components (fixpoint)")
        losers_exact = comp.filter((F.col("u") < off) & (F.col("u") != F.col("label"))).select(
            F.col("u").alias("doc_id")
        )
        losers_ann = comp.filter((F.col("u") >= off) & (F.col("u") != F.col("label"))).select(
            (F.col("u") - off).alias("doc_id")
        )
        exact_keep = docs.join(F.broadcast(losers_exact), "doc_id", "left_anti")
        ann_keep = docs.join(F.broadcast(losers_ann), "doc_id", "left_anti")
        aux = (
            exact_keep.join(ann_keep, "doc_id", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_missing"))
            .crossJoin(ann_keep.agg(F.count(F.lit(1)).alias("n_ann_keep")))
        )
        stats = exact_keep.agg(
            F.count(F.lit(1)).alias("n_exact_keep"),
            F.sum("doc_id").alias("sum_exact_keep_ids"),
        )
        noop(stats.crossJoin(aux))
        tick("final action (keeps + aggs)")
    else:
        print(f"unknown target {which}", file=sys.stderr)
        return 2
    print(f"  TOTAL {time.monotonic() - t_all:7.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
