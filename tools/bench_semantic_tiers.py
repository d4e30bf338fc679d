#!/usr/bin/env python3
"""Measure the three semantic-dedup edge builders' work models at a
given sf: exact blocked Gram (corpus², the oracle twin), hyperplane-LSH
buckets (Σ|bucket|² over tables, probabilistic occupancy), and
cluster-sharded (Σ|cluster|², deterministic k knob).

Prints scored-pair counts (the in-kernel cosine evaluations each tier
performs), edge/keep-set sizes, and best-of-2 wall times — the numbers
behind PLANS.md's "Cluster-sharded SemDeDup notes".

Usage: python tools/bench_semantic_tiers.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from parallel_map_reduce_spark.operators import (  # noqa: E402
        curation_extras as ce,
    )
    from parallel_map_reduce_spark.operators import dedup, similarity  # noqa: E402
    from parallel_map_reduce_spark.operators.queries_llm import (  # noqa: E402
        EMBED_DUP_THRESHOLD,
    )
    from parallel_map_reduce_spark.session import get_spark  # noqa: E402
    from parallel_map_reduce_spark.sources.tables import load_table  # noqa: E402

    spark = get_spark("bench_semantic_tiers")
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = emb.count()

    assigned = (
        similarity.nearest_centroid_assign(emb)
        .select("vec_id", "cluster")
        .localCheckpoint(eager=True)
    )

    # scored-pair work models ------------------------------------------------
    exact_pairs = n * (n - 1) // 2
    cl_sizes = [r["c"] for r in assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    shard_pairs_model = sum(c * (c - 1) // 2 for c in cl_sizes)
    bucketed = similarity._lsh_bucketed(
        emb.select("vec_id", similarity.to_double_array(F.col("embedding")).alias("vec")),
        "vec_id", 4, 16, 64,
    )
    bk_sizes = [r["c"] for r in bucketed.groupBy("tbl", "bucket").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    lsh_pairs_model = sum(c * (c - 1) // 2 for c in bk_sizes)

    # edges + keep sets ------------------------------------------------------
    def keep_count(pairs_df):
        comp = dedup.connected_components(pairs_df.select("id_a", "id_b"))
        losers = comp.filter(F.col("u") != F.col("label")).count()
        return n - losers

    def timed(mk):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    tiers = {
        "exact_blocked": lambda: similarity.embedding_all_pairs_blocked(
            emb, threshold=EMBED_DUP_THRESHOLD
        ),
        "lsh_16tables": lambda: similarity.embedding_near_dup_lsh(
            emb, threshold=EMBED_DUP_THRESHOLD, num_tables=16
        ),
        "cluster_sharded": lambda: ce.cluster_sharded_pairs(
            emb, assigned, EMBED_DUP_THRESHOLD
        ),
    }
    print(f"n={n}  exact pair-evals={exact_pairs}")
    print(
        f"cluster-sharded: k={len(cl_sizes)} clusters sizes={sorted(cl_sizes)} "
        f"pair-evals={shard_pairs_model} ({shard_pairs_model / exact_pairs:.3f}x exact)"
    )
    print(
        f"lsh: {len(bk_sizes)} buckets pair-evals={lsh_pairs_model} "
        f"({lsh_pairs_model / exact_pairs:.3f}x exact; occupancy-dependent)"
    )
    for name, mk in tiers.items():
        edges = mk().count()
        keep = keep_count(mk())
        print(f"{name}: wall={timed(mk)}s edges={edges} keep={keep}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
