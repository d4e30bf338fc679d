#!/usr/bin/env python3
"""Measure the r8 hot-cluster fix in cluster_sharded_pairs: with every
vector forced into ONE cluster (maximum skew), compare the pre-r8 shape
(block_above=None — the whole n²/2 Gram in a single applyInPandas task)
against the block-pair decomposition at several block counts (B(B+1)/2
parallel tile tasks). Output equality is asserted on every run — the
decomposition is value-neutral by construction — so the numbers isolate
the parallelism effect.

Usage: python tools/bench_skew_cluster_split.py [sf_dir]
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
    from parallel_map_reduce_spark.operators.queries_llm import (  # noqa: E402
        EMBED_DUP_THRESHOLD,
    )
    from parallel_map_reduce_spark.session import get_spark  # noqa: E402
    from parallel_map_reduce_spark.sources.tables import load_table  # noqa: E402

    spark = get_spark("bench_skew_cluster_split")
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    skewed = (
        emb.select("vec_id").withColumn("cluster", F.lit(0))
        .localCheckpoint(eager=True)
    )

    def pairs_set(df):
        return {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in df.collect()}

    def timed(mk):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    baseline = pairs_set(
        ce.cluster_sharded_pairs(
            emb, skewed, EMBED_DUP_THRESHOLD, block_above=None
        )
    )
    t_single = timed(
        lambda: ce.cluster_sharded_pairs(
            emb, skewed, EMBED_DUP_THRESHOLD, block_above=None
        )
    )
    print(f"n={n} one hot cluster, {n * (n - 1) // 2} pair-evals")
    print(f"single-task kernel (pre-r8 shape): {t_single}s")
    for nb in (4, 8, 16):
        df = ce.cluster_sharded_pairs(
            emb, skewed, EMBED_DUP_THRESHOLD, block_above=2, num_blocks=nb
        )
        assert pairs_set(df) == baseline, f"num_blocks={nb} changed values"
        t = timed(
            lambda nb=nb: ce.cluster_sharded_pairs(
                emb, skewed, EMBED_DUP_THRESHOLD, block_above=2, num_blocks=nb
            )
        )
        tiles = nb * (nb + 1) // 2
        print(
            f"block-pair split num_blocks={nb} ({tiles} tiles): {t}s "
            f"({t_single / t:.2f}x vs single-task)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
