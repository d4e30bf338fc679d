#!/usr/bin/env python3
"""Measure the whole ANN ladder at a given sf: per tier, the deployed
(ship) wall time best-of-2, mean recall@k against the brute-force
exact answer, and the per-vector index storage cost implied by the
tier's encoding — the recall/latency/bytes tradeoff table a 100 TB
deployment picks its index from (FAISS's own ladder: Flat → LSH →
IVF,Flat → PQ → OPQ,PQ → IVF,PQ → SQ8).

For the two-phase tiers the index build runs OUTSIDE the clock (it is
a persisted nightly artifact); everything else is self-contained per
call, matching the bench.py ship rows.

Usage: python tools/bench_ann_ladder.py [sf_dir] [k]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from parallel_map_reduce_spark.operators import similarity as sim
    from parallel_map_reduce_spark.session import get_spark
    from parallel_map_reduce_spark.sources.tables import load_table

    spark = get_spark("bench_ann_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    dim = len(emb.first()["embedding"])
    qids = list(range(10))

    exact_rows = sim.knn_bruteforce(emb, query_ids=qids, k=k).collect()
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(df) -> float:
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = [len(exact[q] & got.get(q, set())) / k for q in exact]
        return sum(recs) / len(recs)

    def timed(mk) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    idx = tempfile.mkdtemp(prefix="ann_ladder_ivf_")
    sim.ivf_build_index(emb, idx)
    pq_idx = tempfile.mkdtemp(prefix="ann_ladder_pq_")
    sim.pq_build_index(emb, pq_idx)
    sq_idx = tempfile.mkdtemp(prefix="ann_ladder_sq_")
    sim.sq_build_index(emb, sq_idx)
    ivfsq_idx = tempfile.mkdtemp(prefix="ann_ladder_ivfsq_")
    sim.ivfsq_build_index(emb, ivfsq_idx)

    # (name, per-vector index bytes, callable) — bytes: what the tier's
    # encoding stores per corpus vector (float64 baseline = dim*8).
    tiers = [
        ("bruteforce", dim * 8, lambda: sim.knn_bruteforce(emb, query_ids=qids, k=k)),
        ("lsh", dim * 8 + 8, lambda: sim.lsh_bucket_ann(emb, query_ids=qids, k=k)),
        ("ivf", dim * 8 + 4, lambda: sim.ivf_ann(emb, query_ids=qids, k=k)),
        ("ivf_stored", dim * 8 + 4, lambda: sim.ivf_query_stored(spark, idx, query_ids=qids, k=k)),
        ("pq", 8 * 1 + 8, lambda: sim.pq_ann(emb, query_ids=qids, k=k)),
        ("pq_stored", 8 * 1 + 8, lambda: sim.pq_query_stored(spark, pq_idx, emb, query_ids=qids, k=k)),
        ("opq", 8 * 1 + 8, lambda: sim.opq_ann(emb, query_ids=qids, k=k)),
        ("ivfpq", 8 * 1 + 8 + 4, lambda: sim.ivfpq_ann(emb, query_ids=qids, k=k)),
        ("sq8", dim * 1 + 8, lambda: sim.sq_ann(emb, query_ids=qids, k=k)),
        ("sq8_stored", dim * 1 + 8, lambda: sim.sq_query_stored(spark, sq_idx, emb, query_ids=qids, k=k)),
        ("ivfsq", dim * 1 + 8 + 4, lambda: sim.ivfsq_query_stored(spark, ivfsq_idx, emb, query_ids=qids, k=k)),
    ]
    print(f"# sf_dir={sf_dir} n={n} dim={dim} k={k} (float64 flat = {dim * 8} B/vec)")
    print(f"{'tier':<12}{'ship_s':>8}{'recall@k':>10}{'B/vec':>8}{'vs_flat':>9}")
    for name, bytes_per_vec, mk in tiers:
        t = timed(mk)
        r = recall(mk())
        print(
            f"{name:<12}{t:>8.2f}{r:>10.2f}{bytes_per_vec:>8}"
            f"{dim * 8 / bytes_per_vec:>8.1f}x"
        )
    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(pq_idx, ignore_errors=True)
    shutil.rmtree(sq_idx, ignore_errors=True)
    shutil.rmtree(ivfsq_idx, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
