#!/usr/bin/env python3
"""Measure MinHash-LSH banding sensitivity: (num_hashes, bands) → wall
time, candidate volume, and pair recall vs the exact tier.

Banding theory: with b bands of r = num_hashes/b rows, a pair at jaccard s
becomes a candidate with p = 1 - (1 - s^r)^b; the S-curve midpoint is
~(1/b)^(1/r). Larger r → fewer, higher-precision candidates (cheaper
verify, lower recall near the threshold); more bands → the opposite. This
script puts NUMBERS on that trade at a given sf_dir so the banding knob —
the #1 thing a user tunes at scale — has measured guidance (PLANS.md).

All pairs are exact-jaccard VERIFIED, so precision is 1.0 by construction
and recall = |lsh_pairs| / |exact_pairs| at the same threshold.

Usage: python tools/bench_lsh_banding.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = [  # (num_hashes, bands) → rows r = num_hashes // bands
    (12, 6),  # r=2: recall-heavy, candidate-heavy
    (12, 4),  # r=3: the registered default
    (16, 4),  # r=4: VERDICT r3 ask
    (16, 2),  # r=8: precision-heavy, candidate-light
]
THRESHOLD = 0.5


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from parallel_map_reduce_spark.operators import dedup
    from parallel_map_reduce_spark.session import get_spark
    from parallel_map_reduce_spark.sources.tables import load_table

    spark = get_spark("lsh-banding")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)

    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
        .select("id_a", "id_b")
        .collect()
    }
    print(f"exact pairs at t={THRESHOLD}: {len(exact)}  ({sf_dir})")
    print(f"{'hashes':>7} {'bands':>6} {'r':>3} {'wall_s':>7} {'n_cand':>8} "
          f"{'n_pairs':>8} {'recall':>7}")
    for num_hashes, bands in CONFIGS:
        r = num_hashes // bands

        def run():
            dedup.minhash_lsh_dedup_pairs(
                docs, num_hashes=num_hashes, bands=bands, threshold=THRESHOLD
            ).write.format("noop").mode("overwrite").save()

        run()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        n_cand = dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(docs, num_hashes=num_hashes).localCheckpoint(
                eager=True
            ),
            num_hashes=num_hashes,
            bands=bands,
        ).count()
        pairs = {
            (row["id_a"], row["id_b"])
            for row in dedup.minhash_lsh_dedup_pairs(
                docs, num_hashes=num_hashes, bands=bands, threshold=THRESHOLD
            )
            .select("id_a", "id_b")
            .collect()
        }
        assert pairs <= exact, "verified LSH pairs must be a subset of exact"
        recall = len(pairs) / len(exact) if exact else float("nan")
        print(
            f"{num_hashes:>7} {bands:>6} {r:>3} {best:>7.2f} {n_cand:>8} "
            f"{len(pairs):>8} {recall:>7.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
