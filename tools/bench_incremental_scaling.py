#!/usr/bin/env python3
"""Incremental-dedup scaling: per-ingest cost vs kept-corpus size.

The incremental contract says per-ingest work is O(batch) + O(scan of
the kept SIGNATURE store) — never O(kept corpus text). This measures
it: a FIXED 500-doc batch deduped against kept corpora of growing
size, (a) with stored signatures (the production two-phase form) and
(b) recomputing kept signatures from text (what a naive per-ingest
job would do). The stored-signature column should stay near-flat while
the recompute column grows with the kept corpus.

Usage: python tools/bench_incremental_scaling.py [sf_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators.curation_extras import (
    incremental_lsh_dedup,
)
from parallel_map_reduce_spark.operators.dedup import minhash_signatures
from parallel_map_reduce_spark.session import get_spark
from parallel_map_reduce_spark.sources.tables import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_incremental_scaling")
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    batch = docs.filter(F.col("doc_id") >= n - 500).localCheckpoint(eager=True)
    run_dir = tempfile.mkdtemp(prefix="pmr_bench_incr_")
    print(f"# batch=500 docs, kept sizes scale up; corpus n={n}")
    print("| kept_docs | stored_sigs_s | recompute_sigs_s | statuses |")
    print("|-----------|---------------|------------------|----------|")
    for frac in (1, 3, 6, 9):
        kept = docs.filter(F.col("doc_id") < frac * (n - 500) // 9)
        k = kept.count()
        store = os.path.join(run_dir, f"sigs_{frac}")
        minhash_signatures(kept).write.mode("overwrite").parquet(store)

        def run(sig):
            ts = []
            for _ in range(2):
                t0 = time.monotonic()
                out = incremental_lsh_dedup(
                    batch, kept, kept_signatures=sig
                )
                cnt = out.count()
                ts.append(time.monotonic() - t0)
            return min(ts), cnt

        t_stored, c1 = run(spark.read.parquet(store))
        t_reco, c2 = run(None)
        assert c1 == c2 == 500
        print(f"| {k} | {t_stored:.2f} | {t_reco:.2f} | {c1} |")
    shutil.rmtree(run_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
