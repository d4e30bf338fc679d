#!/usr/bin/env python3
"""Measure the naive-vs-prefix exact-jaccard crossover on Zipfian shingles.

PLANS.md argues the crossover analytically (naive inverted-index self-join
pays f² rows per shingle appearing in f docs; the testdata corpus maxes out
at f≈7 so the naive tier wins there). This script MEASURES it: synthetic
corpora where a shared boilerplate block appears in a controlled fraction of
documents (hot-shingle document frequency f swept over ~1e1..1e3), timing

  naive  = dedup.ngram_jaccard_pairs         (inverted-index self-join)
  prefix = dedup.ngram_jaccard_pairs_prefix  (Bayardo AllPairs; identical output)
  capped = dedup.ngram_jaccard_pairs_capped  (drops hot shingles — DIFFERENT
           contract: jaccard in the capped universe; timed for context only)

and asserting naive/prefix output set-equality at every point (the pytest
twin of this check is tests/test_llm_ops.py::
test_prefix_equals_naive_on_zipfian_boilerplate).

Usage: python tools/bench_skew_crossover.py [n_docs] [f1 f2 ...]
Defaults: 3000 docs, hot-f sweep 10 100 300 1000.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def make_skewed_docs(spark, n_docs: int, hot_f: int, n_clone_pairs: int = 40):
    """Corpus where `hot_f` docs share a boilerplate block (the Zipfian
    head: ~13 shingles each at document frequency hot_f) on top of
    per-doc unique text (the tail: every shingle at f=1 except clones).
    `n_clone_pairs` true near-duplicates give the tiers a non-trivial
    answer to agree on."""
    boiler = " ".join(f"boiler{i}" for i in range(15))
    rows = []
    for d in range(n_docs):
        body = " ".join(f"w{d}x{i}" for i in range(40))
        text = body + " " + boiler if d < hot_f else body
        rows.append((d, text))
    # clones: doc n_docs+i duplicates doc i's body with a tiny suffix edit
    for i in range(n_clone_pairs):
        body = " ".join(f"w{i}x{j}" for j in range(40))
        suffix = " " + boiler if i < hot_f else ""
        rows.append((n_docs + i, body + " zz" + str(i) + suffix))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    fs = [int(x) for x in sys.argv[2:]] or [10, 300, 1000, 2000]
    thresholds = [0.2, 0.5, 0.8]

    from parallel_map_reduce_spark.operators import dedup
    from parallel_map_reduce_spark.session import get_spark

    spark = get_spark("skew-crossover")
    tiers = {
        "naive": dedup.ngram_jaccard_pairs,
        "prefix": dedup.ngram_jaccard_pairs_prefix,
        "capped": dedup.ngram_jaccard_pairs_capped,
    }
    # warm codegen on a tiny corpus
    tiny = make_skewed_docs(spark, 50, 5)
    for fn in tiers.values():
        fn(tiny).write.format("noop").mode("overwrite").save()

    print(
        f"{'t':>4} {'hot_f':>6} {'naive_s':>8} {'prefix_s':>9} {'capped_s':>9}"
        "  equal  n_pairs"
    )
    for f in fs:
        docs = make_skewed_docs(spark, n_docs, f).localCheckpoint(eager=True)
        for thr in thresholds:
            t: dict[str, float] = {}
            for name, fn in tiers.items():
                def run():
                    fn(docs, threshold=thr).write.format("noop").mode(
                        "overwrite"
                    ).save()
                run()
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    run()
                    best = min(best, time.perf_counter() - t0)
                t[name] = best
            naive = {
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in tiers["naive"](docs, threshold=thr).collect()
            }
            prefix = {
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in tiers["prefix"](docs, threshold=thr).collect()
            }
            eq = naive == prefix
            print(
                f"{thr:>4} {f:>6} {t['naive']:>8.2f} {t['prefix']:>9.2f}"
                f" {t['capped']:>9.2f}  {str(eq):>5}  {len(naive)}"
            )
            if not eq:
                print("  MISMATCH", sorted(naive ^ prefix)[:5])
                return 1
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
