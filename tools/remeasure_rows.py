"""Isolated quiet-host re-measure of flagged bench rows.

Protocol (PLANS.md, rounds 10-11): a row whose sweep number moved more
than the ~1.4x identical-code noise band gets a dedicated 5-run
re-measure on an otherwise idle host before being called a real
regression.  This script runs exactly that: one Spark session, the
standard bench warmup, then N timed runs of each named row, printing
per-run times + median + the host fingerprint so the read is one
comparison against the prior round's quiet value.

Usage: python tools/remeasure_rows.py knn_pq_ann_ship streaming_tumbling_counts
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

RUNS = int(os.environ.get("REMEASURE_RUNS", "5"))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: remeasure_rows.py <row> [<row> ...]", file=sys.stderr)
        return 2

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parallel_map_reduce_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("remeasure")
    qs = entrymod.queries()

    # r10-and-earlier bench.py has no _host_probe; the control worktree
    # protocol copies this script into old checkouts, so degrade gracefully.
    host = bench._host_probe() if hasattr(bench, "_host_probe") else {}
    print(f"# host_probe: {json.dumps(host)}", flush=True)

    # Same warmup as bench.py: JVM/codegen + Arrow workers.
    qs["wordcount"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(32, numPartitions=32).select(
        _warm(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    # Ship rows aren't registered queries; rebuild the same lambdas
    # bench.py uses for the ANN ship tier.
    from parallel_map_reduce_spark.operators import similarity as _sim
    from parallel_map_reduce_spark.operators.queries_llm import (
        KNN_K,
        KNN_QUERY_IDS,
    )
    from parallel_map_reduce_spark.sources.tables import load_table

    def _emb():
        return load_table(spark, sf_dir, "embeddings")

    ship = {
        "knn_pq_ann_ship": lambda: _sim.pq_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_ivfpq_ann_ship": lambda: _sim.ivfpq_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
        "knn_ivf_ann_ship": lambda: _sim.ivf_ann(
            _emb(), query_ids=KNN_QUERY_IDS, k=KNN_K
        ),
    }

    results = {}
    for name in names:
        if name in ship:
            mk = ship[name]

            def run(mk=mk):
                mk().write.format("noop").mode("overwrite").save()

        elif name in qs:
            q = qs[name]

            def run(q=q):
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()

        else:
            print(f"# unknown row: {name}", file=sys.stderr)
            continue
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            run()
            times.append(round(time.perf_counter() - t0, 3))
        # statistics.median interpolates for even RUNS overrides; the
        # upper-middle pick was only correct for odd counts (ADVICE r12).
        med = round(statistics.median(times), 3)
        results[name] = {"runs": times, "median": med}
        print(f"# {name}: runs={times} median={med}", flush=True)

    print(json.dumps({"host_probe": host, "rows": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
