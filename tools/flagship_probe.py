#!/usr/bin/env python3
"""Quick flagship + host probe: the reference-corpus wordcount timed
exactly as bench.py times it (same split sizing, same shuffle
partitions, warm + 5 runs) plus the bench's host fingerprint — the
pair that separates "the host degraded" from "the code regressed"
without running the full sweep (~40 s total vs ~35 min).

Healthy-host reference points (r10 close): flagship best ~0.24 s,
md5 scaling >24x, steal ~0%. The r11 degraded host measured
0.45-0.60 s / 20x / 11% on byte-identical code (see PLANS.md r11
bench note for the worktree control experiment).

Usage: python tools/flagship_probe.py [reps]
"""

from __future__ import annotations

import glob
import math
import os
import sys
import time

# Resolve the repo root from this file's location, NOT a hardcoded
# path: the control-experiment protocol runs this script from scratch
# worktrees of old commits, and a hardcoded /root/repo would silently
# measure the wrong checkout — the exact confound the tool exists to
# remove (ADVICE r11).
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DEFAULT_CORPUS = "/root/reference/files"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_CORPUS

    import bench

    print("host:", bench._host_probe(), flush=True)

    from parallel_map_reduce_spark.operators.wordcount import wordcount
    from parallel_map_reduce_spark.session import get_spark
    from parallel_map_reduce_spark.sources.tables import read_text_lines

    ref_paths = sorted(
        p
        for p in glob.glob(os.path.join(corpus_dir, "*.txt"))
        if "small" not in p
    )
    if not ref_paths:
        print("no reference corpus; host probe only")
        return
    spark = get_spark("flagship_probe")
    total = sum(os.path.getsize(p) for p in ref_paths)
    split = min(
        max(math.ceil(total / 32), 768 * 1024), 128 * 1024 * 1024
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def run() -> None:
        wordcount(read_text_lines(spark, ref_paths), "value").write.format(
            "noop"
        ).mode("overwrite").save()

    run()  # warm
    res = []
    for _ in range(reps):
        t = time.monotonic()
        run()
        res.append(round(time.monotonic() - t, 3))
    best = min(res)
    print(
        f"flagship: {res} best {best} "
        f"({round(13.25 / best, 1)} MB/s vs baseline 30.4)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
