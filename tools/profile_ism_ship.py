#!/usr/bin/env python3
"""Phase attribution for the incremental_semantic_dedup_ship bench row
(VERDICT r10 #2: 3.19 -> 4.38 s isolated m3 on unchanged code — name
the phase or recoup it).

Replays the exact bench setup (IVF index on the even-id half built
OUTSIDE the clock, one odd-id batch admission timed) and splits the
admission into its four sequential phases, each forced with the same
noop sink / eager checkpoint the real operator uses:

  entry     recover_store_slices + centroids collect + model load
  cross     probe-UDF explode + broadcast join vs invfile + cosine
            filter + groupBy(min) -> localCheckpoint   (cross search)
  gram      survivors anti-join + blocked within-batch exact Gram
            (embedding_all_pairs_blocked) -> noop
  cc+asm    connected_components on the intra edges + final status
            assembly -> noop                             (driver loop)

Phases are cumulative-independent (each re-derives its inputs from the
previous phase's checkpoint, mirroring the operator's own dataflow), so
the shares sum to ~the full-call time; a separate full-call timing per
repetition sanity-checks that. N repetitions (default 5), medians
printed per phase plus the full call.

Usage: python tools/profile_ism_ship.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

# Repo root from this file's location, not hardcoded: a checkout
# elsewhere (scratch worktree controls) must profile ITS OWN code
# (ADVICE r11).
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import numpy as np
    from pyspark.sql import functions as F

    from parallel_map_reduce_spark.operators import similarity as sim
    from parallel_map_reduce_spark.operators.curation_extras import (
        recover_store_slices,
    )
    from parallel_map_reduce_spark.operators.dedup import (
        connected_components,
    )
    from parallel_map_reduce_spark.operators.queries_llm import (
        EMBED_DUP_THRESHOLD,
    )
    from parallel_map_reduce_spark.session import get_spark
    from parallel_map_reduce_spark.sources.tables import load_table

    spark = get_spark("profile_ism_ship")
    emb = load_table(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="pmr_spark_prof_semdedup_")
    threshold = EMBED_DUP_THRESHOLD
    try:
        sim.ivf_build_index(emb.filter(F.col("vec_id") % 2 == 0), idx)
        batch_src = emb.filter(F.col("vec_id") % 2 == 1)

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        stats: dict[str, list[float]] = {
            k: [] for k in ("entry", "cross", "gram", "cc+asm", "full")
        }
        for _ in range(reps):
            # full call, as the bench times it
            t0 = time.monotonic()
            noop(
                sim.incremental_semantic_dedup(
                    spark, batch_src, idx, threshold=threshold
                )
            )
            stats["full"].append(time.monotonic() - t0)

            # phase replay (operator body, split at its checkpoints)
            t0 = time.monotonic()
            recover_store_slices(idx)
            crows = sorted(
                spark.read.parquet(f"{idx}/centroids").collect(),
                key=lambda r: r["cid"],
            )
            _, probe_cids = sim._ivf_udfs(
                np.array([r["center"] for r in crows]), 4
            )
            stats["entry"].append(time.monotonic() - t0)

            t0 = time.monotonic()
            b = batch_src.select(
                F.col("vec_id"),
                sim.to_double_array(F.col("embedding")).alias("qvec"),
            ).localCheckpoint(eager=True)
            probes = b.select(
                F.col("vec_id").alias("id_n"), "qvec"
            ).withColumn("cid", F.explode(probe_cids(F.col("qvec"))))
            inv = spark.read.parquet(f"{idx}/invfile")
            cross_dup = (
                inv.join(F.broadcast(probes), "cid")
                .filter(
                    F.round(
                        sim.cosine(F.col("qvec"), F.col("vec")), 6
                    )
                    >= threshold
                )
                .groupBy("id_n")
                .agg(F.min(F.col("vec_id")).alias("dup_of"))
                .localCheckpoint(eager=True)
            )
            stats["cross"].append(time.monotonic() - t0)

            t0 = time.monotonic()
            survivors = b.join(
                cross_dup.withColumnRenamed("id_n", "vec_id"),
                "vec_id",
                "left_anti",
            )
            intra = sim.embedding_all_pairs_blocked(
                survivors,
                threshold=threshold,
                num_blocks=4,
                id_col="vec_id",
                vec_col="qvec",
            ).localCheckpoint(eager=True)
            stats["gram"].append(time.monotonic() - t0)

            t0 = time.monotonic()
            comps = connected_components(intra.select("id_a", "id_b"))
            out = (
                b.select("vec_id")
                .join(
                    cross_dup.withColumnRenamed("id_n", "vec_id"),
                    "vec_id",
                    "left",
                )
                .join(
                    comps.select(
                        F.col("u").cast("long").alias("vec_id"),
                        F.col("label").alias("_comp"),
                    ),
                    "vec_id",
                    "left",
                )
                .select(
                    "vec_id",
                    F.when(
                        F.col("dup_of").isNotNull(), F.lit("cross_dup")
                    )
                    .when(
                        F.col("_comp").isNotNull()
                        & (F.col("_comp") != F.col("vec_id")),
                        F.lit("batch_dup"),
                    )
                    .otherwise(F.lit("kept"))
                    .alias("status"),
                )
            )
            noop(out)
            stats["cc+asm"].append(time.monotonic() - t0)

        def med(xs: list[float]) -> float:
            return sorted(xs)[len(xs) // 2]

        phase_sum = sum(
            med(stats[k]) for k in ("entry", "cross", "gram", "cc+asm")
        )
        print("reps:", reps, "sf:", sf_dir)
        for k in ("entry", "cross", "gram", "cc+asm", "full"):
            print(
                f"{k:7s} median {med(stats[k]):7.3f}s  "
                f"all {[round(x, 3) for x in sorted(stats[k])]}"
            )
        print(f"phase-sum {phase_sum:.3f}s (vs full median "
              f"{med(stats['full']):.3f}s)")
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
