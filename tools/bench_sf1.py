"""Opt-in sf1 scale tier for the job-count-sensitive headline rows
(VERDICT r13 "Next round" #7).

Motivation: BENCH_r13's scaling block showed the sf0.1 suite is
scheduler/driver-overhead-bound (8-cpu total beats 32-cpu), so further
job-count wins at sf0.1 risk measuring noise. This tool re-times the
~10 rows whose r13/r14 deltas were job-count eliminations at 10× the
data, where the eliminated work is data-sized and the claim is
falsifiable.

Deterministic data: /root/testdata is read-only and has no sf1, so the
tier generates its own documents/embeddings tables (seeded numpy →
pyarrow; same schema, vocabulary style, cluster/near-dup structure as
the sf0.1 tables, 10× the rows) under $SPARK_GRAFT_SF1_DIR (default
/tmp/pmr_spark_sf1). Generation is idempotent and stamped with the
generator version; identical bytes across runs, so round-over-round
sf1 comparisons are apples to apples. This tier has NO DuckDB oracle —
correctness stays the driver's sf0.01/sf0.1 gate; this measures time
only, with bench.py's exact timing protocol (_measure: median-of-3 for
MEDIAN3 rows, best-of-2 otherwise; noop sink).

Usage: python tools/bench_sf1.py [row ...]   (default: the tier list)
Writes bench_out/BENCH_SF1_<stamp>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

GEN_VERSION = 1  # bump to force regeneration on layout changes
N_DOCS = 50_000  # 10x sf0.1
N_VECS = 20_000  # 10x sf0.1
DIM = 64
N_CLUSTERS = 10

# The job-count-sensitive tier: rows whose r13/r14 wins were checkpoint
# fusions / job eliminations / overlap, where sf0.1 cannot separate the
# win from scheduler noise.
TIER = [
    "incremental_semantic_dedup_chain",
    "ism_audit_query",
    "pipeline_curate_corpus",
    "retract_and_readmit",
    "incremental_lsh_dedup",
    "kmeans_train_converged",
    "bpe_train_vocab",
    "bpe_encode_stats",
    "semantic_dedup_keep_corpus_ann",
    "dedup_group_assignment",
    "pipeline_training_batches",
    "ngram_jaccard_pairs_prefix",
]

VOCAB = [
    "spark", "line", "column", "order", "small", "sort", "fast",
    "value", "scan", "hash", "slow", "group", "batch", "part",
    "vector", "query", "agg", "table", "key", "stream", "window",
    "join", "filter", "customer", "data", "big", "row", "the",
]


def _gen_documents(rng):
    """50k docs in the sf0.1 style: word salads over the small shared
    vocabulary, Zipf-ish doc lengths, ~0.5% planted near-dup clone
    pairs (suffix-perturbed copies) and a few exact dups — the same
    structural knobs the sf0.1 table exhibits, 10× the rows."""
    import numpy as np

    langs = np.array(["en", "zh", "de", "fr"])
    texts: list[str] = []
    lengths = np.clip(rng.lognormal(3.2, 0.7, N_DOCS).astype(int), 8, 400)
    vocab = np.array(VOCAB)
    for i in range(N_DOCS):
        words = vocab[rng.integers(0, len(vocab), lengths[i])]
        texts.append(" ".join(words.tolist()))
    # planted near-dups: doc i clones doc i-1 with a 2-word suffix tweak
    for i in range(200, N_DOCS, 200):
        texts[i] = texts[i - 1] + " cloneme tail"
    for i in range(1000, N_DOCS, 1000):  # exact dups
        texts[i] = texts[i - 1]
    return {
        "doc_id": list(range(N_DOCS)),
        "text": texts,
        "lang": langs[rng.integers(0, len(langs), N_DOCS)].tolist(),
        "source": [f"src{int(x)}" for x in rng.integers(0, 20, N_DOCS)],
        "n_chars": [len(t) for t in texts],
    }


def _gen_embeddings(rng):
    """20k unit-norm vectors in 10 clusters with ~0.05% of pairs above
    the 0.4 cosine threshold (the sf0.1 rate), plus planted >=0.95
    near-dup copies so the semantic dedup rows do real component
    work."""
    import numpy as np

    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 2.0
    labels = rng.integers(0, N_CLUSTERS, N_VECS)
    vecs = centers[labels] * 0.35 + rng.standard_normal((N_VECS, DIM))
    # planted near-dups: every 100th vector is a tiny perturbation of
    # its predecessor (cos >= ~0.99)
    for i in range(100, N_VECS, 100):
        vecs[i] = vecs[i - 1] + 0.02 * rng.standard_normal(DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return {
        "vec_id": list(range(N_VECS)),
        "embedding": [v.tolist() for v in vecs],
        "label": [int(x) for x in labels],
    }


def ensure_sf1_dir() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/pmr_spark_sf1")
    stamp = os.path.join(out, f"_GENERATED_v{GEN_VERSION}")
    if os.path.exists(stamp):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    docs = _gen_documents(rng)
    pq.write_table(pa.table(docs), os.path.join(out, "documents.parquet"))
    emb = _gen_embeddings(rng)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(emb["vec_id"], pa.int64()),
                "embedding": pa.array(
                    emb["embedding"], pa.list_(pa.float64())
                ),
                "label": pa.array(emb["label"], pa.int64()),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
    )
    with open(stamp, "w") as f:
        f.write("deterministic seed=42\n")
    return out


def main() -> int:
    names = sys.argv[1:] or TIER
    sf1_dir = ensure_sf1_dir()

    import bench

    from parallel_map_reduce_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench_sf1")
    qs = entrymod.queries()

    # bench.py's warmup
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

    host = bench._host_probe()
    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"# skip unknown row {name}", file=sys.stderr)
            continue

        def run_query(q=qs[name]):
            q(spark, sf1_dir).write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"sf1:{name}")
        timings[name] = bench._measure(run_query, name)
        print(f"# {name}: {timings[name]}s", flush=True)

    line = {
        "metric": "sf1_tier_total_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "gen_version": GEN_VERSION,
        "n_docs": N_DOCS,
        "n_vecs": N_VECS,
        "host_probe": host,
    }
    os.makedirs(os.path.join(REPO_ROOT, "bench_out"), exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    path = os.path.join(REPO_ROOT, "bench_out", f"BENCH_SF1_{stamp}.json")
    with open(path, "w") as f:
        json.dump(line, f, indent=1)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
