"""Similarity search over embedding columns (array<float>).

Two tiers:

- Brute-force cosine top-k — the exactness baseline and the verifier for
  the approximate tier. Query set broadcasts against the corpus; per-pair
  math is JVM-side (functions/vectors.py). Cost is |Q|·|N|; fine when the
  query set is small or as a per-bucket kernel.
- Random-hyperplane LSH — the 100 TB path: vectors land in sign-pattern
  buckets; only same-bucket candidates get exact scoring. Recall is
  tunable via number of tables/hyperplanes (tested vs brute force).

Similarities are rounded BEFORE ranking so that cross-engine ulp noise
cannot reorder the top-k; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parallel_map_reduce_spark.functions.hashing import hash64
from parallel_map_reduce_spark.functions.vectors import cosine, to_double_array


def knn_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim) with k rows per query.
    The query side is broadcast — the corpus is never shuffled, so this
    scales to any corpus size at O(|Q|) memory per executor.
    """
    if query_ids is None:
        query_ids = list(range(10))
    base = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("vec")
    )
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("vec")), 6)
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from the portable hash —
    reproducible across runs/engines without RNG state."""
    import hashlib

    coords = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{plane_idx}:{d}".encode()).hexdigest()
        v = int(h[:15], 16) / float(1 << 60)  # [0, 1)
        coords.append(2.0 * v - 1.0)
    return coords


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH; exact cosine
    only within the query's buckets.

    Each of `num_tables` tables assigns a num_planes-bit sign-pattern
    bucket from its own hyperplane set; a corpus vector is a candidate if
    it shares a bucket with the query in ANY table (union of candidates,
    deduped before scoring). Recall/cost dial: more tables → higher
    recall, more candidates; more planes → smaller buckets, lower cost,
    lower recall. Defaults (4 planes × 8 tables) target near-uniform
    embeddings — tightly clustered real-world embeddings prune far
    better at the same settings. At scale, repartition by (table, bucket)
    so each bucket scan is partition-local.
    """
    if query_ids is None:
        query_ids = list(range(10))
    base = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("vec")
    )
    table_buckets = []
    for t in range(num_tables):
        bucket = None
        for p in range(num_planes):
            plane = F.array(
                *[F.lit(c) for c in _hyperplane(dim, t * num_planes + p)]
            )
            dot_p = F.aggregate(
                F.zip_with(F.col("vec"), plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(dot_p >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        table_buckets.append(
            F.struct(F.lit(t).alias("tbl"), bucket.cast("int").alias("bucket"))
        )
    bucketed = base.select(
        F.col(id_col),
        F.col("vec"),
        F.explode(F.array(*table_buckets)).alias("bk"),
    ).select(id_col, "vec", "bk.tbl", "bk.bucket")
    queries = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("tbl"),
        F.col("bucket"),
    )
    sim = F.round(cosine(F.col("qvec"), F.col("vec")), 6)
    scored = (
        bucketed.join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), F.col("vec"), F.col("qvec"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            F.col("neighbor_id"),
            sim.alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    Correctness-tier all-pairs implementation; the oracle for LSH-based
    near-dup at scale (bucket first, then this kernel per bucket).
    """
    base = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("vec")
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("vec").alias("vec_a"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("vec").alias("vec_b"))
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_ann(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into `num_centroids` cells; each query scores
    exactly only against the `nprobe` nearest cells.

    The quantizer is trained once (KMeans, fixed seed — deterministic on
    the same data) and its centroids — a few KB — become literal
    expressions, so cell assignment and probe selection are pure JVM
    arithmetic: per-centroid squared-L2 via zip_with/aggregate, argmin via
    array_min over (dist, cid) structs (struct ordering = lexicographic).

    Scale posture: train the quantizer on a SAMPLE (`.sample()` before
    fit) at 100 TB; corpus cell assignment is one narrow projection, and
    the probe join is an equality join on cid with the (tiny) query side
    broadcast — the corpus never shuffles. Repartitioning the corpus BY
    cid once (write-time clustering) makes every probe partition-local,
    the on-disk layout FAISS calls the inverted file.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if query_ids is None:
        query_ids = list(range(10))
    base = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("vec")
    )
    train = base.select(array_to_vector(F.col("vec")).alias("features"))
    model = KMeans(k=num_centroids, seed=42, maxIter=max_iter).fit(train)
    centers = [list(map(float, c)) for c in model.clusterCenters()]

    def _dist_cid(vec_col_ref):
        cells = []
        for cid, center in enumerate(centers):
            c_lit = F.array(*[F.lit(x) for x in center])
            d2 = F.aggregate(
                F.zip_with(vec_col_ref, c_lit, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            cells.append(F.struct(d2.alias("dist"), F.lit(cid).alias("cid")))
        return F.array(*cells)

    assigned = base.withColumn("cid", F.array_min(_dist_cid(F.col("vec"))).getField("cid"))
    probes = (
        assigned.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("vec").alias("qvec"),
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(_dist_cid(F.col("vec"))), lambda s: s.getField("cid")
                    ),
                    1,
                    nprobe,
                )
            ).alias("cid"),
        )
    )
    sim = F.round(cosine(F.col("qvec"), F.col("vec")), 6)
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
