"""Curation operators: Bloom decontamination, deterministic exact-n
carve-outs, incremental LSH dedup, asymmetric containment,
content-defined chunking, cluster-sharded semantic dedup, and the
multi-round BPE trainer.

Staged with library code + property tests + pre-proven oracle
generators in round 4; registered (operators/queries_curation.py) in
round 5 per PLANS.md "Round-5 window plan".

Reference provenance: like the rest of the LLM-curation surface these
generalize the reference's aggregation pipeline (tokenize → hash →
aggregate, src/omp_count_words.cpp:49-367) to the operations a training
-data pipeline needs at 100 TB; they follow published designs (Bloom
1970 CACM space/time trade-off hashing; deterministic carve-outs per
GPT-3 App. C / The Pile §2's held-out split methodology; Broder
SEQUENCES'97 containment; LBFS/rsync content-defined chunking; ABBAS et
al. 2023 SemDeDup cluster sharding; Sennrich et al. 2016 BPE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from parallel_map_reduce_spark.functions.hashing import (
    hash64,
    universal_hash,
    universal_params,
)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------
#
# decontaminate_against_eval (textstats.py) broadcasts the DISTINCT eval
# shingle set — right when the eval benchmark is MBs, but the broadcast
# grows linearly with the eval corpus (a 10 GB eval suite is ~10^8
# shingles ≈ several GB broadcast: dead at 1000 executors). The Bloom
# variant compresses the eval side to a fixed m-bit bitset (default
# 2^18 bits = 32 KB) independent of eval size, at the cost of a bounded,
# deterministic false-positive rate — and Bloom membership can only
# over-report, so the flag set is a guaranteed SUPERSET of the exact
# tier's (property-tested): safe for contamination filtering, where a
# false positive drops a clean doc but a false negative ships a
# contaminated one.


def _bloom_positions(shingle: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of one shingle — portable md5-based base hash
    + universal family, both reproducible in DuckDB for the r5 oracle."""
    base = hash64(shingle)
    return [
        (universal_hash(base, a, b) % F.lit(m_bits)).cast("long")
        for a, b in universal_params(k)
    ]


def bloom_bitset(
    shingles: DataFrame,
    shingle_col: str = "shingle",
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """(word_idx, word) 64-bit words of the m-bit Bloom bitset over the
    distinct values of ``shingle_col``.

    Scale shape: one shuffle over ≤ m/64 word keys (4096 rows at the
    default m) regardless of input size — partial ``bit_or`` aggregation
    collapses each partition's positions map-side first.
    """
    pos = shingles.select(
        F.explode(F.array(*_bloom_positions(F.col(shingle_col), m_bits, k))).alias(
            "pos"
        )
    )
    # shiftleft's bit-count arg must be a literal in the Python API —
    # the expression form takes a column.
    return pos.groupBy((F.col("pos") / 64).cast("long").alias("word_idx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        ).alias("word")
    )


def bloom_decontaminate(
    docs: DataFrame,
    eval_mod: int = 50,
    id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter twin of textstats.decontaminate_against_eval: per
    training document, how many of its distinct 3-gram shingles the
    eval-side Bloom bitset reports as present, with the same ≥20%
    integer-arithmetic flag.

    Output: (id, n_sh, n_bloom, maybe_contaminated). Per shingle the
    Bloom answer is exact-or-false-positive, never false-negative, so
    ``n_bloom >= n_shared`` row-for-row and the flagged set is a
    superset of the exact tier's.

    Scale shape: the eval side collapses to a 32 KB bitset (m/8 bytes —
    constant in eval-corpus size, vs the exact tier's linear shingle-set
    broadcast); the training side is one scan + map-side bit probes +
    one per-doc shuffle. The bitset rides a 1-row broadcast as a
    word_idx→word map.
    """
    from parallel_map_reduce_spark.operators.dedup import explode_shingles

    sh = explode_shingles(docs, id_col=id_col)
    eval_sh = sh.filter(F.col(id_col) % eval_mod == 0).select("shingle").distinct()
    bitset = (
        bloom_bitset(eval_sh, m_bits=m_bits, k=k)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("word_idx", "word")))
            ).alias("bloom")
        )
    )

    train = sh.filter(F.col(id_col) % eval_mod != 0).select(
        F.col(id_col),
        *[
            p.alias(f"_p{i}")
            for i, p in enumerate(
                _bloom_positions(F.col("shingle"), m_bits, k)
            )
        ],
    )
    probed = train.crossJoin(F.broadcast(bitset))
    hits = [
        F.expr(
            f"(shiftright(coalesce(try_element_at(bloom, "
            f"CAST(_p{i} / 64 AS BIGINT)), CAST(0 AS BIGINT)), "
            f"CAST(_p{i} % 64 AS INT)) & 1) = 1"
        )
        for i in range(k)
    ]
    all_set = hits[0]
    for h in hits[1:]:
        all_set = all_set & h
    return (
        probed.select(F.col(id_col), all_set.alias("_hit"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("_hit"), 1).otherwise(0)).alias("n_bloom"),
        )
        .select(
            id_col,
            "n_sh",
            "n_bloom",
            (F.col("n_bloom") * 5 >= F.col("n_sh")).alias("maybe_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic exact-n carve-outs
# ---------------------------------------------------------------------------
#
# stratified_sample_deterministic (queries_llm.py) is a Bernoulli
# hash-threshold sample: shuffle-free, but the output SIZE is binomial.
# Eval carve-outs need exactly n rows (a 5,000-doc held-out set is a
# contract, not an expectation), so these rank by the same portable
# hash and cut at n.


def sample_exact_n(
    df: DataFrame, n: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Exactly ``min(n, count)`` rows, chosen by portable-hash order —
    deterministic across runs, partitionings, and engines.

    Scale shape: compiles to TakeOrderedAndProject (per-partition top-n
    + single merge of n-row heaps on the driver-side reducer) — no full
    sort, no full shuffle; n must fit one task's memory, which holds for
    any carve-out small enough to be an eval set.
    """
    return df.orderBy(
        hash64(F.col(id_col).cast("string"), seed=seed).asc(),
        F.col(id_col).asc(),
    ).limit(n)


def stratified_exact_n(
    df: DataFrame,
    strata_col: str,
    n_per: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n_per, |stratum|)`` rows per stratum, by the same
    portable-hash order within each stratum.

    Scale shape: one shuffle on ``strata_col``; the rank-≤-n predicate
    compiles to WindowGroupLimit, so each task keeps an n_per-row heap
    per stratum instead of materializing + sorting whole strata. Skewed
    strata stay bounded: the group-limit prunes to n_per rows before
    the final sort within each partition.
    """
    w = Window.partitionBy(strata_col).orderBy(
        hash64(F.col(id_col).cast("string"), seed=seed).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per)
        .drop("_rk")
    )


# ---------------------------------------------------------------------------
# Incremental near-dup dedup (new batch vs an already-deduped corpus)
# ---------------------------------------------------------------------------
#
# The registered dedup tiers (dedup.py) dedup one corpus against itself.
# At 100 TB the common shape is INGESTION: yesterday's corpus is already
# deduped and its MinHash signatures are a stored table; today's crawl
# batch must be deduped against it WITHOUT re-pairing kept×kept — the
# incremental property that makes daily ingestion O(batch) instead of
# O(corpus). Same design as the reference-cited Broder/Manku pipelines'
# persistent signature store; only the band join's pair filter changes.


def _overlap(*thunks):
    """Run independent Spark actions from a small driver thread pool
    (guide §2.6 "overlap independent jobs" — curation_pipeline._overlap's
    twin for this module): actions are only sequential because driver
    code calls them sequentially, so two independent eager
    materializations can share the cluster instead of each paying full
    scheduler latency back to back. Each thunk computes a frame
    byte-identical to its sequential form (independent inputs, no shared
    mutable state); only the wall-clock interleaving changes. Results in
    thunk order; the first exception propagates."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def incremental_lsh_dedup(
    new_docs: DataFrame,
    kept_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    kept_signatures: DataFrame | None = None,
    new_signatures: DataFrame | None = None,
    return_new_signatures: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Dedup a new batch against an already-deduped kept corpus.

    Returns one row per new document: (id, status, dup_of) where status
    is ``kept`` (survives; dup_of = -1), ``cross_dup`` (verified
    jaccard ≥ threshold with some kept doc; dup_of = the smallest such
    kept id), or ``batch_dup`` (near-dup component within the surviving
    batch; dup_of = the component's smallest new id, which is the
    survivor). dup_of uses a -1 sentinel rather than NULL so the column
    stays integral through pandas fetch paths on both engines.
    Documents too short to shingle always survive (no signature — same
    convention as the batch tiers). Ids must be unique across both
    frames.

    Scale shape — the incremental property: kept-side band buckets join
    only against NEW-side buckets, so no kept×kept pair is ever
    generated and per-ingest work scales with the batch, not the
    corpus. Pass ``kept_signatures`` (the persisted signature table —
    the Broder/Manku pipeline's durable artifact, written once when
    each batch is admitted) and the kept corpus' TEXT is read only for
    the verified-candidate semi-join — a point-lookup-sized subset —
    never scanned; omitted, signatures are recomputed so the function
    stays self-contained. Verification joins shingle sets computed ONLY
    for docs appearing in some candidate pair (semi-join first), and
    the within-batch component formation runs on batch-sized edges via
    pointer-jumped min-label propagation.

    ``new_signatures`` (r13 optimization, guide §1.2): the caller may
    pass the batch's already-materialized signature table (MinHash is
    deterministic, so the values are identical to recomputation) — it is
    semi-joined to ``new_docs`` ids so a superset table is safe.
    ``return_new_signatures=True`` returns ``(result, sig_new)`` so a
    multi-phase caller (retract_and_readmit) can append the admit
    phase's signatures to its store without a recompute pass.
    """
    from parallel_map_reduce_spark.operators.dedup import (
        band_buckets,
        connected_components,
        minhash_signatures,
        shingle_sets,
    )

    if new_signatures is not None:
        # Eager like the other branches (ADVICE r13): the semi-join is
        # consumed by BOTH concurrently-submitted candidate jobs below
        # plus the sets_new semi-join, and with return_new_signatures
        # the caller appends it to a store — one tiny materialization
        # job beats recomputing the join per consumer and hands the
        # caller a cache-backed frame, matching the other branches.
        sig_new = new_signatures.join(
            new_docs.select(id_col), id_col, "left_semi"
        ).localCheckpoint(eager=True)
        sig_kept = (
            kept_signatures
            if kept_signatures is not None
            else minhash_signatures(
                kept_docs, text_col, id_col, num_hashes, shingle_n
            ).localCheckpoint(eager=True)
        )
    elif kept_signatures is None:
        # Both signature tables need computing and are independent —
        # overlap their materializations (guide §2.6).
        sig_new, sig_kept = _overlap(
            lambda: minhash_signatures(
                new_docs, text_col, id_col, num_hashes, shingle_n
            ).localCheckpoint(eager=True),
            lambda: minhash_signatures(
                kept_docs, text_col, id_col, num_hashes, shingle_n
            ).localCheckpoint(eager=True),
        )
    else:
        sig_new = minhash_signatures(
            new_docs, text_col, id_col, num_hashes, shingle_n
        ).localCheckpoint(eager=True)
        sig_kept = kept_signatures
    bk_new = band_buckets(sig_new, id_col, num_hashes, bands)
    bk_kept = band_buckets(sig_kept, id_col, num_hashes, bands)
    join_keys = ["band"] + [f"k{r}" for r in range(num_hashes // bands)]

    # Cross candidates (new × kept only — never kept × kept) and
    # within-batch candidates (new × new, ordered) share no inputs
    # beyond the materialized signature tables — overlap them too.
    cross_cand, intra_cand = _overlap(
        lambda: (
            bk_new.join(bk_kept.withColumnRenamed(id_col, "_kid"), join_keys)
            .select(F.col(id_col).alias("id_n"), F.col("_kid").alias("id_k"))
            .distinct()
            .localCheckpoint(eager=True)
        ),
        lambda: (
            bk_new.join(bk_new.withColumnRenamed(id_col, "_rid"), join_keys)
            .filter(F.col(id_col) < F.col("_rid"))
            .select(F.col(id_col).alias("id_a"), F.col("_rid").alias("id_b"))
            .distinct()
            .localCheckpoint(eager=True)
        ),
    )

    # Shingle sets only for docs that appear in some candidate pair.
    new_ids = (
        cross_cand.select(F.col("id_n").alias(id_col))
        .union(intra_cand.select(F.col("id_a").alias(id_col)))
        .union(intra_cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sets_new = shingle_sets(
        new_docs.join(new_ids, id_col, "left_semi"), text_col, id_col, shingle_n
    ).localCheckpoint(eager=True)
    sets_kept = shingle_sets(
        kept_docs.join(
            cross_cand.select(F.col("id_k").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        ),
        text_col,
        id_col,
        shingle_n,
    )

    def _verified(cands: DataFrame, a: str, b: str, sa: DataFrame, sb: DataFrame):
        la = sa.select(F.col(id_col).alias(a), F.col("sh").alias("sh_a"))
        lb = sb.select(F.col(id_col).alias(b), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            cands.join(la, a)
            .join(lb, b)
            .filter((inter / union) >= threshold)
            .select(a, b)
        )

    cross = _verified(cross_cand, "id_n", "id_k", sets_new, sets_kept)
    cross_dup = cross.groupBy("id_n").agg(F.min("id_k").alias("dup_of"))

    # Within-batch components over docs that survived the cross pass.
    intra = _verified(intra_cand, "id_a", "id_b", sets_new, sets_new)
    intra_live = intra.join(
        cross_dup.select(F.col("id_n").alias("id_a")), "id_a", "left_anti"
    ).join(cross_dup.select(F.col("id_n").alias("id_b")), "id_b", "left_anti")
    comps = connected_components(intra_live, "id_a", "id_b")

    base = new_docs.select(F.col(id_col))
    result = (
        base.join(cross_dup.withColumnRenamed("id_n", id_col), id_col, "left")
        .join(
            comps.select(
                F.col("u").cast("long").alias(id_col),
                F.col("label").alias("_comp"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.when(F.col("dup_of").isNotNull(), F.lit("cross_dup"))
            .when(
                F.col("_comp").isNotNull() & (F.col("_comp") != F.col(id_col)),
                F.lit("batch_dup"),
            )
            .otherwise(F.lit("kept"))
            .alias("status"),
            # -1 sentinel (not NULL) for survivors: a nullable BIGINT
            # drifts to float64 + NaN through a pandas fetch path, which
            # is exactly the cross-engine hash hazard the dtype guard
            # (tests/test_oracle_dtypes.py) exists to block
            F.coalesce(
                F.col("dup_of"),
                F.when(F.col("_comp") != F.col(id_col), F.col("_comp")),
                F.lit(-1).cast("long"),
            ).alias("dup_of"),
        )
    )
    if return_new_signatures:
        return result, sig_new
    return result


# ---------------------------------------------------------------------------
# Asymmetric containment detection
# ---------------------------------------------------------------------------
#
# Symmetric Jaccard misses the quote/boilerplate case: a short document
# reproduced verbatim inside a much longer one has containment
# |A∩B|/|A| ≈ 1 but Jaccard |A∩B|/|A∪B| ≈ |A|/|B| ≈ 0 — below any
# sane dedup threshold. Containment is the Broder (SEQUENCES'97)
# "resemblance vs containment" distinction; detecting it is how a
# pipeline drops syndicated articles quoted inside aggregator pages.


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Directed near-containment pairs: (contained_id, container_id,
    containment) where containment = |sh(contained) ∩ sh(container)| /
    |sh(contained)| ≥ threshold, contained_id ≠ container_id. A doc
    pair can appear in both directions (mutual containment = high
    Jaccard).

    Scale shape: same inverted-index join as the exact Jaccard tier —
    pairs sharing no shingle never materialize; sizes are counted over
    the same index frame, materialized once. ``max_df`` caps hot-shingle
    fan-out exactly like the DF-capped Jaccard tier (containment
    measured in the capped universe); at 100 TB use it, or swap the
    candidate stage for bottom-k containment sketches (Cohen's
    summaries) — the verify stage is unchanged either way. The per-doc
    sizes frame is corpus-cardinality, so it is deliberately NOT
    broadcast-hinted: the sizes join keys on contained_id (the pair
    frame's grouping key, already clustered), and AQE is free to pick a
    broadcast only when the statistics actually fit.
    """
    from parallel_map_reduce_spark.operators.dedup import (
        df_capped_shingles,
        explode_shingles,
    )

    sh = (
        df_capped_shingles(docs, text_col, id_col, shingle_n, max_df)
        if max_df is not None
        else explode_shingles(docs, text_col, id_col, shingle_n)
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .select(
            F.col(f"a.{id_col}").alias("contained_id"),
            F.col(f"b.{id_col}").alias("container_id"),
        )
        .filter(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col(id_col).alias("contained_id"), F.col("n_sh").alias("n_a")
    )
    cont = F.col("n_common") / F.col("n_a")
    # Filter the UNROUNDED ratio; round only the reported column (same
    # boundary rule as the Jaccard tiers).
    return (
        common.join(sa, "contained_id")
        .filter(cont >= threshold)
        .withColumn("containment", F.round(cont, 4))
        .select("contained_id", "container_id", "containment")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------
#
# chunk_documents (queries_llm) cuts at fixed token offsets: insert one
# word at the front of a document and every chunk boundary shifts, so
# chunk-level dedup sees an entirely new set of chunks. Content-defined
# chunking (the LBFS/rsync family: boundaries where a sliding-window
# hash hits a divisor pattern) keeps boundaries attached to CONTENT —
# after a prefix edit, all chunks beyond the first unchanged boundary
# hash identically, which is what makes chunk-level dedup catch
# shifted/near-shifted duplicates that doc-level tiers score as
# different documents.


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunks: (id, chunk_idx, n_tokens, chunk_hash,
    chunk_text), cut after every token position whose trailing
    ``window``-token hash ≡ 0 (mod ``divisor``) — expected chunk length
    ``divisor`` tokens, geometric tail. Documents shorter than
    ``window`` tokens form one chunk. Chunks concatenate back to the
    tokenized document (property-tested), and boundaries are a pure
    function of local content, so a prefix edit relocates only chunks
    up to the first surviving boundary.

    Scale shape: everything is per-row array arithmetic on the
    materialized token array (one md5 per window position + integer
    mod), zero shuffles, one generator — same plan class as
    duplicated_span_stats, and the same two Catalyst traps avoided:
    lambdas receive only materialized column references, and the
    generator consumes the chunk-array EXPRESSION (never a projected
    attribute, which re-derives the whole array per element).
    """
    from parallel_map_reduce_spark.operators.dedup import tokens_df

    tdf = tokens_df(docs, text_col, id_col)
    n = F.size("tk")
    # token positions j (1-based) where the window ending at j cuts
    win_start = lambda j: j - (window - 1)  # noqa: E731
    wh = lambda j: hash64(  # noqa: E731
        F.concat_ws(
            " ",
            *[
                F.element_at(F.col("tk"), win_start(j) + o)
                for o in range(window)
            ],
        ),
        0,
    )
    cuts_expr = F.filter(
        F.sequence(F.lit(window), n), lambda j: wh(j) % divisor == 0
    )
    # ensure the document end is always a cut; drop a duplicate if the
    # last window already cut there
    cuts = F.array_distinct(
        F.concat(
            F.when(n >= window, cuts_expr).otherwise(F.array()), F.array(n)
        )
    )
    prevs = F.concat(F.array(F.lit(0)), F.slice(cuts, 1, F.size(cuts) - 1))
    chunks = F.zip_with(
        prevs,
        cuts,
        lambda p, c: F.concat_ws(" ", F.slice(F.col("tk"), p + 1, c - p)),
    )
    return (
        tdf.filter(n > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(F.split("chunk_text", " ")).alias("n_tokens"),
            hash64(F.col("chunk_text"), 0).alias("chunk_hash"),
            "chunk_text",
        )
    )


# ---------------------------------------------------------------------------
# Cluster-sharded semantic dedup (SemDeDup's actual shape)
# ---------------------------------------------------------------------------
#
# semantic_dedup_keep_corpus_ann bounds the quadratic cosine work by
# hyperplane-LSH bucket occupancy — a probabilistic knob. The SemDeDup
# paper (Abbas et al. 2023 §2) instead SHARDS BY CLUSTER: k-means-assign
# every embedding, then dedup only within each cluster. Bucket size is
# then k, a knob set directly (more clusters → smaller shards),
# independent of hash-function luck — the composition that scales the
# semantic tier to 100 TB with a deterministic memory bound per kernel.
# Cross-cluster near-dup pairs are deliberately out of scope (the
# paper's approximation); since sharding can only REMOVE edges, the
# kept set provably contains the global exact tier's (pytest-pinned).


def cluster_sharded_pairs(
    embeddings: DataFrame,
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_above: int | None = 8192,
    num_blocks: int = 8,
    _task_probe=None,
) -> DataFrame:
    """Within-cluster cosine near-dup pairs: (cluster, id_a, id_b,
    cosine_sim), id_a < id_b, sim ≥ threshold, pairs only between
    vectors assigned to the SAME cluster. ``assigned`` is an
    (id, cluster) frame — in this repo from
    similarity.nearest_centroid_assign, in production any kmeans
    assignment table.

    Scale shape: clusters BELOW ``block_above`` occupancy shuffle once
    on the cluster key into a per-cluster Arrow kernel. Clusters AT OR
    ABOVE it — the Zipfian-hot topic heads that would otherwise run
    their whole n²/2 Gram inside ONE task — are decomposed exactly like
    embedding_all_pairs_blocked (similarity.py): each hot vector fans
    out to the ``num_blocks`` block-pair groups it participates in
    (block = pmod(id, B); group (bi, bj), bi ≤ bj), so one hot
    cluster's quadratic work runs as B(B+1)/2 PARALLEL tile tasks
    instead of one straggler. Every unordered pair lands in exactly one
    group (cross groups score left×right only; diagonal groups score
    the upper triangle), so the decomposition is value-neutral by
    construction — pytest-pinned bit-identical on a deliberately hot
    cluster. Both paths use the SHARED sequential-fold kernel
    (functions/gram.py), so every cosine is bit-identical to the
    JVM/DuckDB folds and the driver can value-hash the full output;
    per-kernel memory stays O(block² + n·dim) via the tiled pair
    emission. The occupancy split costs one partial-agg count over the
    (id, cluster) assignment table — no vectors move for it.
    ``block_above=None`` disables the split (the pre-r8 single-task
    shape). ``_task_probe`` is a test-only accumulator the hot-path
    kernel adds its partition id to, proving tiles really run in
    distinct tasks.
    """
    import numpy as np
    import pandas as pd

    from parallel_map_reduce_spark.functions.gram import cosine_pairs
    from parallel_map_reduce_spark.functions.vectors import to_double_array

    base = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("vec")
    )
    amap = assigned.select(F.col(id_col), "cluster")
    clustered = base.join(amap, id_col)

    out_schema = "cluster int, id_a long, id_b long, cosine_sim double"
    empty = pd.DataFrame(
        {
            "cluster": pd.Series(dtype="int32"),
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cosine_sim": pd.Series(dtype="float64"),
        }
    )

    def _frame(cluster, ia, ib, sims) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cluster": np.full(len(ia), cluster, dtype="int32"),
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cosine_sim": sims,
            }
        )

    def shard_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf["vec"].to_numpy())
        ia, ib, sims = cosine_pairs(ids, mat, threshold)
        return _frame(pdf["cluster"].iloc[0], ia, ib, sims)

    if block_above is None:
        return clustered.groupBy("cluster").applyInPandas(
            shard_pairs, out_schema
        )

    # Occupancy split on the assignment table alone (no vectors move):
    # the hot list is at most a few head clusters — broadcast it.
    hot = (
        amap.groupBy("cluster")
        .count()
        .filter(F.col("count") >= block_above)
        .select("cluster")
    )
    small = clustered.join(F.broadcast(hot), "cluster", "left_anti")
    out_small = small.groupBy("cluster").applyInPandas(shard_pairs, out_schema)

    spark = embeddings.sparkSession
    bp = [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)]
    block_pairs = spark.createDataFrame(bp, "bi int, bj int")
    hot_rows = (
        clustered.join(F.broadcast(hot), "cluster")
        .withColumn("blk", F.pmod(F.col(id_col), F.lit(num_blocks)).cast("int"))
        .join(
            F.broadcast(block_pairs),
            (F.col("blk") == F.col("bi")) | (F.col("blk") == F.col("bj")),
        )
    )

    def tile_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if _task_probe is not None:
            from pyspark import TaskContext

            _task_probe.add({TaskContext.get().partitionId()})
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        left = pdf[pdf["blk"] == bi]
        ids_l = left[id_col].to_numpy()
        # guard BEFORE np.stack: an empty residue class would make
        # np.stack([]) raise and kill the query
        if len(ids_l) == 0 or (bi == bj and len(ids_l) < 2):
            return empty
        mat_l = np.stack(left["vec"].to_numpy())
        if bi == bj:
            ia, ib, sims = cosine_pairs(ids_l, mat_l, threshold)
        else:
            right = pdf[pdf["blk"] == bj]
            ids_r = right[id_col].to_numpy()
            if len(ids_r) == 0:
                return empty
            mat_r = np.stack(right["vec"].to_numpy())
            ia, ib, sims = cosine_pairs(
                ids_l, mat_l, threshold, ids_r=ids_r, mat_r=mat_r
            )
        return _frame(pdf["cluster"].iloc[0], ia, ib, sims)

    out_hot = hot_rows.groupBy("cluster", "bi", "bj").applyInPandas(
        tile_pairs, out_schema
    )
    return out_small.unionByName(out_hot)


# ---------------------------------------------------------------------------
# Multi-round BPE trainer
# ---------------------------------------------------------------------------
#
# queries_llm.bpe_merge_pairs ranks ONE merge round's candidates; a
# tokenizer is trained by ITERATING that round with the winning pair
# merged into a new symbol (Sennrich et al. 2016 alg. 1). Same driver-
# loop discipline as dedup.connected_components: per round one
# distributed agg plus ONE scalar argmax row to the driver (the loop
# control, not the data), and the vocabulary frame is localCheckpointed
# so each round's plan is O(1), not O(rounds).


def bpe_train_merges(
    docs: DataFrame, rounds: int = 12, text_col: str = "text"
) -> DataFrame:
    """Learn ``rounds`` BPE merges: (merge_round, lhs, rhs, pair_count),
    one row per round, pair_count = the winning pair's corpus-weighted
    frequency at the time it was chosen. Ties break lexicographically
    on (lhs, rhs) so the merge sequence is deterministic across runs,
    partitionings, and engines.

    Symbol-sequence encoding: a word's symbols are joined with TWO
    spaces and wrapped in single spaces (`` a  b  c ``), so the merge
    rewrite is one plain string replace of `` lhs  rhs `` with
    `` lhsrhs `` — non-overlapping left-to-right in both engines, which
    IS greedy BPE merge order, and each match leaves the neighbouring
    gaps' spaces intact so adjacent matches still fire
    (`` a  b  a  b `` → `` ab  ab `` in one pass).

    Scale shape: the corpus collapses to the (word, count) table first
    — the map-side-combined wordcount shuffle — so every round runs
    over |vocab| rows, not corpus tokens (the classic trick that makes
    BPE training tractable on TB corpora). Per round: one pair explode
    + partial agg, one 1-row TakeOrdered to the driver — ONE job. The
    merge rewrites stay LAZY (r13, guide §1.2): round k's job replays
    k-1 codegen'd replaces over the ONCE-checkpointed base vocab
    instead of paying a second materialization job per round — the
    replay is the same single vocab scan the materialization itself
    would do, plus string ops, and the plan depth is bounded by
    ``rounds`` (a small constant), so the job count halves at any
    corpus size.
    """
    return _bpe_train_merges_df(docs, rounds, text_col)


def _bpe_train_merges_list(
    docs: DataFrame, rounds: int, text_col: str
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge list (the loop control rows — O(rounds) scalars,
    not data). Split out so bpe_encode_stats can consume the list
    directly instead of round-tripping it through createDataFrame +
    collect (r13)."""
    from parallel_map_reduce_spark.operators.wordcount import wordcount

    wc = wordcount(docs, text_col)
    sym0 = F.concat(
        F.lit(" "),
        F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1  ")),
        F.lit(" "),
    )
    cur = wc.select(sym0.alias("sym"), F.col("count").alias("cnt")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        split = cur.select("cnt", F.split(F.trim(F.col("sym")), "  ").alias("s"))
        n = F.size(F.col("s"))
        adj = F.when(
            n >= 2,
            F.zip_with(
                F.slice(F.col("s"), 1, n - 1),
                F.slice(F.col("s"), 2, n - 1),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
            ),
        ).otherwise(F.array())
        pair_counts = (
            split.select("cnt", F.explode(adj).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = (
            pair_counts.orderBy(
                F.col("pair_count").desc(), F.col("lhs").asc(), F.col("rhs").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        merges.append((rnd, lhs, rhs, cnt))
        # lazy rewrite — no per-round materialization job (see
        # bpe_train_merges docstring, r13)
        cur = cur.select(
            F.replace(
                F.col("sym"),
                F.lit(f" {lhs}  {rhs} "),
                F.lit(f" {lhs}{rhs} "),
            ).alias("sym"),
            "cnt",
        )
    return merges


def _bpe_train_merges_df(
    docs: DataFrame, rounds: int, text_col: str
) -> DataFrame:
    return docs.sparkSession.createDataFrame(
        _bpe_train_merges_list(docs, rounds, text_col),
        "merge_round int, lhs string, rhs string, pair_count long",
    )


# ---------------------------------------------------------------------------
# Approx-percentile quality band (the quantile filter's 100 TB swap-in)
# ---------------------------------------------------------------------------
#
# quality_quantile_filter's docstring prescribes its scale path: swap
# the exact per-language PERCENT_RANK (a per-lang window SORT) for
# approx_percentile thresholds computed in one partial agg and
# broadcast back — same band, no global sort. This operator IS that
# swap, run as an audit: the approx band is computed the 100 TB way,
# the exact band runs in the same query, and the driver value-hashes
# the exact band's per-language aggregates plus booleans certifying the
# approximation (same contract as the ANN audit queries).


def quality_quantile_band_approx(
    docs: DataFrame,
    score_col_expr: Column,
    lo: float = 0.25,
    hi: float = 0.75,
    accuracy: int = 10000,
    id_col: str = "doc_id",
    max_disagree_frac_x20: int = 1,
) -> DataFrame:
    """(lang, n_docs, n_exact_band, sum_exact_band_ids,
    approx_band_ok): per language, the exact middle-quantile band's
    deterministic aggregates, plus a boolean asserting the
    approx-percentile band disagrees with the exact band on at most
    1/20 of the language's documents (KLL-sketch accuracy=10000 —
    measured disagreement is boundary-only, well under 1%).

    Scale shape: the approx thresholds are ONE partial+final agg (a
    mergeable quantile sketch per language, constant memory) broadcast
    back as k rows — no per-language sort anywhere on the ship path;
    the exact window runs here only because this is the audit twin.
    """
    s = docs.select(F.col(id_col), F.col("lang"), score_col_expr.alias("qs"))
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy(F.col("qs").asc(), F.col(id_col).asc())
    )
    flagged = s.withColumn(
        "_exact", (pr >= lo) & (pr <= hi)
    )
    thr = s.groupBy("lang").agg(
        F.percentile_approx("qs", [lo, hi], accuracy).alias("_t")
    )
    joined = flagged.join(F.broadcast(thr), "lang").withColumn(
        "_approx",
        (F.col("qs") >= F.element_at("_t", 1))
        & (F.col("qs") <= F.element_at("_t", 2)),
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("_exact").cast("long")).alias("n_exact_band"),
        F.sum(F.when(F.col("_exact"), F.col(id_col)).otherwise(0)).alias(
            "sum_exact_band_ids"
        ),
        (
            F.sum((F.col("_exact") != F.col("_approx")).cast("long")) * 20
            <= F.count(F.lit(1)) * max_disagree_frac_x20
        ).alias("approx_band_ok"),
    )


def quality_quantile_band_approx_oracle_sql(
    score_sql: str, lo: float = 0.25, hi: float = 0.75
) -> str:
    """Oracle: replay the EXACT band per language and expect the audit
    boolean TRUE. ``score_sql`` must compute the same score column the
    Spark side passes (rounded identically)."""
    return f"""
WITH s AS (SELECT doc_id, lang, {score_sql} AS qs FROM documents),
r AS (
  SELECT doc_id, lang, qs,
         PERCENT_RANK() OVER (PARTITION BY lang ORDER BY qs, doc_id) AS pr
  FROM s
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pr >= {lo} AND pr <= {hi} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_band,
       CAST(SUM(CASE WHEN pr >= {lo} AND pr <= {hi} THEN doc_id ELSE 0 END)
         AS BIGINT) AS sum_exact_band_ids,
       TRUE AS approx_band_ok
FROM r
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Gopher repetition filters (STAGED for round-6 registration)
# ---------------------------------------------------------------------------
#
# doc_repetition_stats (queries_llm) implements one of Gopher's
# repetition signals (duplicated-bigram fraction). Rae et al. 2021
# Table A1 specifies a FAMILY: for small n, the fraction of characters
# inside the single most frequent n-gram; for larger n, the fraction of
# characters inside ALL n-grams that occur more than once. Coverage here
# is occurrences × n-gram char length over the normalized (space-joined
# token) char length — the common reimplementation (Dolma, NeMo
# Curator) of the paper's metric; overlaps are not merged, matching
# those implementations.


def gopher_repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, top2_frac, top3_frac, dup5_frac, dup8_frac, dup_line_frac,
    dup_line_char_frac): Gopher-style repetition signals — fraction of
    normalized characters covered by the most frequent 2-/3-gram and by
    all duplicated 5-/8-grams, plus the WITHIN-document duplicate-line
    rows of Table A1 (fraction of line occurrences belonging to a
    repeated line, and the raw-character fraction those occurrences
    cover — distinct from line_dedup_stats, which dedups lines across
    the corpus). Documents with zero tokens are excluded; a document
    too short to form n-grams scores 0.0 for that n. Top-gram ties
    break on the lexicographically smallest gram (ties can differ in
    char length, so the tie-break is part of the metric's determinism
    contract).

    Scale shape: per n, one (id, gram) partial+final count agg over
    non-distinct n-gram rows and one per-doc agg — all corpus-linear;
    the per-doc joins are on the id key the doc aggs already clustered.
    All fractions are integer/integer divisions, bit-identical across
    engines before the single ROUND.
    """
    # base feeds SIX plan branches (four gram sizes + the line stats +
    # the output spine); aliased reuse replans each from the scan, so
    # materialize the tokenized frame once (the dedup.py
    # stored-signatures discipline) — without this one execution
    # re-scans and re-tokenizes the corpus per branch.
    from parallel_map_reduce_spark.functions.tokenize import tokens

    base = (
        docs.select(
            F.col(id_col),
            F.filter(tokens(F.col(text_col)), lambda w: w != F.lit("")).alias(
                "tk"
            ),
            F.split(F.col(text_col), "\n").alias("_ln"),
        )
        .filter(F.size("tk") > 0)
        .select(
            F.col(id_col),
            F.col("tk"),
            F.col("_ln"),
            F.length(F.concat_ws(" ", F.col("tk"))).alias("_dc"),
        )
        .localCheckpoint(eager=True)
    )

    def grams_df(n: int) -> DataFrame:
        size = F.size("tk")
        idx = F.sequence(F.lit(1), size - (n - 1))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("tk"), i + j) for j in range(n)]
            ),
        )
        arr = F.when(size >= n, grams).otherwise(F.array())
        return base.select(
            F.col(id_col), F.col("_dc"), F.explode(arr).alias("gram")
        ).groupBy(id_col, "_dc", "gram").agg(F.count(F.lit(1)).alias("cnt"))

    def top_frac(n: int, out: str) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(
            F.col("cnt").desc(), F.col("gram").asc()
        )
        return (
            grams_df(n)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col(id_col),
                (F.col("cnt") * F.length("gram") / F.col("_dc")).alias(out),
            )
        )

    def dup_frac(n: int, out: str) -> DataFrame:
        return (
            grams_df(n)
            .groupBy(id_col)
            .agg(
                (
                    F.sum(
                        F.when(
                            F.col("cnt") >= 2, F.col("cnt") * F.length("gram")
                        ).otherwise(0)
                    )
                    / F.first("_dc")
                ).alias(out)
            )
        )

    # Within-doc duplicate-line rows: explode the materialized line
    # array (safe — base is checkpointed, so InferFiltersFromGenerate
    # has nothing to re-derive), count per (doc, line), fold to the two
    # fractions. The char denominator counts every occurrence's raw
    # length; tokenized docs always have ≥1 non-empty char but the
    # zero-guard keeps the expression total.
    lg = (
        base.select(F.col(id_col), F.explode("_ln").alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dup_chars = F.sum(
        F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("line")).otherwise(0)
    )
    all_chars = F.sum(F.col("cnt") * F.length("line"))
    dl = lg.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0))
            / F.sum("cnt")
        ).alias("_dlf"),
        F.when(all_chars > 0, dup_chars / all_chars)
        .otherwise(F.lit(0.0))
        .alias("_dlcf"),
    )

    out = base.select(F.col(id_col))
    for frame in (
        top_frac(2, "_t2"),
        top_frac(3, "_t3"),
        dup_frac(5, "_d5"),
        dup_frac(8, "_d8"),
        dl,
    ):
        out = out.join(frame, id_col, "left")
    return out.select(
        id_col,
        *[
            F.round(F.coalesce(F.col(c), F.lit(0.0)), 6).alias(a)
            for c, a in (
                ("_t2", "top2_frac"),
                ("_t3", "top3_frac"),
                ("_d5", "dup5_frac"),
                ("_d8", "dup8_frac"),
                ("_dlf", "dup_line_frac"),
                ("_dlcf", "dup_line_char_frac"),
            )
        ],
    )


def gopher_repetition_stats_oracle_sql() -> str:
    def grams_cte(n: int) -> str:
        gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
        return f"""
g{n} AS (
  SELECT doc_id, dc, {gram} AS gram, COUNT(*) AS cnt
  FROM base CROSS JOIN UNNEST(generate_series(1, len(ws) - {n - 1})) AS t(i)
  GROUP BY 1, 2, 3
)"""

    def top_cte(n: int) -> str:
        return f"""
t{n} AS (
  SELECT doc_id, cnt * length(gram) * 1.0 / dc AS frac FROM (
    SELECT doc_id, dc, gram, cnt, row_number() OVER (
      PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
    FROM g{n}
  ) WHERE rn = 1
)"""

    def dup_cte(n: int) -> str:
        return f"""
d{n} AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) * 1.0
           / ANY_VALUE(dc) AS frac
  FROM g{n} GROUP BY doc_id
)"""

    return (
        f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS ws,
         string_split(text, chr(10)) AS lns
  FROM documents
),
base AS (
  SELECT doc_id, ws, lns, length(array_to_string(ws, ' ')) AS dc
  FROM toks WHERE len(ws) > 0
),"""
        + ",".join(
            [grams_cte(2), top_cte(2), grams_cte(3), top_cte(3)]
            + [grams_cte(5), dup_cte(5), grams_cte(8), dup_cte(8)]
        )
        + """,
lg AS (
  SELECT doc_id, line, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(lns) AS line FROM base)
  GROUP BY 1, 2
),
dl AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) * 1.0 / SUM(cnt)
           AS lfrac,
         CASE WHEN SUM(cnt * length(line)) > 0
              THEN SUM(CASE WHEN cnt >= 2 THEN cnt * length(line) ELSE 0 END)
                   * 1.0 / SUM(cnt * length(line))
              ELSE 0.0 END AS cfrac
  FROM lg GROUP BY doc_id
)
SELECT b.doc_id,
       ROUND(COALESCE(t2.frac, 0.0), 6) AS top2_frac,
       ROUND(COALESCE(t3.frac, 0.0), 6) AS top3_frac,
       ROUND(COALESCE(d5.frac, 0.0), 6) AS dup5_frac,
       ROUND(COALESCE(d8.frac, 0.0), 6) AS dup8_frac,
       ROUND(COALESCE(dl.lfrac, 0.0), 6) AS dup_line_frac,
       ROUND(COALESCE(dl.cfrac, 0.0), 6) AS dup_line_char_frac
FROM base b
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
LEFT JOIN d5 USING (doc_id)
LEFT JOIN d8 USING (doc_id)
LEFT JOIN dl USING (doc_id)
"""
    )


# ---------------------------------------------------------------------------
# Interpolated bigram language-model scoring
# ---------------------------------------------------------------------------
#
# unigram_lm_doc_scores (queries_llm) is the KenLM-shaped quality signal
# at order 1; real perplexity filters (CCNet, Gopher's quality stage)
# use higher-order models. This is the order-2 step with Jelinek-Mercer
# interpolation — λ·P_bigram + (1−λ)·P_unigram — which never assigns a
# seen-token bigram zero probability, so every log is finite without
# add-k fudging. All probabilities are ratios of exact integer counts,
# so per-position log-probs are bit-identical across engines; only the
# final mean is rounded (the same contract unigram_lm carries).


def bigram_lm_doc_scores(
    docs: DataFrame,
    lam: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): corpus-trained interpolated bigram
    LM, scoring each document by its mean position log-probability
    ln(λ·c(prev,w)/c(prev,·) + (1−λ)·c(w)/N). Documents with fewer than
    2 tokens have no bigram positions and are excluded (same convention
    as unigram_lm's zero-token docs).

    Scale shape: the model is two partial+final aggs (bigram counts,
    unigram counts) + a 1-row broadcast total; scoring joins each
    bigram position to the model on (prev, w) — Zipfian-skewed, the
    shuffle the skew.py salting recipes target at 100 TB. The context
    normalizer c(prev,·) reuses the bigram count frame (one extra agg
    over |bigram vocab| rows, never corpus positions).

    The token frame, the bigram-position frame, and the bigram-count
    model are each consumed by 2+ plan branches (tdf → bg/tok; bg →
    bgc/score join; bgc → ctx/score join) — aliased reuse Catalyst
    replans from the scan, so without materialization one execution
    re-scans and re-tokenizes the corpus ~5×. localCheckpoint(eager)
    is the in-session form of the "model is a stored table" design
    (same precedent as dedup.py's signature frames); a production run
    persists the counts model once and scores many corpora against it.
    """
    from parallel_map_reduce_spark.operators.dedup import tokens_df

    tdf = tokens_df(docs, text_col, id_col).localCheckpoint(eager=True)
    n = F.size("tk")
    bg = (
        tdf.filter(n >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice(F.col("tk"), 1, n - 1),
                    F.slice(F.col("tk"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("w")),
                )
            ).alias("bg"),
        )
        .select(id_col, "bg.prev", "bg.w")
        .localCheckpoint(eager=True)
    )
    bgc = (
        bg.groupBy("prev", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c_pw"))
        .localCheckpoint(eager=True)
    )
    ctx = bgc.groupBy("prev").agg(F.sum("c_pw").alias("c_prev"))
    tok = tdf.select(F.col(id_col), F.explode("tk").alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c_w"))
    total = uni.agg(F.sum("c_w").alias("n_total"))
    p = F.lit(lam) * F.col("c_pw") / F.col("c_prev") + F.lit(1 - lam) * F.col(
        "c_w"
    ) / F.col("n_total")
    return (
        bg.join(bgc, ["prev", "w"])
        .join(ctx, "prev")
        .join(uni, "w")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 4).alias("avg_logprob"),
        )
    )


def kn_trigram_lm_doc_scores(
    docs: DataFrame,
    d: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_trigrams, avg_logprob): interpolated Kneser-Ney trigram
    LM (Kneser & Ney 1995; Chen & Goodman 1999 eq. 18 — the KenLM
    default the CCNet pipeline scores with), trained on the corpus and
    scoring each document by its mean position log-probability. The
    order-3 step of the perplexity family whose order-2 rung is
    :func:`bigram_lm_doc_scores`:

        P(w|u,v) = max(c(uvw)-d, 0)/c(uv·) + d·N1+(uv·)/c(uv·) · P(w|v)
        P(w|v)   = max(N1+(·vw)-d, 0)/N1+(·v·)
                   + d·N1+(v·)/N1+(·v·) · Pcont(w)
        Pcont(w) = N1+(·w)/N1+(··)

    with the LOWER orders built from continuation (type) counts — KN's
    signature: "York" is frequent but only ever follows "New", so its
    unigram backoff weight is its distinct-context count, not its raw
    frequency. Every statistic derives from the ONE trigram count
    table (N1+(·vw) = distinct u per (v,w), etc.), so the model is
    self-consistent and the scored corpus is the training corpus —
    every position's counts exist and every denominator is positive.
    Docs with fewer than 3 tokens carry no trigram position and are
    excluded (the bigram scorer's <2-token convention).

    Cross-engine determinism (the counts-ratio discipline
    quality_classifier_train hardened): every per-position probability
    is ONE closed-form expression over BIGINT counts cast to double —
    identical expression tree in Spark and DuckDB, and the count
    aggregates themselves are exact in double (integer partial sums
    below 2^53 commute) — so only the final AVG(LN(p)) is rounded (4
    dp), exactly like the bigram row.

    Scale shape: the model is a chain of partial+final hash aggs over
    n-gram TYPES (trigram counts → context/type rollups), never over
    corpus positions; scoring joins each position to the model on
    (u,v,w)/(v,w)/(v)/(w) — Zipf-skewed joins, the skew.py salting
    recipes' target at 100 TB. The position frame and each count frame
    feed 2+ plan branches, so they localCheckpoint (the "model is a
    stored table" design; a production run persists the counts once
    and scores many corpora)."""
    from parallel_map_reduce_spark.operators.dedup import tokens_df

    tdf = tokens_df(docs, text_col, id_col)
    n = F.size("tk")
    s1 = F.slice(F.col("tk"), 1, n - 2)
    s2 = F.slice(F.col("tk"), 2, n - 2)
    s3 = F.slice(F.col("tk"), 3, n - 2)
    tg = (
        tdf.filter(n >= 3)
        .select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.zip_with(
                        s1,
                        s2,
                        lambda a, b: F.struct(a.alias("u"), b.alias("v")),
                    ),
                    s3,
                    lambda uv, c: F.struct(
                        uv["u"].alias("u"), uv["v"].alias("v"), c.alias("w")
                    ),
                )
            ).alias("t"),
        )
        .select(id_col, "t.u", "t.v", "t.w")
        .localCheckpoint(eager=True)
    )
    c3 = (
        tg.groupBy("u", "v", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c_uvw"))
        .localCheckpoint(eager=True)
    )
    ctx3 = c3.groupBy("u", "v").agg(
        F.sum("c_uvw").alias("c_uv"),
        F.count(F.lit(1)).cast("double").alias("n1p_uv"),
    )
    m2 = (
        c3.groupBy("v", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("n1p_dvw"))
        .localCheckpoint(eager=True)
    )
    mv = m2.groupBy("v").agg(
        F.sum("n1p_dvw").alias("n1p_dvd"),
        F.count(F.lit(1)).cast("double").alias("n1p_vd"),
    )
    wt = m2.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("n1p_dw")
    )
    tot = wt.agg(F.sum("n1p_dw").alias("n1p_tot"))
    p_cont = F.col("n1p_dw") / F.col("n1p_tot")
    p_mid = F.greatest(F.col("n1p_dvw") - F.lit(d), F.lit(0.0)) / F.col(
        "n1p_dvd"
    ) + (F.lit(d) * F.col("n1p_vd") / F.col("n1p_dvd")) * p_cont
    p_tri = F.greatest(F.col("c_uvw") - F.lit(d), F.lit(0.0)) / F.col(
        "c_uv"
    ) + (F.lit(d) * F.col("n1p_uv") / F.col("c_uv")) * p_mid
    return (
        tg.join(c3, ["u", "v", "w"])
        .join(ctx3, ["u", "v"])
        .join(m2, ["v", "w"])
        .join(mv, "v")
        .join(wt, "w")
        .join(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(F.log(p_tri)), 4).alias("avg_logprob"),
        )
    )


def kn_trigram_lm_doc_scores_oracle_sql(d: float = 0.75) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ws FROM documents),
tg AS (
  SELECT doc_id, ws[i] AS u, ws[i+1] AS v, ws[i+2] AS w
  FROM toks CROSS JOIN UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
),
c3 AS (SELECT u, v, w, count(*)::DOUBLE AS c_uvw FROM tg GROUP BY u, v, w),
ctx3 AS (SELECT u, v, sum(c_uvw) AS c_uv, count(*)::DOUBLE AS n1p_uv
         FROM c3 GROUP BY u, v),
m2 AS (SELECT v, w, count(*)::DOUBLE AS n1p_dvw FROM c3 GROUP BY v, w),
mv AS (SELECT v, sum(n1p_dvw) AS n1p_dvd, count(*)::DOUBLE AS n1p_vd
       FROM m2 GROUP BY v),
wt AS (SELECT w, count(*)::DOUBLE AS n1p_dw FROM m2 GROUP BY w),
tot AS (SELECT sum(n1p_dw) AS n1p_tot FROM wt)
SELECT t.doc_id, count(*) AS n_trigrams,
       ROUND(AVG(LN(
         GREATEST(c_uvw - {d}, 0.0) / c_uv
         + ({d} * n1p_uv / c_uv) * (
             GREATEST(n1p_dvw - {d}, 0.0) / n1p_dvd
             + ({d} * n1p_vd / n1p_dvd) * (n1p_dw / n1p_tot)
         )
       )), 4) AS avg_logprob
FROM tg t
JOIN c3 USING (u, v, w)
JOIN ctx3 USING (u, v)
JOIN m2 USING (v, w)
JOIN mv USING (v)
JOIN wt ON wt.w = t.w
CROSS JOIN tot
GROUP BY t.doc_id
"""


def bigram_lm_doc_scores_oracle_sql(lam: float = 0.8) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS w FROM toks),
uni AS (SELECT w, count(*)::DOUBLE AS c_w FROM tok GROUP BY w),
tot AS (SELECT sum(c_w) AS n_total FROM uni),
bg AS (
  SELECT doc_id, ws[i] AS prev, ws[i+1] AS w
  FROM toks CROSS JOIN UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
bgc AS (SELECT prev, w, count(*)::DOUBLE AS c_pw FROM bg GROUP BY prev, w),
ctx AS (SELECT prev, sum(c_pw) AS c_prev FROM bgc GROUP BY prev)
SELECT b.doc_id, count(*) AS n_bigrams,
       ROUND(AVG(ln({lam} * c_pw / c_prev + {1 - lam} * c_w / n_total)), 4)
         AS avg_logprob
FROM bg b
JOIN bgc USING (prev, w)
JOIN ctx USING (prev)
JOIN uni ON uni.w = b.w
CROSS JOIN tot
GROUP BY b.doc_id
"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing
# ---------------------------------------------------------------------------
#
# CCNet (Wenzek et al. 2020 §3.3) splits each language's corpus into
# head/middle/tail thirds by LM perplexity and trains preferentially on
# the head — the canonical composition of an LM quality signal with a
# per-language quantile cut. Built here on the interpolated bigram LM
# (higher mean log-prob == lower perplexity == head).


def ccnet_perplexity_buckets(
    docs: DataFrame,
    lam: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang, avg_logprob, bucket): per-language head/middle/tail
    thirds by bigram-LM mean log-probability (NTILE(3) over the ROUNDED
    score with doc-id tie-break, so bucket membership is deterministic
    and boundary-exact in both engines). Documents with fewer than 2
    tokens carry no LM score and are excluded, as in the scorer.

    Scale shape: the LM scoring plan (see bigram_lm_doc_scores) plus
    ONE window sort per language over (score, id) pairs — at 100 TB
    swap the exact NTILE for approx_percentile tercile thresholds, the
    same exact-vs-sketch split quality_quantile_filter_approx ships.
    """
    scores = bigram_lm_doc_scores(docs, lam, text_col, id_col)
    langs = docs.select(F.col(id_col), F.col("lang"))
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    return (
        scores.join(langs, id_col)
        .withColumn("_tile", F.ntile(3).over(w))
        .select(
            id_col,
            "lang",
            "avg_logprob",
            F.when(F.col("_tile") == 1, F.lit("head"))
            .when(F.col("_tile") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def ccnet_perplexity_buckets_oracle_sql(lam: float = 0.8) -> str:
    scorer = bigram_lm_doc_scores_oracle_sql(lam).strip()
    return f"""
WITH scores AS ({scorer})
SELECT doc_id, lang, avg_logprob,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM (
  SELECT s.doc_id, d.lang, s.avg_logprob,
         NTILE(3) OVER (PARTITION BY d.lang
                        ORDER BY s.avg_logprob DESC, s.doc_id ASC) AS nt
  FROM scores s JOIN documents d USING (doc_id)
)
"""


def kn_trigram_perplexity_buckets(
    docs: DataFrame,
    d: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang, avg_logprob, bucket): the CCNet tercile cut driven by
    the ORDER-3 Kneser-Ney LM — what the CCNet/KenLM pipeline actually
    ships (Wenzek et al. 2020 use a 5-gram KenLM; order 3 is the same
    estimator family at the testdata's vocabulary scale). Identical
    bucketing contract to :func:`ccnet_perplexity_buckets` — NTILE(3)
    per language over the ROUNDED score with id tie-break, so
    membership is deterministic and boundary-exact in both engines —
    only the scorer underneath changes. Docs with fewer than 3 tokens
    carry no trigram score and are excluded (the scorer's convention).

    Scale shape: the KN scoring plan (see kn_trigram_lm_doc_scores)
    plus one window sort per language over (score, id); the 100 TB
    swap-in for the exact NTILE is approx_percentile tercile
    thresholds, as in the bigram bucket row."""
    scores = kn_trigram_lm_doc_scores(docs, d, text_col, id_col)
    langs = docs.select(F.col(id_col), F.col("lang"))
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    return (
        scores.join(langs, id_col)
        .withColumn("_tile", F.ntile(3).over(w))
        .select(
            id_col,
            "lang",
            "avg_logprob",
            F.when(F.col("_tile") == 1, F.lit("head"))
            .when(F.col("_tile") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def kn_trigram_perplexity_buckets_oracle_sql(d: float = 0.75) -> str:
    scorer = kn_trigram_lm_doc_scores_oracle_sql(d).strip()
    return f"""
WITH scores AS ({scorer})
SELECT doc_id, lang, avg_logprob,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM (
  SELECT s.doc_id, d.lang, s.avg_logprob,
         NTILE(3) OVER (PARTITION BY d.lang
                        ORDER BY s.avg_logprob DESC, s.doc_id ASC) AS nt
  FROM scores s JOIN documents d USING (doc_id)
)
"""


# ---------------------------------------------------------------------------
# Draft DuckDB oracles for the r5 registrations
# ---------------------------------------------------------------------------
#
# Tested now (tests/test_curation_oracle_sql.py runs them through DuckDB
# against the Spark output with the driver's normalize-and-compare
# rules) so round-5 registration is a @register() call away. The CTE
# fragments mirror queries_llm's oracle SQL exactly (same token split,
# same shingle construction, same portable hashes).

_SPLIT_SQL = r"[ \t\n\r\x0b\x0c]+"
_TOKS_SQL = f"list_filter(regexp_split_to_array(text, '{_SPLIT_SQL}'), w -> w <> '')"
_TOKS_CTE_SQL = f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ws FROM documents)"
_SHINGLES_CTE_SQL = (
    _TOKS_CTE_SQL
    + """,
shingles AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM toks CROSS JOIN UNNEST(generate_series(1, greatest(len(ws)-2, 0))) AS t(i)
)"""
)


def sample_exact_n_oracle_sql(n: int, seed: int = 0) -> str:
    from parallel_map_reduce_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""
SELECT doc_id, lang, n_chars FROM documents
ORDER BY {h}, doc_id
LIMIT {n}
"""


def stratified_exact_n_oracle_sql(n_per: int, seed: int = 0) -> str:
    from parallel_map_reduce_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rk
  FROM documents
) t WHERE rk <= {n_per}
"""


def containment_pairs_oracle_sql(threshold: float) -> str:
    return (
        _SHINGLES_CTE_SQL
        + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
         COUNT(*) AS n_common
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT contained_id, container_id,
       ROUND(n_common * 1.0 / n_sh, 4) AS containment
FROM common JOIN sizes ON sizes.doc_id = common.contained_id
WHERE n_common * 1.0 / n_sh >= {threshold}
"""
    )


def bloom_decontaminate_oracle_sql(
    eval_mod: int = 50, m_bits: int = 1 << 18, k: int = 3
) -> str:
    # Per-shingle Bloom membership == all k positions present in the
    # eval-side position set, so the oracle needs no bitset arithmetic.
    from parallel_map_reduce_spark.functions.hashing import (
        hash64_sql,
        universal_hash_sql,
        universal_params,
    )

    pos = [
        f"(({universal_hash_sql('h', a, b)}) % {m_bits})"
        for a, b in universal_params(k)
    ]
    eval_union = "\n    UNION\n    ".join(
        f"SELECT {p} AS p FROM hashed WHERE doc_id % {eval_mod} = 0" for p in pos
    )
    hit = " AND ".join(f"{p} IN (SELECT p FROM eval_pos)" for p in pos)
    return (
        _SHINGLES_CTE_SQL
        + f""",
hashed AS (SELECT doc_id, {hash64_sql('shingle', 0)} AS h FROM shingles),
eval_pos AS (
    {eval_union}
)
SELECT doc_id, COUNT(*) AS n_sh,
       CAST(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
       (SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) * 5 >= COUNT(*))
         AS maybe_contaminated
FROM hashed WHERE doc_id % {eval_mod} <> 0
GROUP BY doc_id
"""
    )


def cdc_chunks_oracle_sql(window: int = 8, divisor: int = 64) -> str:
    from parallel_map_reduce_spark.functions.hashing import hash64_sql

    win = " || ' ' || ".join(
        f"ws[j-{window - 1 - o}]" for o in range(window)
    )
    wh = hash64_sql(f"({win})", 0)
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS ws FROM documents
),
base AS (
  SELECT doc_id, ws, len(ws) AS n,
    CASE WHEN len(ws) >= {window} THEN
      list_filter(generate_series({window}, len(ws)), j -> ({wh}) % {divisor} = 0)
    ELSE [] END AS cuts0
  FROM toks WHERE len(ws) > 0
),
cutsed AS (
  SELECT doc_id, ws,
         list_sort(list_distinct(list_append(cuts0, n))) AS cuts
  FROM base
),
chunked AS (
  SELECT doc_id,
    list_transform(cuts, (c, i) -> struct_pack(
      idx := i - 1,
      txt := array_to_string(ws[CASE WHEN i = 1 THEN 1 ELSE cuts[i-1] + 1 END : c], ' ')
    )) AS chunks
  FROM cutsed
)
SELECT doc_id,
       u.idx AS chunk_idx,
       len(string_split(u.txt, ' ')) AS n_tokens,
       {hash64_sql("u.txt", 0)} AS chunk_hash,
       u.txt AS chunk_text
FROM chunked, UNNEST(chunks) AS t(u)
"""


def incremental_lsh_dedup_oracle_sql(
    new_pred: str = "{t}.doc_id % 2 = 1",
    kept_pred: str = "{t}.doc_id % 2 = 0",
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> str:
    # Replays the exact operator: banded cross candidates (new×kept
    # only), verified by exact jaccard; banded intra candidates among
    # cross-survivors; recursive-CTE components; min-kept / component-
    # min canonicals.
    #
    # Predicate contract: ``new_pred``/``kept_pred`` are SQL boolean
    # expressions with a ``{t}`` placeholder wherever they reference the
    # document row's alias (e.g. ``"{t}.doc_id % 2 = 1"``) — the
    # generator substitutes the correct alias at each splice site, so
    # compound predicates and qualified columns stay valid SQL. The
    # splice is a plain string replace (NOT str.format), so predicates
    # containing other literal braces — regex quantifiers, struct
    # literals — pass through untouched; a predicate with no ``{t}`` at
    # all is rejected loudly rather than spliced into ambiguous SQL.
    from parallel_map_reduce_spark.functions.hashing import (
        hash64_sql,
        universal_hash_sql,
        universal_params,
    )

    mins = ",\n       ".join(
        f"MIN({universal_hash_sql('h', a, b)}) AS h{i}"
        for i, (a, b) in enumerate(universal_params(num_hashes))
    )
    rpb = num_hashes // bands
    band_match = " OR ".join(
        "("
        + " AND ".join(f"a.h{b * rpb + r} = b.h{b * rpb + r}" for r in range(rpb))
        + ")"
        for b in range(bands)
    )
    head = _SHINGLES_CTE_SQL.replace("WITH ", "WITH RECURSIVE ", 1)

    def _splice(pred: str, alias: str) -> str:
        if "{t}" not in pred:
            raise ValueError(
                f"predicate {pred!r} must reference the row alias via a "
                "'{t}' placeholder (e.g. '{t}.doc_id % 2 = 1')"
            )
        return pred.replace("{t}", alias)

    new_a, new_b = _splice(new_pred, "a"), _splice(new_pred, "b")
    kept_b = _splice(kept_pred, "b")
    new_d = _splice(new_pred, "documents")
    return (
        head
        + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
hashed AS (SELECT doc_id, {hash64_sql('shingle', 0)} AS h FROM shingles),
sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
xcand AS (
  SELECT a.doc_id AS id_n, b.doc_id AS id_k
  FROM sigs a JOIN sigs b
    ON ({new_a}) AND ({kept_b})
   AND ({band_match})
),
xver AS (
  SELECT p.id_n, p.id_k FROM (
    SELECT x.id_n, x.id_k, COUNT(*) AS n_common
    FROM xcand x
    JOIN shingles sa ON sa.doc_id = x.id_n
    JOIN shingles sb ON sb.doc_id = x.id_k AND sb.shingle = sa.shingle
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON p.id_n = sa.doc_id
  JOIN sizes sb ON p.id_k = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
),
cross_dup AS (SELECT id_n, MIN(id_k) AS dup_of FROM xver GROUP BY id_n),
icand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id AND ({new_a}) AND ({new_b})
   AND ({band_match})
),
iver AS (
  SELECT p.id_a, p.id_b FROM (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_common
    FROM icand c
    JOIN shingles sa ON sa.doc_id = c.id_a
    JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON p.id_a = sa.doc_id
  JOIN sizes sb ON p.id_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
    AND p.id_a NOT IN (SELECT id_n FROM cross_dup)
    AND p.id_b NOT IN (SELECT id_n FROM cross_dup)
),
sym AS (SELECT id_a AS u, id_b AS v FROM iver
        UNION ALL SELECT id_b, id_a FROM iver),
reach AS (SELECT u, v FROM sym
          UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS group_id FROM reach GROUP BY u)
SELECT d.doc_id,
       CASE WHEN cd.dup_of IS NOT NULL THEN 'cross_dup'
            WHEN comp.group_id IS NOT NULL AND comp.group_id <> d.doc_id
              THEN 'batch_dup'
            ELSE 'kept' END AS status,
       COALESCE(cd.dup_of,
                CASE WHEN comp.group_id <> d.doc_id THEN comp.group_id END,
                -1)
         AS dup_of
FROM (SELECT doc_id FROM documents WHERE {new_d}) d
LEFT JOIN cross_dup cd ON cd.id_n = d.doc_id
LEFT JOIN comp ON comp.doc_id = d.doc_id
"""
    )


def _bpe_rounds_cte_sql(rounds: int) -> str:
    # Replays the trainer's loop UNROLLED: each round is a
    # (pairs → best → rewritten vocab) CTE triple building on the
    # previous round's vocab; sym{k} carries the original word so the
    # encode-apply oracle can join documents back to their final
    # symbolization. Every multiply-referenced CTE is MATERIALIZED —
    # inlining best{k} (referenced 4×) would re-expand the whole
    # sym{k-1} chain per reference and go exponential in rounds. The
    # `` a  b  c `` double-gap symbol encoding makes the merge a plain
    # replace() in both engines (see bpe_train_merges).
    sql = (
        _TOKS_CTE_SQL
        + r""",
words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN UNNEST(ws) AS t(w)
  GROUP BY w
),
sym0 AS MATERIALIZED (
  SELECT word, ' ' || rtrim(regexp_replace(word, '(.)', '\1  ', 'g')) || ' ' AS sym,
         cnt
  FROM words
)"""
    )
    for k in range(1, rounds + 1):
        sql += f""",
pairs{k} AS (
  SELECT s[i] AS lhs, s[i+1] AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM (SELECT string_split(trim(sym), '  ') AS s, cnt FROM sym{k - 1})
  CROSS JOIN UNNEST(generate_series(1, len(s) - 1)) AS t(i)
  GROUP BY 1, 2
),
best{k} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count FROM pairs{k}
  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1
),
sym{k} AS MATERIALIZED (
  SELECT word,
         CASE WHEN (SELECT COUNT(*) FROM best{k}) = 0 THEN sym
         ELSE replace(sym,
                      (SELECT ' ' || lhs || '  ' || rhs || ' ' FROM best{k}),
                      (SELECT ' ' || lhs || rhs || ' ' FROM best{k}))
         END AS sym, cnt
  FROM sym{k - 1}
)"""
    return sql


def bpe_train_vocab_oracle_sql(rounds: int = 12) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_round, lhs, rhs, pair_count FROM best{k}"
        for k in range(1, rounds + 1)
    )
    return _bpe_rounds_cte_sql(rounds) + "\n" + union


# ---------------------------------------------------------------------------
# BPE encode-apply (STAGED for round-6 registration)
# ---------------------------------------------------------------------------
#
# The other half of tokenizer training: APPLY the learned merge table to
# the corpus and measure what it bought — per-document symbol counts and
# the fraction of symbols that are merged (multi-character) units, i.e.
# the compression the vocabulary achieves. In production this is the
# tokenize step of every training-data job; here it also closes the
# train → apply loop so both halves are driver-verified against one
# oracle replay.


def bpe_encode_stats(
    docs: DataFrame, rounds: int = 12, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, n_symbols, n_merged_symbols, merged_frac): encode
    every document with the ``rounds``-merge BPE vocabulary trained on
    the same corpus (bpe_train_merges), greedily applying merges in
    training order — the standard BPE encode rule.

    Scale shape: training runs once (O(rounds) passes over |vocab|);
    encoding is a chained codegen'd replace over the DISTINCT word
    table — never over corpus tokens — and documents join their tokens
    to the encoded vocab on the word key (the same Zipfian-skew shuffle
    as the LM scorers). The merge table itself is ``rounds`` scalar
    rows, broadcast into the plan as literals.
    """
    from parallel_map_reduce_spark.operators.dedup import tokens_df
    from parallel_map_reduce_spark.operators.wordcount import wordcount

    # consume the trainer's driver-side list directly — no
    # createDataFrame + collect round trip (r13)
    merges = _bpe_train_merges_list(docs, rounds, text_col)
    vocab = wordcount(docs, text_col).select("word")
    sym = F.concat(
        F.lit(" "),
        F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1  ")),
        F.lit(" "),
    )
    for _rnd, lhs, rhs, _cnt in merges:
        sym = F.replace(
            sym,
            F.lit(f" {lhs}  {rhs} "),
            F.lit(f" {lhs}{rhs} "),
        )
    syms = F.split(F.trim(sym), "  ")
    enc = vocab.select(
        F.col("word").alias("w"),
        F.size(syms).alias("n_syms"),
        F.size(F.filter(syms, lambda s: F.length(s) >= 2)).alias("n_merged"),
    )
    tok = tokens_df(docs, text_col, id_col).select(
        F.col(id_col), F.explode("tk").alias("w")
    )
    return (
        tok.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_symbols"),
            F.sum("n_merged").alias("n_merged_symbols"),
            F.round(F.sum("n_merged") / F.sum("n_syms"), 6).alias("merged_frac"),
        )
    )


def bpe_encode_stats_oracle_sql(rounds: int = 12) -> str:
    return (
        _bpe_rounds_cte_sql(rounds)
        + f""",
enc AS (
  SELECT word, string_split(trim(sym), '  ') AS syms FROM sym{rounds}
),
encstats AS (
  SELECT word,
         CAST(len(syms) AS BIGINT) AS n_syms,
         CAST(len(list_filter(syms, s -> length(s) >= 2)) AS BIGINT) AS n_merged
  FROM enc
),
tok AS (SELECT doc_id, unnest(ws) AS w FROM toks)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(n_syms) AS BIGINT) AS n_symbols,
       CAST(SUM(n_merged) AS BIGINT) AS n_merged_symbols,
       ROUND(SUM(n_merged) * 1.0 / SUM(n_syms), 6) AS merged_frac
FROM tok JOIN encstats ON encstats.word = tok.w
GROUP BY doc_id
"""
    )


# ---------------------------------------------------------------------------
# Gopher quality-signal bundle (STAGED for round-6 registration)
# ---------------------------------------------------------------------------
#
# gopher_repetition_stats covers Gopher's repetition table (A1, lower
# half); this is the upper half — the per-document quality heuristics
# and their combined accept/reject verdict (Rae et al. 2021, appendix
# A1.1). Everything is a counts-ratio over one projection, so the pass
# boolean is computed on UNROUNDED values that are bit-identical across
# engines (integer/integer division), and only the display ratios are
# rounded. Generalizes the reference's tokenize → per-token predicate
# shape (src/omp_count_words.cpp:49-118) to multi-signal document
# filtering.

# Gopher's "must contain >= 2 of" stopword list (A1.1) — a fixed
# 8-word contract, distinct from the langid marker lexicons.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
) -> DataFrame:
    """(id, n_tokens, mean_word_len, hash_ratio, ellipsis_ratio,
    frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
    n_stopword_hits, gopher_pass): Gopher A1.1 quality signals with the
    paper's thresholds folded into one boolean verdict — token count in
    [min_tokens, max_tokens], mean word length in [3, 10], '#' and
    '...' symbol-to-word ratios <= 0.1, < 90% of lines bullet-led,
    < 30% of lines ellipsis-terminated, >= 80% of words containing an
    alphabetic character, and >= 2 distinct required stopwords present.
    Zero-token documents are excluded (no denominator).

    Scale shape: ONE projection over the scan — zero shuffles, zero
    joins (the pii_redaction_stats plan); every signal is a
    whole-stage-codegen'd expression or a 1-2-per-row HOF fold, within
    the PLANS.md HOF budget.
    """
    from parallel_map_reduce_spark.functions.tokenize import tokens

    text = F.col(text_col)
    toks = F.filter(tokens(text), lambda w: w != F.lit(""))
    lines = F.split(text, "\n")
    n_tok = F.size(toks)
    n_lines = F.size(lines)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.ltrim(ln), 1, 1).isin("-", "*", "•"),
        )
    )
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))
    )
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_STOPWORDS
    )
    d = F.col("_nt").cast("double")
    dl = F.col("_nl").cast("double")
    mean_wl = F.col("_sl") / d
    hash_r = F.col("_nh") / d
    ell_r = F.col("_ne") / d
    bullet_f = F.col("_nb") / dl
    ell_f = F.col("_nel") / dl
    alpha_f = F.col("_na") / d
    return (
        docs.select(
            F.col(id_col),
            n_tok.alias("_nt"),
            n_lines.alias("_nl"),
            sum_len.alias("_sl"),
            n_hash.alias("_nh"),
            n_ellipsis.alias("_ne"),
            n_bullet_lines.alias("_nb"),
            n_ellipsis_lines.alias("_nel"),
            n_alpha_words.alias("_na"),
            stop_hits.alias("_ns"),
        )
        .filter(F.col("_nt") > 0)
        .select(
            F.col(id_col),
            F.col("_nt").cast("long").alias("n_tokens"),
            F.round(mean_wl, 4).alias("mean_word_len"),
            F.round(hash_r, 6).alias("hash_ratio"),
            F.round(ell_r, 6).alias("ellipsis_ratio"),
            F.round(bullet_f, 6).alias("frac_bullet_lines"),
            F.round(ell_f, 6).alias("frac_ellipsis_lines"),
            F.round(alpha_f, 6).alias("frac_alpha_words"),
            F.col("_ns").cast("long").alias("n_stopword_hits"),
            (
                F.col("_nt").between(min_tokens, max_tokens)
                & (mean_wl >= 3)
                & (mean_wl <= 10)
                & (hash_r <= 0.1)
                & (ell_r <= 0.1)
                & (bullet_f <= 0.9)
                & (ell_f <= 0.3)
                & (alpha_f >= 0.8)
                & (F.col("_ns") >= 2)
            ).alias("gopher_pass"),
        )
    )


def gopher_quality_stats_oracle_sql(
    min_tokens: int = 50, max_tokens: int = 100_000
) -> str:
    stop_sum = " + ".join(
        f"CASE WHEN list_contains(ws, '{w}') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         {_TOKS_SQL} AS ws,
         string_split(text, chr(10)) AS lns,
         length(text) - length(replace(text, '#', '')) AS nh,
         (length(text) - length(replace(text, '...', ''))) / 3.0 AS ne
  FROM documents
),
sig AS (
  SELECT doc_id,
         len(ws) AS nt,
         len(lns) AS nl,
         list_sum(list_transform(ws, w -> length(w))) AS sl,
         nh, ne,
         len(list_filter(lns, l -> substr(ltrim(l), 1, 1) IN ('-', '*', chr(8226)))) AS nb,
         len(list_filter(lns, l -> rtrim(l) LIKE '%...')) AS nel,
         len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS na,
         {stop_sum} AS ns
  FROM base
  WHERE len(ws) > 0
)
SELECT doc_id,
       CAST(nt AS BIGINT) AS n_tokens,
       ROUND(sl * 1.0 / nt, 4) AS mean_word_len,
       ROUND(nh * 1.0 / nt, 6) AS hash_ratio,
       ROUND(ne / nt, 6) AS ellipsis_ratio,
       ROUND(nb * 1.0 / nl, 6) AS frac_bullet_lines,
       ROUND(nel * 1.0 / nl, 6) AS frac_ellipsis_lines,
       ROUND(na * 1.0 / nt, 6) AS frac_alpha_words,
       CAST(ns AS BIGINT) AS n_stopword_hits,
       (nt BETWEEN {min_tokens} AND {max_tokens}
        AND sl * 1.0 / nt >= 3 AND sl * 1.0 / nt <= 10
        AND nh * 1.0 / nt <= 0.1 AND ne / nt <= 0.1
        AND nb * 1.0 / nl <= 0.9 AND nel * 1.0 / nl <= 0.3
        AND na * 1.0 / nt >= 0.8 AND ns >= 2) AS gopher_pass
FROM sig
"""


# ---------------------------------------------------------------------------
# DSIR hashed n-gram importance weights (STAGED for round-6 registration)
# ---------------------------------------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# score every raw document by log(p_target(x) / p_raw(x)) under two
# bag-of-hashed-n-gram unigram+bigram models — the target model fit on
# an in-domain subset, the raw model on the full corpus — then resample
# proportionally. The hashed feature space (B buckets) makes the model
# a fixed-size count table regardless of vocabulary, which is what lets
# the estimator run at web scale: both models are ONE aggregate over
# the feature stream, and scoring is one join against a B-row table.
#
# The paper draws Gumbel noise for the resampling step; selection here
# stays deterministic (weighted_systematic_sample below takes the
# weights), so every stage is oracle-checkable.


def dsir_importance_weights(
    docs: DataFrame,
    target_pred: Column,
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, log_weight, avg_log_weight): per-document DSIR
    log importance weight Σ_f [ln p_target(h(f)) − ln p_raw(h(f))]
    over unigram and bigram features hashed into ``buckets`` buckets,
    with add-1 smoothing on both models (p(b) = (c_b + 1) / (N + B)).
    Zero-token documents carry no features and are excluded.
    ``target_pred`` is a boolean Column over the document row selecting
    the in-domain subset; the raw model is the full corpus, target ⊆
    raw as in the paper. Probabilities are ratios of exact integer
    counts, so per-feature log terms are bit-identical across engines;
    only the per-doc outputs are rounded (the bigram_lm contract).

    Rank by ``avg_log_weight`` (the per-feature mean), not the raw
    sum: the add-1 smoothing constant contributes a per-feature offset
    ln((N_raw+B)/(N_target+B)) that scales with document length, so
    raw-sum rankings are length-confounded whenever B differs from the
    corpus' effective vocabulary — measured in
    tools/bench_dsir_buckets.py, where the normalized top-decile
    overlap vs the unhashed model rises monotonically with B
    (0.54 → 0.93 at B=2⁹..2¹⁵) while the raw-sum overlap COLLAPSES
    (0.54 → 0.03).

    Scale shape: tokenize once (checkpointed — three consumers), ONE
    (bucket, count, target-count) aggregate with map-side combine, a
    1-row totals broadcast, and one feature→bucket-table join that
    AQE broadcasts (the table is ≤ B rows). Nothing corpus-quadratic;
    the count table is the stored artifact a production run fits once
    and reuses per-shard, exactly the paper's estimator.
    """
    from parallel_map_reduce_spark.functions.tokenize import tokens

    # The target flag rides the tokenized row (the doc row already
    # carries everything the predicate needs), so the feature stream
    # needs no join back to documents. Checkpointed: the uni and bi
    # branches of the feature union would otherwise each re-scan and
    # re-tokenize the corpus.
    tdf = docs.select(
        F.col(id_col),
        target_pred.cast("int").alias("_is_t"),
        F.filter(
            tokens(F.col(text_col)), lambda w: w != F.lit("")
        ).alias("tk"),
    ).localCheckpoint(eager=True)
    n = F.size("tk")
    uni = tdf.select(
        F.col(id_col), F.col("_is_t"), F.explode("tk").alias("f")
    )
    bi = (
        tdf.filter(n >= 2)
        .select(
            F.col(id_col),
            F.col("_is_t"),
            F.explode(
                F.zip_with(
                    F.slice(F.col("tk"), 1, n - 1),
                    F.slice(F.col("tk"), 2, n - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("f"),
        )
    )
    feats = (
        uni.unionByName(bi)
        .select(
            F.col(id_col),
            F.col("_is_t"),
            (hash64(F.col("f")) % F.lit(buckets)).alias("b"),
        )
        .localCheckpoint(eager=True)
    )
    # btab feeds the totals agg AND the score join — materialize the
    # (≤ buckets)-row model table or the feature agg replays per branch.
    btab = (
        feats.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum("_is_t").alias("c_t"),
        )
        .localCheckpoint(eager=True)
    )
    totals = btab.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
    )
    lr = F.log(
        (F.col("c_t") + 1) / (F.col("n_t") + F.lit(buckets))
    ) - F.log((F.col("c_r") + 1) / (F.col("n_r") + F.lit(buckets)))
    # `+ 0.0` canonicalizes IEEE negative zero: a doc whose log terms
    # cancel can round to -0.0 in one engine and +0.0 in the other
    # (float == treats them equal; the driver's string hash does not —
    # bit at sf0.1 in round 7).
    return (
        feats.join(btab, "b")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            (F.round(F.sum(lr), 4) + F.lit(0.0)).alias("log_weight"),
            (F.round(F.avg(lr), 4) + F.lit(0.0)).alias("avg_log_weight"),
        )
    )


def dsir_importance_weights_oracle_sql(
    target_pred: str = "lang = 'en'", buckets: int = 4096
) -> str:
    from parallel_map_reduce_spark.functions.hashing import hash64_sql

    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS_SQL} AS ws,
         CASE WHEN {target_pred} THEN 1 ELSE 0 END AS is_t
  FROM documents
),
uni AS (SELECT doc_id, is_t, unnest(ws) AS f FROM base),
bi AS (
  SELECT doc_id, is_t, ws[i] || ' ' || ws[i+1] AS f
  FROM base CROSS JOIN UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
feats AS (
  SELECT doc_id, is_t, {hash64_sql('f', 0)} % {buckets} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
btab AS (
  SELECT b, COUNT(*) AS c_r, SUM(is_t) AS c_t FROM feats GROUP BY b
),
tot AS (SELECT SUM(c_r) AS n_r, SUM(c_t) AS n_t FROM btab)
SELECT doc_id,
       COUNT(*) AS n_feats,
       ROUND(SUM(ln((c_t + 1) * 1.0 / (n_t + {buckets}))
               - ln((c_r + 1) * 1.0 / (n_r + {buckets}))), 4) + 0.0 AS log_weight,
       ROUND(AVG(ln((c_t + 1) * 1.0 / (n_t + {buckets}))
               - ln((c_r + 1) * 1.0 / (n_r + {buckets}))), 4) + 0.0 AS avg_log_weight
FROM feats JOIN btab USING (b) CROSS JOIN tot
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Soft dedup weights + deterministic PPS sampling (STAGED for round 6)
# ---------------------------------------------------------------------------
#
# The removal-free alternative to dropping duplicates: keep every
# document but down-weight duplicated content so a training run sees
# each distinct text with equal expected frequency (the soft-dedup /
# duplicate-discounting scheme; cf. Lee et al. 2022's finding that
# upweighted duplicates drive memorization). weight = 1/|dup group| is
# the canonical discount. Composes with weighted_systematic_sample
# (which takes INTEGER weights — integerize the discount as
# round(weight·10⁶) first): the weights become inclusion probabilities
# for a deterministic probability-proportional-to-size draw (Madow's
# systematic selection, 1949) — the selection step DSIR leaves to
# Gumbel noise, made deterministic and therefore oracle-checkable.


def soft_dedup_weights(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dup_count, weight): exact-duplicate group size by full-text
    md5 and the 1/count soft-dedup discount. One md5-key aggregate +
    one key join — the dedup_exact plan with the group size retained
    instead of collapsed; content never crosses the wire (the md5 key
    does)."""
    from parallel_map_reduce_spark.functions.hashing import fingerprint_md5

    keyed = docs.select(
        F.col(id_col), fingerprint_md5(F.col(text_col)).alias("_k")
    )
    counts = keyed.groupBy("_k").agg(F.count(F.lit(1)).alias("dup_count"))
    return keyed.join(counts, "_k").select(
        id_col,
        "dup_count",
        F.round(F.lit(1.0) / F.col("dup_count"), 6).alias("weight"),
    )


def soft_dedup_weights_oracle_sql() -> str:
    return """
WITH counts AS (
  SELECT md5(text) AS k, COUNT(*) AS dup_count FROM documents GROUP BY 1
)
SELECT doc_id, dup_count, ROUND(1.0 / dup_count, 6) AS weight
FROM documents JOIN counts ON md5(text) = counts.k
"""


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    order_seed: int = 0,
    order_buckets: int = 64,
) -> DataFrame:
    """(id, weight, multiplicity): Madow's systematic
    probability-proportional-to-size selection — exactly ``n`` draws
    (Σ multiplicity = n), each row drawn with probability ∝ its
    non-negative INTEGER ``weight_col``, deterministically. Rows are
    laid on a line in a pseudorandom but fixed order (portable hash of
    the id, seeded), cumulative weights C_i are taken over that order,
    and row i is drawn once for every multiple of W/n inside
    (C_i − w_i, C_i]:  m_i = ⌊C_i·n/W⌋ − ⌊(C_i−w_i)·n/W⌋. All
    arithmetic is 64-bit integer (requires W·n < 2^63, asserted
    nowhere cheaper than the caller), so the draw is bit-identical in
    every engine — no float boundary can flip a selection. Rows with
    m_i = 0 are omitted.

    The weight column MUST already be integral — enforced, not cast:
    a silent cast would truncate fractional weights (soft-dedup's
    1/dup_count discounts all truncate to 0; DSIR log-weights go
    negative) and quietly destroy the PPS semantics. Integerize
    fractional weights first, e.g.
    ``F.round(F.col("weight") * 1_000_000).cast("long")`` for
    soft-dedup discounts, or ``F.round(F.exp("log_weight") * 1e6)``
    for DSIR importance ratios.

    Scale shape: the global cumulative sum is NOT a single-partition
    window — rows hash into ``order_buckets`` buckets, each bucket
    cumsums locally (window partitioned by bucket), and bucket offsets
    (a ≤``order_buckets``-row aggregate, broadcast) shift the locals to
    global. Global order = (bucket, order key, id); any fixed total
    order is valid for Madow selection. Two shuffles total, both
    bucket-partitioned; the offset table is the only driver-sized
    object."""
    wtype = dict(df.dtypes).get(weight_col)
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"weight column {weight_col!r} must be integral, got {wtype!r} — "
            "integerize fractional weights first (see docstring)"
        )
    w = F.col(weight_col).cast("long")
    keyed = df.select(
        F.col(id_col),
        w.alias("_w"),
        (hash64(F.col(id_col).cast("string"), order_seed)).alias("_ok"),
    ).withColumn("_b", F.col("_ok") % F.lit(order_buckets))
    win = Window.partitionBy("_b").orderBy("_ok", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # local feeds the bucket-totals agg AND the final selection; btot
    # feeds offsets AND the grand total — materialize both or the scan
    # and per-bucket window sort replay once per branch (3x total).
    local = keyed.withColumn("_lc", F.sum("_w").over(win)).localCheckpoint(
        eager=True
    )
    btot = (
        local.groupBy("_b")
        .agg(F.max("_lc").alias("_bt"), F.min("_w").alias("_mw"))
        .localCheckpoint(eager=True)
    )
    bwin = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = btot.select(
        F.col("_b"), (F.sum("_bt").over(bwin) - F.col("_bt")).alias("_off")
    )
    # The grand total comes to the driver (one scalar off the 64-row
    # materialized bucket-totals frame — loop-control class, same
    # discipline as the BPE argmax) so the W·n < 2^63 precondition is
    # ENFORCED, not assumed: past it, Spark's long multiply wraps
    # silently while DuckDB's window SUM is HUGEINT and stays exact —
    # a silent cross-engine divergence. W then enters the plan as a
    # literal, which also drops the 1-row broadcast join.
    (row,) = btot.agg(
        F.sum("_bt").alias("_tot"), F.min("_mw").alias("_minw")
    ).collect()
    total_w = row["_tot"] or 0
    # Negative weights must be rejected, not just documented: integer
    # division truncates toward zero in Spark (DIV) but floors in DuckDB
    # (//), so a negative cumulative term silently diverges cross-engine
    # and corrupts the Madow bracket arithmetic besides.
    if row["_minw"] is not None and row["_minw"] < 0:
        raise ValueError(
            f"weights must be non-negative; min({weight_col}) = {row['_minw']}"
        )
    if total_w <= 0:
        raise ValueError("total weight must be positive")
    if total_w > (2**63 - 1) // n:
        raise ValueError(
            f"W*n = {total_w}*{n} overflows int64 — rescale the weights"
        )
    cum = local.join(F.broadcast(offs), "_b").withColumn(
        "_c", F.col("_lc") + F.col("_off")
    )
    m = F.expr(f"_c * {n} DIV {total_w}") - F.expr(
        f"(_c - _w) * {n} DIV {total_w}"
    )
    return (
        cum.withColumn("multiplicity", m)
        .filter(F.col("multiplicity") >= 1)
        .select(
            id_col,
            F.col("_w").alias("weight"),
            F.col("multiplicity").cast("long").alias("multiplicity"),
        )
    )


def weighted_systematic_sample_oracle_sql(
    weight_expr: str, n: int, order_seed: int = 0, order_buckets: int = 64
) -> str:
    """Oracle replay over ``documents``: the bucketed two-level cumsum
    collapses to ONE window ordered by (bucket, order key, id) — the
    same total order, bit-identical integer selection."""
    from parallel_map_reduce_spark.functions.hashing import hash64_sql

    ok = hash64_sql("CAST(doc_id AS VARCHAR)", order_seed)
    return f"""
WITH keyed AS (
  SELECT doc_id, CAST({weight_expr} AS BIGINT) AS w, {ok} AS ok
  FROM documents
),
cum AS (
  SELECT doc_id, w, ok,
         SUM(w) OVER (ORDER BY ok % {order_buckets}, ok, doc_id
                      ROWS UNBOUNDED PRECEDING) AS c,
         SUM(w) OVER () AS tot
  FROM keyed
)
SELECT doc_id,
       w AS weight,
       CAST((c * {n}) // tot - ((c - w) * {n}) // tot AS BIGINT) AS multiplicity
FROM cum
WHERE (c * {n}) // tot - ((c - w) * {n}) // tot >= 1
"""


# ---------------------------------------------------------------------------
# Dataset snapshot diff (STAGED for round 6)
# ---------------------------------------------------------------------------
#
# The audit step between two published dataset versions: which
# documents were added, removed, changed, or carried unchanged. With
# publish_dataset / incremental_lsh_dedup this closes the incremental
# publishing loop — a nightly pipeline diffs today's snapshot against
# yesterday's to bound the blast radius of an upstream change before
# promoting it. Identity is the doc id; change detection is the
# full-content md5 (the dedup_exact key), so text never crosses the
# wire — the diff moves (id, 32-byte digest) pairs only.


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, status ∈ {added, removed, changed, unchanged}): full outer
    join of the two snapshots' (id, content-md5) projections. At scale
    both sides are id-keyed published tables — bucket both on the id at
    write time (sinks.write_bucketed) and the join is co-located,
    shuffle-free; either way nothing but ids and digests moves.

    Presence is tracked by explicit marker columns, NOT digest
    nullness — md5(NULL text) is NULL, so a hash-null proxy would
    misreport a present-but-null-text row as absent. Digests compare
    null-safely (two NULL texts are 'unchanged', NULL vs non-NULL is
    'changed'), matching the oracle's IS NOT DISTINCT FROM."""
    from parallel_map_reduce_spark.functions.hashing import fingerprint_md5

    o = old.select(
        F.col(id_col),
        fingerprint_md5(F.col(text_col)).alias("_ho"),
        F.lit(1).alias("_po"),
    )
    n = new.select(
        F.col(id_col),
        fingerprint_md5(F.col(text_col)).alias("_hn"),
        F.lit(1).alias("_pn"),
    )
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_po").isNull(), F.lit("added"))
        .when(F.col("_pn").isNull(), F.lit("removed"))
        .when(F.col("_ho").eqNullSafe(F.col("_hn")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def snapshot_diff_oracle_sql(
    old_pred: str = "doc_id % 3 != 0",
    new_pred: str = "doc_id % 5 != 0",
    new_text: str = "CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END",
) -> str:
    # Replays the registered parameterization: two snapshot views carved
    # from the one documents table, the "new" side with a deterministic
    # text edit on every 7th doc so all four statuses occur.
    return f"""
WITH old_snap AS (
  SELECT doc_id, md5(text) AS ho FROM documents WHERE {old_pred}
),
new_snap AS (
  SELECT doc_id, md5({new_text}) AS hn FROM documents WHERE {new_pred}
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN ho IS NOT DISTINCT FROM hn THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
"""


# ---------------------------------------------------------------------------
# Streaming incremental ingestion dedup (STAGED for round 6)
# ---------------------------------------------------------------------------
#
# The streaming form of the incremental_lsh_dedup contract: a crawl
# feed arrives as one file per micro-batch, each batch is deduped
# against the kept store (base corpus + every earlier batch's
# survivors), its statuses land in an append sink, and its survivors
# join the store before the next batch runs — the foreachBatch
# admission loop a production ingestion pipeline actually executes.
# Order matters by design (a doc surviving batch 1 can be the dup_of
# target of a batch-2 doc), so determinism comes from fixed batch
# assignment (doc_id residues) and explicit file mtimes (the file
# source processes oldest-first). The oracle replays the whole
# admission chain unrolled, batch by batch.


def _store_slices(subs: list[str], before_bid: int | None) -> list[str]:
    """Replay-safety slice filter for the per-batch-keyed stores: given
    a store directory listing (``base`` plus ``batch_<bid>`` slices),
    return the slices a micro-batch with engine batch id ``before_bid``
    may dedup against — ``base`` and STRICTLY earlier batches only. A
    retried batch must not see its own stale partial output, nor a
    later batch's (at-least-once foreachBatch can replay after
    successors already ran). ``None`` means read everything (the final
    result assembly). Module-level so the boundary arithmetic is
    unit-testable without running the engine. Names starting with '_'
    (a crashed compaction's ``_compact`` staging dir or its ``_old_``
    pre-delete renames) are never read as slices — which is only
    sufficient once :func:`recover_store_slices` has restored any
    pre-promote ``_old_`` renames (those hold live rows the plain
    listing would otherwise miss), so readers of a store a crashed
    compaction may have touched run that recovery before listing."""
    subs = [s for s in subs if not s.startswith("_")]
    if before_bid is None:
        return subs
    return [
        s
        for s in subs
        if s == "base" or (s.startswith("batch_") and int(s[6:]) < before_bid)
    ]


def streaming_incremental_dedup(
    spark,
    docs: DataFrame,
    n_batches: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, batch_id, status, dup_of) for every doc of the
    streamed (odd-id) feed: batch k = ids ≡ 2k−1 (mod 2·n_batches),
    deduped through the REAL streaming engine (file source, one file
    per micro-batch, availableNow) against base kept = even ids plus
    all prior survivors. Statuses and dup_of follow
    incremental_lsh_dedup exactly; batch_id is a pure function of the
    id so both engines derive it identically.

    Scale posture: per micro-batch work is the incremental contract —
    O(batch) banding against the store's signatures, no kept×kept
    pairs. The store is the TWO-PHASE signature-store form: admission
    persists each batch's survivor signatures (12 longs/doc) beside the
    text, and the next batch bands against stored signatures — the kept
    corpus' text is touched only by the verified-candidate semi-join,
    never re-signed and never scanned. State lives in the store tables,
    not the engine (foreachBatch is stateless), so an unbounded feed
    runs in constant engine memory.

    Store growth: the statuses/kept/signature stores gain one parquet
    subdirectory per micro-batch and the read-back unions a listing of
    them, so a long-lived deployment needs periodic compaction (fold
    batch_* slices into base) to keep the listing and file count
    bounded; the engine-memory contract is unaffected."""
    if n_batches < 1:
        # n_batches == 0 would write no feed files, never create the
        # statuses dir, and surface as a FileNotFoundError from the
        # final listing (and `% (2*n_batches)` degenerates besides).
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")
    import glob as _glob
    import os
    import shutil
    import tempfile

    from parallel_map_reduce_spark.operators.dedup import minhash_signatures
    from parallel_map_reduce_spark.streaming.windowed import stream_docs_dir

    mod = 2 * n_batches
    run_dir = tempfile.mkdtemp(prefix="pmr_spark_stream_incdedup_")
    try:
        stage = os.path.join(run_dir, "feed")
        store = os.path.join(run_dir, "kept_store")
        sig_store = os.path.join(run_dir, "kept_sigs")
        out = os.path.join(run_dir, "statuses")
        os.makedirs(stage)

        def _read_all(path: str, before_bid: int | None = None) -> DataFrame:
            # Stores are laid out one subdirectory per writer (base +
            # one per micro-batch) so replays overwrite in place; the
            # recursive read unions whatever subset exists.  With
            # ``before_bid`` set, only slices written by STRICTLY EARLIER
            # micro-batches are read — a retried batch must not dedup
            # against its own stale partial output (or a later batch's).
            subs = _store_slices(sorted(os.listdir(path)), before_bid)
            return spark.read.parquet(*(os.path.join(path, s) for s in subs))

        # Base kept corpus (even ids) seeds the text AND signature stores.
        base = docs.filter(F.col(id_col) % 2 == 0)
        base.write.parquet(os.path.join(store, "base"))
        minhash_signatures(base, text_col, id_col).write.parquet(
            os.path.join(sig_store, "base")
        )

        # One file per ingest batch, mtimes ascending so the file source
        # (oldest-first) replays the admission order deterministically.
        for k in range(1, n_batches + 1):
            tmp_out = os.path.join(run_dir, f"b{k}")
            docs.filter(
                F.col(id_col) % mod == 2 * k - 1
            ).coalesce(1).write.parquet(tmp_out)
            (part,) = _glob.glob(os.path.join(tmp_out, "part-*.parquet"))
            dst = os.path.join(stage, f"batch_{k}.parquet")
            os.replace(part, dst)
            os.utime(dst, (k, k))

        def admit(batch_df: DataFrame, bid: int) -> None:
            # foreachBatch is at-least-once: every output is keyed by the
            # engine's batch id and overwritten, so a micro-batch replay
            # rewrites its own slice instead of appending duplicates into
            # the admission chain.
            kept = _read_all(store, before_bid=bid)
            # Materialized: the status write AND the survivor filter both
            # consume res — without the checkpoint the verification joins
            # and component formation replay once per consumer.
            res = (
                incremental_lsh_dedup(
                    batch_df,
                    kept,
                    text_col=text_col,
                    id_col=id_col,
                    kept_signatures=_read_all(sig_store, before_bid=bid),
                )
                .withColumn(
                    "batch_id", ((F.col(id_col) % mod + 1) / 2).cast("long")
                )
                .localCheckpoint(eager=True)
            )
            res.select(id_col, "batch_id", "status", "dup_of").write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"batch_{bid}"))
            surv = res.filter(F.col("status") == "kept").select(id_col)
            survivors = batch_df.join(surv, id_col).localCheckpoint(eager=True)
            survivors.write.mode("overwrite").parquet(
                os.path.join(store, f"batch_{bid}")
            )
            minhash_signatures(survivors, text_col, id_col).write.mode(
                "overwrite"
            ).parquet(os.path.join(sig_store, f"batch_{bid}"))

        q = (
            stream_docs_dir(spark, stage, max_files_per_trigger=1)
            .writeStream.outputMode("append")
            .foreachBatch(admit)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
            .start()
        )
        q.awaitTermination()
        return _read_all(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def incremental_lsh_dedup_chain_oracle_sql(
    kept0_pred: str = "{t}.doc_id % 2 = 0",
    n_batches: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> str:
    """The admission chain unrolled: per batch k, the single-round
    pipeline (banded cross candidates vs kept{k-1} → verified jaccard →
    intra components among cross-survivors → statuses), then
    kept{k} = kept{k-1} ∪ batch-k survivors feeds batch k+1. Batch k's
    membership predicate is doc_id ≡ 2k−1 (mod 2·n_batches). Every
    chained CTE is MATERIALIZED — kept{k}/status{k} are referenced by
    two later CTEs each, and inlining would re-expand the whole prior
    chain per reference (the bpe_rounds lesson)."""
    from parallel_map_reduce_spark.functions.hashing import (
        hash64_sql,
        universal_hash_sql,
        universal_params,
    )

    mod = 2 * n_batches
    mins = ",\n       ".join(
        f"MIN({universal_hash_sql('h', a, b)}) AS h{i}"
        for i, (a, b) in enumerate(universal_params(num_hashes))
    )
    rpb = num_hashes // bands
    band_match = " OR ".join(
        "("
        + " AND ".join(f"a.h{b * rpb + r} = b.h{b * rpb + r}" for r in range(rpb))
        + ")"
        for b in range(bands)
    )
    if "{t}" not in kept0_pred:
        raise ValueError("kept0_pred must carry a '{t}' placeholder")
    sql = _SHINGLES_CTE_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    sql += f""",
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
hashed AS (SELECT doc_id, {hash64_sql('shingle', 0)} AS h FROM shingles),
sigs AS MATERIALIZED (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
kept0 AS (SELECT doc_id FROM documents WHERE {kept0_pred.replace('{t}', 'documents')})"""
    for k in range(1, n_batches + 1):
        new = f"doc_id % {mod} = {2 * k - 1}"
        sql += f""",
xcand{k} AS (
  SELECT a.doc_id AS id_n, b.doc_id AS id_k
  FROM sigs a JOIN sigs b
    ON a.{new} AND b.doc_id IN (SELECT doc_id FROM kept{k - 1})
   AND ({band_match})
),
xver{k} AS (
  SELECT p.id_n, p.id_k FROM (
    SELECT x.id_n, x.id_k, COUNT(*) AS n_common
    FROM xcand{k} x
    JOIN shingles sa ON sa.doc_id = x.id_n
    JOIN shingles sb ON sb.doc_id = x.id_k AND sb.shingle = sa.shingle
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON p.id_n = sa.doc_id
  JOIN sizes sb ON p.id_k = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
),
cross_dup{k} AS MATERIALIZED (
  SELECT id_n, MIN(id_k) AS dup_of FROM xver{k} GROUP BY id_n
),
icand{k} AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id AND a.{new} AND b.{new}
   AND ({band_match})
),
iver{k} AS (
  SELECT p.id_a, p.id_b FROM (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_common
    FROM icand{k} c
    JOIN shingles sa ON sa.doc_id = c.id_a
    JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON p.id_a = sa.doc_id
  JOIN sizes sb ON p.id_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
    AND p.id_a NOT IN (SELECT id_n FROM cross_dup{k})
    AND p.id_b NOT IN (SELECT id_n FROM cross_dup{k})
),
sym{k} AS (SELECT id_a AS u, id_b AS v FROM iver{k}
           UNION ALL SELECT id_b, id_a FROM iver{k}),
reach{k} AS (SELECT u, v FROM sym{k}
             UNION SELECT r.u, s.v FROM reach{k} r JOIN sym{k} s ON r.v = s.u),
comp{k} AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS group_id
            FROM reach{k} GROUP BY u),
status{k} AS MATERIALIZED (
  SELECT d.doc_id,
         CAST({k} AS BIGINT) AS batch_id,
         CASE WHEN cd.dup_of IS NOT NULL THEN 'cross_dup'
              WHEN c.group_id IS NOT NULL AND c.group_id <> d.doc_id
                THEN 'batch_dup'
              ELSE 'kept' END AS status,
         COALESCE(cd.dup_of,
                  CASE WHEN c.group_id <> d.doc_id THEN c.group_id END,
                  -1) AS dup_of
  FROM (SELECT doc_id FROM documents WHERE {new}) d
  LEFT JOIN cross_dup{k} cd ON cd.id_n = d.doc_id
  LEFT JOIN comp{k} c ON c.doc_id = d.doc_id
),
kept{k} AS MATERIALIZED (
  SELECT doc_id FROM kept{k - 1}
  UNION ALL
  SELECT doc_id FROM status{k} WHERE status = 'kept'
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT doc_id, batch_id, status, dup_of FROM status{k}"
        for k in range(1, n_batches + 1)
    )
    return sql + "\n" + union


# ---------------------------------------------------------------------------
# Retraction + re-admission (round 7)
# ---------------------------------------------------------------------------
#
# The takedown flow every production corpus eventually runs: a kept
# document is retracted (legal/PII removal), its signature-store rows
# are invalidated, and documents that were suppressed as its near-dups
# get re-enqueued through the STANDARD admission path against the
# post-retraction store — they may come back kept, or turn out to be
# dups of some other (surviving) document. Composes snapshot_diff's
# store-invalidaton idea with incremental_lsh_dedup's admission
# contract; the oracle replays the admission chain with the second
# admission's membership driven by the first's statuses.


def retract_and_readmit(
    docs: DataFrame,
    retract_mod: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, phase, status, dup_of) across the three-step flow:

    * phase ``admit``: the original ingest — batch (odd ids) admitted
      against kept (even ids) via the two-phase signature store;
    * phase ``retract``: kept ids ≡ 0 (mod ``retract_mod``) retracted —
      their signature-store rows are dropped by an anti-join ON THE
      STORE (the text corpus is never rewritten, the store row is the
      admission artifact);
    * phase ``readmit``: every admit-phase ``cross_dup`` whose
      canonical (dup_of) was retracted re-runs standard admission
      against the post-retraction kept state — surviving original
      kept docs plus the batch's survivors, whose signature rows are
      the admit phase's own, threaded out of incremental_lsh_dedup
      via ``return_new_signatures`` and filtered to survivors
      (MinHash is deterministic, so these are the exact rows a
      recompute over the survivor texts would produce, without the
      extra signature pass — r13).

    Scale shape: the re-admission batch is only the affected docs
    (O(#suppressed-by-retracted)), the store update is one anti-join +
    one union on fixed-width signature rows, and no kept×kept pair is
    ever generated — the incremental contract end to end. dup_of keeps
    the -1 integral sentinel.
    """
    from parallel_map_reduce_spark.operators.dedup import minhash_signatures

    kept = docs.filter(F.col(id_col) % 2 == 0)
    batch = docs.filter(F.col(id_col) % 2 == 1)
    # The kept-side signature build and the retraction carve-out are
    # independent — overlap them (guide §2.6, r13).
    sig_store, retracted = _overlap(
        lambda: minhash_signatures(kept, text_col, id_col).localCheckpoint(
            eager=True
        ),
        lambda: kept.filter(F.col(id_col) % retract_mod == 0)
        .select(id_col)
        .localCheckpoint(eager=True),
    )
    # return_new_signatures threads the admit phase's batch signature
    # table out (r13 — the docstring's "extra pass" is gone: the readmit
    # append below reuses these rows instead of recomputing MinHash over
    # the survivor texts; deterministic, so values are identical).
    res1, sig_batch = incremental_lsh_dedup(
        batch,
        kept,
        text_col,
        id_col,
        kept_signatures=sig_store,
        return_new_signatures=True,
    )
    # eager=False: the sig_store2 checkpoint below consumes surv1 —
    # every partition of res1 — so the loop-state materialization fuses
    # into that job (r13, guide §1.2); later consumers read cache.
    res1 = res1.localCheckpoint(eager=False)

    # Recomputed per consuming job (res2's new_docs side references it
    # in several semi-joins/broadcasts), but every recompute is a cheap
    # deterministic filter+join over two CACHED frames (res1, retracted)
    # — so skipping the eager materialization stays a net job saved
    # (r13; comment corrected per ADVICE r13).
    affected = (
        res1.filter(F.col("status") == "cross_dup")
        .join(
            retracted.withColumnRenamed(id_col, "dup_of"),
            "dup_of",
        )
        .select(id_col)
    )

    # Post-retraction kept state: original kept minus retracted, plus
    # the batch's admitted survivors. The signature store is updated in
    # place (anti-join invalidation + survivor append) — never rebuilt.
    surv1 = res1.filter(F.col("status") == "kept").select(id_col)
    kept2 = kept.join(F.broadcast(retracted), id_col, "left_anti").unionByName(
        docs.join(surv1, id_col)
    )
    sig_store2 = (
        sig_store.join(F.broadcast(retracted), id_col, "left_anti")
        .unionByName(sig_batch.join(surv1, id_col, "left_semi"))
        .localCheckpoint(eager=True)
    )
    res2 = incremental_lsh_dedup(
        docs.join(F.broadcast(affected), id_col),
        kept2,
        text_col,
        id_col,
        kept_signatures=sig_store2,
        new_signatures=sig_batch,
    )

    return (
        res1.select(
            F.col(id_col),
            F.lit("admit").alias("phase"),
            "status",
            "dup_of",
        )
        .unionByName(
            retracted.select(
                F.col(id_col),
                F.lit("retract").alias("phase"),
                F.lit("retracted").alias("status"),
                F.lit(-1).cast("long").alias("dup_of"),
            )
        )
        .unionByName(
            res2.select(
                F.col(id_col),
                F.lit("readmit").alias("phase"),
                "status",
                "dup_of",
            )
        )
    )


def retract_and_readmit_oracle_sql(retract_mod: int = 10) -> str:
    """Replays the flow as three chained stages: the standard one-round
    admission oracle (verbatim, nested), the retraction carve-out, and
    a second nested admission whose new/kept membership predicates are
    subqueries against the outer stage CTEs — CTE scope makes the
    outer names visible inside the nested statement."""
    admit = incremental_lsh_dedup_oracle_sql().strip()
    readmit = incremental_lsh_dedup_oracle_sql(
        new_pred="{t}.doc_id IN (SELECT doc_id FROM affected)",
        kept_pred="{t}.doc_id IN (SELECT doc_id FROM kept2)",
    ).strip()
    return f"""
WITH res1 AS MATERIALIZED (
  {admit}
),
retracted AS MATERIALIZED (
  SELECT doc_id FROM documents
  WHERE doc_id % 2 = 0 AND doc_id % {retract_mod} = 0
),
affected AS MATERIALIZED (
  SELECT r.doc_id FROM res1 r
  JOIN retracted t ON r.dup_of = t.doc_id
  WHERE r.status = 'cross_dup'
),
kept2 AS MATERIALIZED (
  SELECT doc_id FROM documents
  WHERE doc_id % 2 = 0 AND doc_id % {retract_mod} <> 0
  UNION ALL
  SELECT doc_id FROM res1 WHERE status = 'kept'
),
res2 AS MATERIALIZED (
  {readmit}
)
SELECT doc_id, 'admit' AS phase, status, dup_of FROM res1
UNION ALL
SELECT doc_id, 'retract' AS phase, 'retracted' AS status,
       CAST(-1 AS BIGINT) AS dup_of
FROM retracted
UNION ALL
SELECT doc_id, 'readmit' AS phase, status, dup_of FROM res2
"""


_STORE_LOCK_NAME = "_lock"


def store_lock(path: str, timeout: float = 600.0, poll: float = 0.05):
    """Exclusive advisory lock serializing the recover/compact critical
    section on one store — the enforcement of the quiesced-store
    contract recover_store_slices documents. Usage::

        with store_lock(path):
            ...  # mutate _compact/_old_/slice names safely

    Implementation is ``flock(LOCK_EX)`` on a persistent ``_lock`` file
    inside the store (created on first use; the '_' prefix keeps every
    slice listing from reading it). An O_EXCL create-as-lock was the
    obvious alternative, but a holder that dies leaves an O_EXCL file
    behind forever, and every stale-breaking heuristic (pid liveness +
    unlink-and-retry) has an unlink/recreate race that can steal a
    LIVE lock; flock's kernel state releases automatically when the
    holder's fd closes — crash included — so there is nothing to
    break. Two caveats, both documented trade-offs: (a) flock is
    per-open-file, so this serializes threads within one driver as
    well as separate local processes, but NOT writers on a remote
    filesystem without flock semantics (the store machinery already
    assumes driver-visible POSIX paths — every compactor os.replace()s
    store directories); (b) acquisition is a poll loop, not a queue —
    fine at the seconds-scale hold times compaction has.

    Raises TimeoutError after ``timeout`` seconds so a wedged holder
    surfaces loudly instead of hanging a nightly pipeline forever.

    NOT re-entrant: a thread already inside ``store_lock(path)`` must
    call ``_recover_store_slices_locked`` (not the locking wrapper) —
    a second acquire on the same path would deadlock against itself.
    """
    import contextlib
    import fcntl
    import os
    import time

    @contextlib.contextmanager
    def _cm():
        fd = os.open(
            os.path.join(path, _STORE_LOCK_NAME),
            os.O_CREAT | os.O_RDWR,
            0o644,
        )
        try:
            deadline = time.monotonic() + timeout
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except (BlockingIOError, InterruptedError):
                    if time.monotonic() >= deadline:
                        raise TimeoutError(
                            f"store {path}: lock held past {timeout}s — "
                            "an in-flight compaction/recovery is wedged "
                            "or the store is busier than the quiesced-"
                            "store contract allows"
                        )
                    time.sleep(poll)
            try:
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    return _cm()


def recover_store_slices(path: str, lock_timeout: float = 600.0) -> str:
    """Crash-state recovery for a per-batch-keyed store that may hold
    the remains of an interrupted ``compact_store_slices`` run; safe
    (and a cheap no-op) on a clean store. Returns the state found:
    ``clean`` / ``cleared_staging`` / ``rolled_back`` / ``cleared_dead``.

    The compaction's crash points map onto exactly two disk states,
    distinguished by whether the ``_compact`` staging dir still exists
    — it is created before any rename and disappears atomically AT the
    promote (``os.replace(_compact, base)``), never in between:

    - ``_compact`` present → the crash happened BEFORE the promote.
      Any ``_old_<name>`` dirs are the renamed-away LIVE generation
      (the promoted ``base`` replacing them was never installed), so
      they hold the only copy of their rows: roll the renames BACK
      (restore ``<name>``) and delete the staging dir. Deleting them
      instead — the pre-fix behavior — lost the whole store when every
      slice had been renamed, and silently dropped rows otherwise.
    - ``_compact`` absent → any ``_old_`` dirs are dead renames from a
      crash AFTER the promote; ``base`` already holds their rows
      (the union was complete before any rename started). Delete them.

    A live name coexisting with its ``_old_`` twin is unreachable by
    this state machine (each name is renamed at most once per run, and
    post-promote recovery deletes ``_old_`` dirs before a new run can
    recreate the name), so that state raises rather than guessing
    which copy to keep.

    Concurrency contract: recovery mutates shared on-disk state
    (renames slices back, deletes ``_compact``/``_old_`` dirs), and it
    runs at EVERY stored-reader and appender entry — so the mutation
    itself is serialized under :func:`store_lock`, the same lock every
    compactor holds for its whole critical section. A reader or
    appender entering while a compaction is in flight therefore WAITS
    at entry and then sees a finished, markerless store (returns
    ``clean``) instead of racing the staging dir and dying on a
    FileNotFoundError. Fast path: a store with no ``_compact``, no
    ``_old_`` dirs AND no ``_lock`` file (i.e. never compacted and
    nobody mid-section) returns without touching the lock — one
    listdir. The lock serializes recover/compact only: a LAZY scan a
    reader built before a later compaction starts still runs under
    the quiesced-store contract (consume stored reads promptly, or
    don't compact while queries are in flight).

    The ``_old_`` listing is taken AFTER the staging-dir check (and
    both under the lock) so the branch decision and the slice set
    reflect one consistent observation of the store.
    """
    import os

    names = os.listdir(path)
    has_markers = "_compact" in names or any(
        s.startswith("_old_") for s in names
    )
    if not has_markers and _STORE_LOCK_NAME not in names:
        return "clean"
    with store_lock(path, timeout=lock_timeout):
        return _recover_store_slices_locked(path)


def _recover_store_slices_locked(path: str) -> str:
    """The recover_store_slices state machine proper — caller MUST hold
    :func:`store_lock` on ``path`` (compactors call this directly from
    inside their own locked section; everyone else goes through the
    locking wrapper)."""
    import os
    import shutil

    tmp = os.path.join(path, "_compact")
    if os.path.isdir(tmp):
        olds = sorted(s for s in os.listdir(path) if s.startswith("_old_"))
        for s in olds:
            live = os.path.join(path, s[len("_old_"):])
            if os.path.exists(live):
                raise RuntimeError(
                    f"store {path}: {s} and {s[len('_old_'):]} both exist "
                    "— unrecognized crash state, refusing to delete either"
                )
            os.replace(os.path.join(path, s), live)
        shutil.rmtree(tmp)
        return "rolled_back" if olds else "cleared_staging"
    olds = sorted(s for s in os.listdir(path) if s.startswith("_old_"))
    for s in olds:
        shutil.rmtree(os.path.join(path, s), ignore_errors=True)
    return "cleared_dead" if olds else "clean"


def compact_store_slices(
    spark, path: str, lock_timeout: float = 600.0
) -> int:
    """Fold a per-batch-keyed store (``base`` + ``batch_<bid>`` parquet
    slices — the layout streaming_incremental_dedup's admission loop
    writes) back into a single ``base`` slice, returning the number of
    slices folded. Run between streaming jobs (never concurrently with
    one); the whole fold holds :func:`store_lock`, so a reader or
    appender entering mid-fold waits at its recovery instead of racing
    the staging dir: the admission loop's listing and file count grow linearly
    with ingest count, and this is the periodic compaction the
    docstring there promises. Row content is preserved exactly — the
    fold is a union + rewrite, no dedup logic; replay safety belongs
    to the admission loop, compaction only runs on quiesced stores.

    Write-then-swap-then-delete: the union lands in a sibling
    ``_compact`` dir first; the old slices are then RENAMED to
    ``_old_<name>`` (underscore-prefixed, so the reader's listing —
    which unions every subdirectory except names starting with '_' —
    never sees them); ``lock_timeout`` bounds the wait on a wedged
    holder, same contract as :func:`recover_store_slices` (ADVICE
    r11: pipelines could tune the readers' deadline but not the
    compactors'); ``_compact`` is promoted to ``base``; and only
    then are the ``_old_`` dirs deleted. Every row therefore exists
    on disk at every crash point: before the promote, the complete
    old generation (plain and/or ``_old_``-renamed) plus the staging
    union; after it, a correct store plus dead ``_old_`` renames.
    Entry runs :func:`recover_store_slices`, which tells those two
    states apart by the staging dir's existence and rolls the live
    generation BACK (pre-promote crash) or clears the dead renames
    (post-promote crash) — never deleting a sole copy. Readers that
    may open a store between a crash and the next compaction call the
    same recovery first (see the ``_read_all`` helpers).
    """
    import os
    import shutil

    with store_lock(path, timeout=lock_timeout):
        _recover_store_slices_locked(path)
        tmp = os.path.join(path, "_compact")
        subs = sorted(
            s for s in os.listdir(path) if not s.startswith("_")
        )
        if len(subs) <= 1:
            return 0
        spark.read.parquet(
            *(os.path.join(path, s) for s in subs)
        ).write.mode("overwrite").parquet(tmp)
        for s in subs:
            os.replace(
                os.path.join(path, s), os.path.join(path, "_old_" + s)
            )
        os.replace(tmp, os.path.join(path, "base"))
        for s in subs:
            shutil.rmtree(
                os.path.join(path, "_old_" + s), ignore_errors=True
            )
        return len(subs)


def incremental_lsh_dedup_compacted(
    spark,
    docs: DataFrame,
    n_batches: int = 3,
    compact_after: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The K-batch admission chain (same contract, batch membership and
    statuses as ``streaming_incremental_dedup``) run as a plain ingest
    loop, with ``compact_store_slices`` folding all three stores
    (kept text, kept signatures, statuses) after batch
    ``compact_after`` — the between-jobs maintenance window the
    compaction docstring promises. Output is (doc_id, batch_id,
    status, dup_of) for every streamed doc, and must bit-match the
    uncompacted chain: compaction is a union + rewrite, so admission
    decisions made AFTER it see exactly the rows they would have seen
    reading the per-batch slices.

    Scale posture: identical to the streaming form — per-batch work is
    O(batch) banding against stored fixed-width signatures — plus the
    compaction pass itself, one sequential read+write of each store
    (no shuffle: no keying, no dedup, a concatenating rewrite). What
    compaction buys at 100 TB is the listing: an N-ingest store holds
    N+1 slices whose enumeration and per-slice parquet footers grow
    linearly, and folding them restores O(1) open cost for every later
    ingest without touching admission semantics.
    """
    if not (1 <= compact_after <= n_batches):
        raise ValueError(
            f"compact_after must be in [1, {n_batches}], got {compact_after}"
        )
    import os
    import shutil
    import tempfile

    from parallel_map_reduce_spark.operators.dedup import minhash_signatures

    mod = 2 * n_batches
    run_dir = tempfile.mkdtemp(prefix="pmr_spark_compact_incdedup_")
    try:
        store = os.path.join(run_dir, "kept_store")
        sig_store = os.path.join(run_dir, "kept_sigs")
        out = os.path.join(run_dir, "statuses")

        def _read_all(path: str) -> DataFrame:
            # A compacted store may carry a crashed compaction's
            # leftovers; recovery first, or the plain listing would
            # miss rows renamed to _old_ before the promote.
            recover_store_slices(path)
            subs = _store_slices(sorted(os.listdir(path)), None)
            return spark.read.parquet(*(os.path.join(path, s) for s in subs))

        base = docs.filter(F.col(id_col) % 2 == 0)
        base.write.parquet(os.path.join(store, "base"))
        minhash_signatures(base, text_col, id_col).write.parquet(
            os.path.join(sig_store, "base")
        )

        for k in range(1, n_batches + 1):
            batch_df = docs.filter(F.col(id_col) % mod == 2 * k - 1)
            res = (
                incremental_lsh_dedup(
                    batch_df,
                    _read_all(store),
                    text_col=text_col,
                    id_col=id_col,
                    kept_signatures=_read_all(sig_store),
                )
                .withColumn(
                    "batch_id", ((F.col(id_col) % mod + 1) / 2).cast("long")
                )
                .localCheckpoint(eager=True)
            )
            res.select(id_col, "batch_id", "status", "dup_of").write.parquet(
                os.path.join(out, f"batch_{k}")
            )
            survivors = batch_df.join(
                res.filter(F.col("status") == "kept").select(id_col), id_col
            ).localCheckpoint(eager=True)
            survivors.write.parquet(os.path.join(store, f"batch_{k}"))
            minhash_signatures(survivors, text_col, id_col).write.parquet(
                os.path.join(sig_store, f"batch_{k}")
            )
            if k == compact_after:
                # Quiesced between ingests — the compaction window. The
                # folded-slice counts assert the pass really ran over
                # multi-slice stores (k batch slices + base each).
                for p in (store, sig_store, out):
                    folded = compact_store_slices(spark, p)
                    # store/sig_store: base + k batch slices; statuses:
                    # k batch slices (single-slice stores no-op to 0).
                    expected = k + 1 if p != out else k
                    if expected >= 2 and folded != expected:
                        raise RuntimeError(
                            f"compaction folded {folded} slices at {p}, "
                            f"expected {expected}"
                        )
        return _read_all(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
