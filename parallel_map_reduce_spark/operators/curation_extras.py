"""Round-5 staging: curation operators implemented and property-tested
ahead of registration.

The round-4 driver correctness window (registry._PRIORITY, 50 slots) is
fully allocated and every displacement candidate's green row would go
stale if its code changed, so these operators land with library code +
pytest now and get their ``@register`` entries + DuckDB oracles at the
start of round 5 (see PLANS.md "Round-5 window plan"). Nothing here is
re-exported or called by registered queries — the round-4 surface is
unchanged.

Reference provenance: like the rest of the LLM-curation surface these
generalize the reference's aggregation pipeline (tokenize → hash →
aggregate, src/omp_count_words.cpp:49-367) to the operations a training
-data pipeline needs at 100 TB; they follow published designs (Bloom
1970 CACM space/time trade-off hashing; deterministic carve-outs per
GPT-3 App. C / The Pile §2's held-out split methodology).
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
