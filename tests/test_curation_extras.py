"""Property tests for the round-5 staging operators
(operators/curation_extras.py) — registered + oracled in round 5; see
PLANS.md "Round-5 window plan"."""

import hashlib

from pyspark.sql import functions as F

from parallel_map_reduce_spark.functions.hashing import (
    MERSENNE_P,
    universal_params,
)
from parallel_map_reduce_spark.operators.curation_extras import (
    bloom_bitset,
    bloom_decontaminate,
    sample_exact_n,
    stratified_exact_n,
)
from parallel_map_reduce_spark.operators.textstats import (
    decontaminate_against_eval,
)
from parallel_map_reduce_spark.sources.tables import load_table


def _h64(s: str, seed: int = 0) -> int:
    return int(
        hashlib.md5(f"{s}\x1f{seed}".encode()).hexdigest()[:15], 16
    )


def _positions(shingle: str, m_bits: int, k: int) -> list[int]:
    base = _h64(shingle) & 0xFFFFFFFF
    return [((a * base + b) % MERSENNE_P) % m_bits for a, b in universal_params(k)]


def test_bloom_bitset_matches_python_model(spark):
    shingles = ["a b c", "d e f", "x y z"]
    df = spark.createDataFrame([(s,) for s in shingles], "shingle string")
    got = {
        r["word_idx"]: r["word"]
        for r in bloom_bitset(df, m_bits=256, k=3).collect()
    }
    want: dict[int, int] = {}
    for s in shingles:
        for p in _positions(s, 256, 3):
            want[p // 64] = want.get(p // 64, 0) | (1 << (p % 64))
    assert got == want


def test_bloom_flags_superset_of_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["doc_id"]: r
        for r in decontaminate_against_eval(docs, eval_mod=50).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, eval_mod=50).collect()
    }
    assert set(bloom) == set(exact)  # same training docs
    for doc_id, e in exact.items():
        b = bloom[doc_id]
        assert b["n_sh"] == e["n_sh"]
        # Bloom membership can only over-report — never a false negative.
        assert b["n_bloom"] >= e["n_shared"]
        if e["contaminated"]:
            assert b["maybe_contaminated"]


def test_bloom_false_positive_rate_bounded(spark, sf_dir):
    # At the default 2^18-bit / k=3 sizing the sandbox eval set loads
    # the filter so lightly that spurious per-shingle hits should stay
    # well under 5% of probes.
    docs = load_table(spark, sf_dir, "documents")
    exact = decontaminate_against_eval(docs, eval_mod=50).select(
        "doc_id", "n_sh", "n_shared"
    )
    bloom = bloom_decontaminate(docs, eval_mod=50).select(
        "doc_id", "n_bloom"
    )
    joined = exact.join(bloom, "doc_id").agg(
        F.sum("n_sh").alias("probes"),
        F.sum(F.col("n_bloom") - F.col("n_shared")).alias("false_pos"),
    ).collect()[0]
    assert joined["false_pos"] <= joined["probes"] * 0.05


def test_sample_exact_n_deterministic_and_ranked(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = sorted(ids, key=lambda i: (_h64(str(i)), i))[:25]
    got = [r["doc_id"] for r in sample_exact_n(docs, 25).collect()]
    assert got == want
    # idempotent across runs / independent of partitioning
    again = [
        r["doc_id"]
        for r in sample_exact_n(docs.repartition(7), 25).collect()
    ]
    assert again == want


def test_sample_exact_n_is_top_n_not_full_sort(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = sample_exact_n(docs, 25)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stratified_exact_n_counts_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = stratified_exact_n(docs, "lang", n_per=10)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {lang: min(10, n) for lang, n in sizes.items()}
    # per-stratum membership matches the Python model
    got_en = sorted(
        r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()
    )
    en_ids = [
        r["doc_id"] for r in docs.filter(F.col("lang") == "en").collect()
    ]
    want_en = sorted(sorted(en_ids, key=lambda i: (_h64(str(i)), i))[:10])
    assert got_en == want_en


def test_stratified_exact_n_uses_window_group_limit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        stratified_exact_n(docs, "lang", n_per=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_bloom_probe_side_never_sort_merge_joins(spark, sf_dir):
    # The bitset rides a 1-row broadcast; the corpus must never be
    # sort-merge-joined (i.e. shuffled) on the shingle key.
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        bloom_decontaminate(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def _py_shingles(text: str) -> set:
    import re

    toks = [t for t in re.split("[ \t\n\r\x0b\x0c]+", text) if t != ""]
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }


def _py_jaccard(a: str, b: str) -> float:
    sa, sb = _py_shingles(a), _py_shingles(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_incremental_dedup_planted(spark):
    from parallel_map_reduce_spark.operators.curation_extras import (
        incremental_lsh_dedup,
    )

    a = "the quick brown fox jumps over the lazy dog near the old river bank"
    c = "pack my box with five dozen liquor jugs before the night train leaves"
    kept = spark.createDataFrame([(1, a)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (10, a + " today"),  # near-copy of kept 1 -> cross_dup
            (11, "sphinx of black quartz judge my vow in the quiet museum hall"),
            (12, c),  # batch pair canonical
            (13, c + " now"),  # near-copy of 12 -> batch_dup
            (14, "hi"),  # too short to shingle -> kept
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in incremental_lsh_dedup(new, kept).collect()
    }
    assert got == {
        10: ("cross_dup", 1),
        11: ("kept", None),
        12: ("kept", None),
        13: ("batch_dup", 12),
        14: ("kept", None),
    }


def test_incremental_dedup_real_corpus_invariants(spark, sf_dir):
    from parallel_map_reduce_spark.operators.curation_extras import (
        incremental_lsh_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    out = incremental_lsh_dedup(new, kept).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == new.count()
    statuses = {r["status"] for r in out}
    assert statuses <= {"kept", "cross_dup", "batch_dup"}
    for r in out:
        if r["status"] == "cross_dup":
            # drop is sound: verified against a real kept doc
            assert r["dup_of"] % 2 == 0
            assert _py_jaccard(texts[r["doc_id"]], texts[r["dup_of"]]) >= 0.5
        elif r["status"] == "batch_dup":
            # canonical is an earlier new doc that itself survived
            assert r["dup_of"] < r["doc_id"]
            assert rows[r["dup_of"]]["status"] == "kept"
        else:
            assert r["dup_of"] is None
    # determinism under different partitioning
    again = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in incremental_lsh_dedup(new.repartition(7), kept.repartition(5)).collect()
    }
    assert again == {r["doc_id"]: (r["status"], r["dup_of"]) for r in out}
