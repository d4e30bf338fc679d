"""Parity tests for the staged operators' draft DuckDB oracles
(curation_extras.*_oracle_sql) — the same normalize-and-compare rules
as tools/check_oracle.py, so the r5 registrations land pre-proven."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators import curation_extras as ce
from parallel_map_reduce_spark.sources.tables import load_table


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else f"{v:.12g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _assert_matches(sdf, con, sql):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _normalize(srows, scols) == _normalize(drows, dcols)


def test_sample_exact_n_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.sample_exact_n(docs, 100).select("doc_id", "lang", "n_chars")
    _assert_matches(sdf, duck, ce.sample_exact_n_oracle_sql(100))


def test_stratified_exact_n_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.stratified_exact_n(docs, "lang", 20).select(
        "doc_id", "lang", "n_chars"
    )
    _assert_matches(sdf, duck, ce.stratified_exact_n_oracle_sql(20))


def test_containment_pairs_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.containment_pairs(docs, threshold=0.5)
    _assert_matches(sdf, duck, ce.containment_pairs_oracle_sql(0.5))


def test_bloom_decontaminate_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.bloom_decontaminate(docs, eval_mod=50)
    _assert_matches(sdf, duck, ce.bloom_decontaminate_oracle_sql(50))


def test_cdc_chunks_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.cdc_chunks(docs, window=4, divisor=16)
    _assert_matches(sdf, duck, ce.cdc_chunks_oracle_sql(4, 16))


def test_incremental_lsh_dedup_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.incremental_lsh_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    )
    _assert_matches(sdf, duck, ce.incremental_lsh_dedup_oracle_sql())


def test_bpe_train_vocab_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.bpe_train_merges(docs, rounds=4)
    _assert_matches(sdf, duck, ce.bpe_train_vocab_oracle_sql(4))


def test_cluster_sharded_oracle(spark, sf_dir, duck):
    from parallel_map_reduce_spark.operators.queries_curation import (
        q_semantic_dedup_cluster_sharded,
        _CLUSTER_SHARD_SQL,
    )

    sdf = q_semantic_dedup_cluster_sharded(spark, sf_dir)
    _assert_matches(sdf, duck, _CLUSTER_SHARD_SQL)


def test_bigram_lm_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.bigram_lm_doc_scores(docs), duck, ce.bigram_lm_doc_scores_oracle_sql()
    )


def test_gopher_repetition_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.gopher_repetition_stats(docs),
        duck,
        ce.gopher_repetition_stats_oracle_sql(),
    )


def test_bpe_encode_stats_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.bpe_encode_stats(docs, rounds=4), duck, ce.bpe_encode_stats_oracle_sql(4)
    )


def test_gopher_quality_stats_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.gopher_quality_stats(docs), duck, ce.gopher_quality_stats_oracle_sql()
    )


def test_dsir_importance_weights_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.dsir_importance_weights(docs, F.col("lang") == "en")
    _assert_matches(sdf, duck, ce.dsir_importance_weights_oracle_sql("lang = 'en'"))


def test_soft_dedup_weights_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.soft_dedup_weights(docs), duck, ce.soft_dedup_weights_oracle_sql()
    )


def test_weighted_systematic_sample_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    sdf = ce.weighted_systematic_sample(docs, "n_chars", 37)
    _assert_matches(
        sdf, duck, ce.weighted_systematic_sample_oracle_sql("n_chars", 37)
    )


def test_snapshot_diff_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    _assert_matches(ce.snapshot_diff(old, new), duck, ce.snapshot_diff_oracle_sql())


def test_streaming_incremental_dedup_chain_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.streaming_incremental_dedup(spark, docs),
        duck,
        ce.incremental_lsh_dedup_chain_oracle_sql(),
    )


def test_pipeline_curate_corpus_oracle(spark, sf_dir, duck):
    from parallel_map_reduce_spark.operators import curation_pipeline as cp

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    _assert_matches(
        cp.pipeline_curate_corpus(spark, docs, emb),
        duck,
        cp.pipeline_curate_corpus_oracle_sql(),
    )


def test_pipeline_curate_corpus_funnel_monotone(spark, sf_dir):
    """Funnel sanity independent of the oracle: stages chain (stage
    k+1's n_in == stage k's n_out), counts never grow, and the sample
    stage emits exactly SAMPLE_N docs."""
    from parallel_map_reduce_spark.operators import curation_pipeline as cp

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = {
        r["stage"]: r
        for r in cp.pipeline_curate_corpus(spark, docs, emb).collect()
    }
    order = [
        "01_gopher_quality",
        "02_gopher_repetition",
        "03_ccnet_perplexity",
        "04_quality_classifier",
        "05_lsh_neardup",
        "06_semantic_dedup",
        "07_decontaminate",
        "08_dsir_madow_sample",
        "09_pack",
    ]
    assert set(rows) == set(order)
    for prev, nxt in zip(order, order[1:]):
        assert rows[nxt]["n_in"] == rows[prev]["n_out"]
    for s in order[:-1]:  # pack emits batches, not docs
        assert rows[s]["n_out"] <= rows[s]["n_in"]
    assert rows["08_dsir_madow_sample"]["n_out"] == cp.SAMPLE_N


def test_store_slices_replay_isolation():
    """The at-least-once replay filter (VERDICT r6 hardening): a
    retried batch must see base + strictly earlier slices only — not
    its own stale slice, not a later batch's."""
    listing = ["base", "batch_1", "batch_2", "batch_3", "batch_10"]
    # replay of batch 2 after batches 3 and 10 already ran
    assert ce._store_slices(listing, 2) == ["base", "batch_1"]
    # numeric (not lexicographic) bound: batch_10 excluded for bid=10
    assert ce._store_slices(listing, 10) == [
        "base",
        "batch_1",
        "batch_2",
        "batch_3",
    ]
    # first batch ever: only the base corpus
    assert ce._store_slices(listing, 1) == ["base"]
    # final assembly reads everything
    assert ce._store_slices(listing, None) == listing


def test_streaming_incremental_dedup_rejects_zero_batches(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="n_batches"):
        ce.streaming_incremental_dedup(spark, docs, n_batches=0)


def test_retract_and_readmit_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    _assert_matches(
        ce.retract_and_readmit(docs), duck, ce.retract_and_readmit_oracle_sql()
    )


def test_retract_and_readmit_semantics(spark, sf_dir):
    """Flow invariants independent of the oracle: every readmit row was
    an admit-phase cross_dup pointing at a retracted doc; no readmit
    row names a retracted doc as its new canonical; retract rows are
    exactly the kept ids ≡ 0 (mod 10)."""
    docs = load_table(spark, sf_dir, "documents")
    rows = ce.retract_and_readmit(docs).collect()
    admit = {r["doc_id"]: r for r in rows if r["phase"] == "admit"}
    retracted = {r["doc_id"] for r in rows if r["phase"] == "retract"}
    readmit = {r["doc_id"]: r for r in rows if r["phase"] == "readmit"}
    kept_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 2 == 0).select("doc_id").collect()
    }
    assert retracted == {i for i in kept_ids if i % 10 == 0}
    for i, r in readmit.items():
        assert admit[i]["status"] == "cross_dup"
        assert admit[i]["dup_of"] in retracted
        assert r["dup_of"] not in retracted  # -1 or a surviving doc
