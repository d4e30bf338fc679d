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
