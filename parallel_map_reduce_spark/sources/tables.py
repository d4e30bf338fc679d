"""Data sources.

The reference's only sources are local text files read via buffered IO or
mmap (reference: src/serial_count_words.cpp:50-74,
src/omp_count_words.cpp:175-221). Spark's data-source layer subsumes both:
``spark.read.text`` plans boundary-respecting input splits natively
(`spark.sql.files.maxPartitionBytes`), replacing the reference's hand-rolled
``SplitBufferToChunks`` (src/omp_count_words.cpp:231-289).

Parquet is the primary analytics format here (columnar, predicate pushdown,
column pruning) — the reference has no storage format at all (SURVEY.md §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (parquet) from a scale-factor directory.

    `events.ts` has shipped in two parquet encodings across test-data
    generations, and we normalize both to session-zone TIMESTAMP (µs):

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so read as
      long nanoseconds (`spark.sql.legacy.parquet.nanosAsLong` — a dynamic
      SQLConf, works in any caller's session) and floor-divide to
      microsecond timestamps. Sub-microsecond ordering is preserved for
      analytics by tie-breaking on event_id.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers
      TIMESTAMP_NTZ, which instant functions (`unix_micros`, `window`)
      reject. The session timezone is pinned to UTC (session.py), so a
      cast to TIMESTAMP reinterprets the naive wall clock as UTC —
      exactly how the DuckDB oracle treats the same bytes.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table at sf_dir and register each as a temp view.

    Routes through :func:`load_table` so per-table special cases (the
    events TIMESTAMP(NANOS) → microsecond conversion) apply uniformly —
    a view registered here has the same schema every other consumer sees.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def read_text_corpus(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read raw text files into a documents-shaped DataFrame.

    One row per file: (doc_id, text). Mirrors the reference's argv-ordered
    corpus (src/omp_count_words.cpp:59-60) — doc_id is the position of the
    path in `paths`. `wholetext=True` keeps one row per file so multi-line
    tokens-per-document semantics match the per-file accumulation loop
    (src/serial_count_words.cpp:50-74).

    For 100 TB corpora prefer line-mode (`wholetext=False`, the default
    text source) so a single huge file still splits into many partitions;
    the word-count result is identical because tokenization splits on the
    same whitespace class that separates lines.
    """
    frames = []
    for i, p in enumerate(paths):
        df = spark.read.text(p, wholetext=True).select(
            F.lit(i).cast("long").alias("doc_id"), F.col("value").alias("text")
        )
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def read_text_lines(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Line-oriented scan of a text corpus: DataFrame[value: string].

    This is the scale path — Spark splits large files at line boundaries
    across partitions (the reference hand-built the same alignment in
    SplitBufferToChunks, src/omp_count_words.cpp:231-289).

    Caveat: Hadoop's LineRecordReader strips a UTF-8 BOM from the first
    line of each file, so a BOM-prefixed first token loses its BOM here.
    For byte-exact reference parity use :func:`read_text_corpus`
    (wholetext), which preserves the BOM.
    """
    return spark.read.text(paths)
