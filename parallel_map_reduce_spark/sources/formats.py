"""File-format connectors beyond parquet/text: CSV, JSON lines, ORC, XML.

The reference reads raw text only (reference: src/serial_count_words.cpp:50-74);
these are part of the extension surface. Production rules baked in:

- Schemas are always EXPLICIT on read. Inference scans the data twice and
  can flip types between runs — never acceptable on a 100 TB source.
- CSV/JSON are row-oriented interchange formats: fine as ingest
  boundaries, wrong as analytics storage (no column pruning, no
  predicate pushdown, full-file decode). Land them once, rewrite to
  parquet (sinks.write_parquet), query the parquet.
- All three formats split across tasks natively (CSV/JSON by line, ORC
  by stripe) — uncompressed or bzip2/zstd-seekable inputs parallelize;
  plain gzip does not (one task per file — avoid at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, *, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "FAILFAST")  # corrupt rows fail loudly, not silently null
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """JSON Lines (one object per line — the splittable JSON layout)."""
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_xml(df: DataFrame, path: str, *, row_tag: str = "row") -> None:
    """XML via Spark 4's built-in source (spark-xml, merged upstream)."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    row_tag: str = "row",
) -> DataFrame:
    """XML ingest boundary — same rules as CSV/JSON: explicit schema,
    FAILFAST, land once and rewrite to parquet. XML does NOT split
    within a file (a row can span lines), so at scale the source must
    arrive as many files; one giant XML file serializes the scan."""
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "FAILFAST")
        .format("xml")
        .load(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC carries its own schema (columnar, predicate pushdown — the
    other acceptable analytics format besides parquet)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Ingest raw files as binary rows — the multimodal on-ramp: images/
    audio/video land as (path, modificationTime, length, content) with
    content as an opaque binary column, ready for the mapInPandas
    decode/feature stages (operators/multimodal.py).

    Spark's binaryFile source parallelizes across files (one task per
    split; a file is never split mid-payload) and prunes the `content`
    column if a query reads only metadata — so listing-level stats
    queries never touch payload bytes. At 100 TB prefer many medium
    files (HDFS-block-sized) over millions of tiny ones: driver-side
    listing is the scale limit, solved operationally by manifest/iceberg
    listings, not by this reader.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE ingestion for pipelines that must not stop on bad
    records (the FAILFAST readers above are for sources that should):
    malformed rows land in `_corrupt_record` and are split into a
    quarantine frame for offline inspection, while clean rows flow on.

    Returns (clean, quarantined). The split is one predicate on the
    already-parsed frame — no second read of the source.
    """
    # StructType.add mutates in place — build a fresh schema instead of
    # appending a surprise column to the caller's object
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    bad = F.col("_corrupt_record").isNotNull()
    clean = parsed.filter(~bad).drop("_corrupt_record")
    quarantined = parsed.filter(bad).select("_corrupt_record")
    return clean, quarantined
