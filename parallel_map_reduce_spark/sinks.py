"""Sinks: partitioned and coalesced writers.

Parity targets in the reference:
- O9, partitioned sink: one ``output_files/output{i}.txt`` per reducer in
  ``word:count`` lines (reference: src/utils.cpp:36-58, parallel write
  loop src/omp_count_words.cpp:134-142, path template :81).
- O10, combined sink: a single ``combined_omp_wc.txt`` concatenating all
  reducer maps (reference: src/omp_count_words.cpp:146-165).

Spark's writer produces one ``part-*`` file per partition natively, so O9
is ``repartition(n, word)`` + ``write.text`` and O10 is ``coalesce(1)``.
The ``word:count`` line format is ambiguous when tokens contain ':'
(SURVEY.md §1.4 — 1,330 such lines in the reference output); parse from
the RIGHT, as :func:`read_wordcount_text` does.

Scale posture: the partitioned writer is the 100 TB path (N writers, no
single-node funnel). ``coalesce(1)`` exists only for small final results
/ byte-compat checks — never for large data. Parquet is the production
sink (columnar, statistics, splittable); text sinks exist for reference
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_wordcount_text(
    df: DataFrame,
    path: str,
    *,
    num_partitions: int | None = None,
    combined: bool = False,
) -> None:
    """Write a (word, count) DataFrame as ``word:count`` text lines.

    ``num_partitions`` hash-partitions by word first (O9: the reference's
    16 reducer files); ``combined=True`` coalesces to a single part file
    (O10). The two are exclusive.
    """
    out = df.select(
        F.concat(F.col("word"), F.lit(":"), F.col("count").cast("string")).alias("value")
    )
    if combined:
        out = out.coalesce(1)
    elif num_partitions is not None:
        out = out.repartition(num_partitions, "word")
    out.write.mode("overwrite").text(path)


def read_wordcount_text(spark: SparkSession, path: str) -> DataFrame:
    """Read ``word:count`` lines back into (word, count), splitting on the
    LAST ':' so words containing ':' round-trip exactly."""
    lines = spark.read.text(path)
    # greedy (.*) consumes through any ':' inside the word; the final
    # group takes the trailing digits
    return lines.select(
        F.regexp_extract("value", r"^(.*):(\d+)$", 1).alias("word"),
        F.regexp_extract("value", r"^(.*):(\d+)$", 2).cast("long").alias("count"),
    )


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    buckets: tuple[int, str, str] | None = None,
) -> None:
    """Production sink. ``partition_by`` creates directory partitions
    (partition pruning at read); ``buckets=(n, col, table)`` writes a
    bucketed table so later joins/aggs on ``col`` skip the shuffle
    entirely (bucketed writes require saveAsTable)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if buckets is not None:
        n, col, table = buckets
        w.bucketBy(n, col).sortBy(col).option("path", path).saveAsTable(table)
    else:
        w.parquet(path)


def write_parquet_sorted(df: DataFrame, path: str, order_col: str, n_files: int) -> None:
    """Layout-aware sink: range-partition by the ordering key, then sort
    within each partition before writing. Every output file then covers a
    disjoint key range and every parquet row group carries tight min/max
    stats — so a later point/range filter on that key prunes whole files
    and row groups at the scan (the poor engine's Z-order, exactly right
    for one dominant filter column).

    At 100 TB this is the difference between scanning everything and
    scanning one file: layout is a write-time decision the reader gets
    for free forever after.
    """
    (
        df.repartitionByRange(n_files, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def publish_dataset(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    n_writers: int | None = None,
) -> DataFrame:
    """Publish a training dataset as row-capped parquet shards and
    return its manifest: (shard, rows, bytes), one row per file.

    Sharding uses the writer's ``maxRecordsPerFile`` cap — no pre-count
    job, no global sort: each of the ``n_writers`` tasks (default: the
    frame's current parallelism) rolls to a new file every
    ``rows_per_shard`` rows, which is how a 100 TB publish keeps every
    shard consumable by a single loader worker regardless of upstream
    partition sizes.

    The manifest is computed distributed — per-file row counts from
    ``input_file_name()`` over a read-back scan (parquet footers only,
    the count never deserializes row data), byte sizes from the
    binaryFile listing (path/length metadata; content is never read) —
    and also written to ``<path>/_manifest`` as a single JSON file
    (underscore-prefixed, so data readers ignore it; one file because a
    manifest is driver-scale by construction: one row per shard).
    """
    out = df.repartition(n_writers) if n_writers is not None else df
    out.write.mode("overwrite").option("maxRecordsPerFile", rows_per_shard).parquet(
        path
    )

    # Join on the file basename: input_file_name() and the binaryFile
    # listing render the same file under different URI forms
    # (file:///x vs file:/x).
    base = lambda c: F.element_at(F.split(c, "/"), -1)  # noqa: E731
    rows = (
        spark.read.parquet(path)
        .groupBy(base(F.input_file_name()).alias("shard"))
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    sizes = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select(base(F.col("path")).alias("shard"), F.col("length").alias("bytes"))
    )
    # Materialize the manifest once (it is driver-scale: one row per
    # shard) — without this every downstream action on the returned
    # frame would re-list and re-scan the published directory.
    manifest = (
        rows.join(sizes, "shard").orderBy("shard").localCheckpoint(eager=True)
    )
    manifest.coalesce(1).write.mode("overwrite").json(path + "/_manifest")
    return manifest
