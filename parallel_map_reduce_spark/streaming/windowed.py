"""Structured Streaming surface: windowed aggregation over the events
stream with watermark-based late-data handling, plus a custom stateful
operator (applyInPandasWithState).

The reference engine is batch-only (SURVEY §2.3: no streaming of any
kind); this module is part of the mandated extension surface. Every
streaming aggregation here has a batch twin registered in the query
registry (events_tumbling_window, events_session_windows) — the
streaming plans are the SAME declarative expressions, so the batch
DuckDB oracle transitively checks the streaming semantics, and tests
assert stream-vs-batch equality by running the stream with an
availableNow trigger.

Scale posture: watermarks bound state size (late rows beyond the
watermark are dropped, state for closed windows is evicted); stateful
ops shuffle once on the grouping key and keep per-key state in the state
store, no driver involvement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Events schema as stored (ts is parquet TIMESTAMP(NANOS) → read as long
# nanoseconds, same trick as sources/tables.py, then converted).
def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one parquet today; at
    scale a directory that continuously receives files).

    Spark's file source requires a DIRECTORY; the testdata ships a single
    read-only file, so we stage a symlink dir under /tmp (file content is
    never copied).

    The events file has shipped as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS, naive) across test-data generations; a one-row batch
    probe of the footer decides which readStream schema + normalization to
    use (streams need an explicit schema, so we cannot let inference pick).
    Both normalize to session-zone TIMESTAMP at µs, same as the batch path
    (sources/tables.load_table).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    stage = _stage_file_source_dir(src)
    return stream_events_dir(spark, stage, probe_path=src)


def _stage_file_source_dir(src: str) -> str:
    """Stage a single read-only parquet file as a DIRECTORY for Spark's
    file source via a /tmp symlink dir (content is never copied).
    Returns the stage directory path.

    lexists/readlink (not exists): a stale symlink whose target moved
    reports exists()==False but still blocks os.symlink with
    FileExistsError; two sessions can also race the check-then-create
    pair, so creation failure falls back to validate-else-recreate."""
    stage = os.path.join(
        "/tmp", "pmr_spark_stream", src.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, os.path.basename(src))
    for _ in range(3):
        try:
            os.symlink(src, link)
            break
        except FileExistsError:
            if (
                os.path.islink(link)
                and os.readlink(link) == src
                and os.path.exists(link)
            ):
                break  # a concurrent session already created the right link
            try:
                os.unlink(link)
            except FileNotFoundError:
                pass
    else:
        # fail LOUD: without the link the file source lists an empty
        # stage dir and every downstream query reads zero rows — an
        # oracle red with nothing pointing at the cause
        raise OSError(f"could not stage {src} as {link} after 3 attempts")
    return stage


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (the second table to
    earn a streaming source, after events) — the input side of the
    batch-train / stream-serve pattern: a nightly-trained model scores
    documents as they arrive. Streams need an explicit schema; the
    documents schema is fixed and timestamp-free, so a one-row batch
    probe supplies it with no normalization branch."""
    src = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    stage = _stage_file_source_dir(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(stage)


def stream_events_dir(
    spark: SparkSession,
    stage_dir: str,
    probe_path: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Raw event stream over a directory of events parquet files with ts
    normalized to session-zone TIMESTAMP (µs). `probe_path` is one file of
    the directory used for the batch footer probe (defaults to the
    directory itself)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = dict(spark.read.parquet(probe_path or stage_dir).dtypes).get("ts")
    # Mirror tables.load_table's three-way branch exactly: a stream schema
    # that mismatches the parquet physical type either errors or silently
    # reinterprets, so each encoding gets its own (schema, normalize) pair.
    # `norm` takes the column NAME so integer `div` stays exact (float
    # division on ns-epoch longs exceeds double's 2^53 mantissa).
    if probed == "bigint":  # TIMESTAMP(NANOS) read as long ns
        schema = T.LongType()
        norm = lambda name: F.timestamp_micros(F.expr(f"{name} div 1000"))
    elif probed == "timestamp_ntz":  # TIMESTAMP(MICROS, naive)
        schema = T.TimestampNTZType()
        norm = lambda name: F.col(name).cast("timestamp")
    else:  # TIMESTAMP(MICROS, isAdjustedToUTC=true) — already instant µs
        schema = T.TimestampType()
        norm = F.col
    reader = spark.readStream.schema(_events_raw_schema(schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.format("parquet").load(stage_dir)
    return raw.withColumn("ts", norm("ts"))


def tumbling_counts(
    events: DataFrame, window_size: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.

    Identical expression tree to the batch query
    queries_relational.q_events_tumbling — only the source differs.
    """
    # Group by the window STRUCT (not window.start): the struct carries the
    # event-time metadata the watermark attaches to, so append mode can
    # finalize and evict closed windows. Projecting .start inside groupBy
    # severs that linkage and forces complete-mode-only execution.
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_means(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window stats per event_type (overlapping windows): count,
    sum, and mean. The mean is derived from (sum, count) — the mergeable
    pair is what distributed aggregation actually maintains, and the
    oracle comparison hashes the pair rather than the division result
    (avg's extra division lands on round-4 boundaries where engine
    summation-order ulps flip the last digit; the sum does not)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows per user: a session closes after `gap` of
    inactivity. Output times as unix microseconds (integer — exactly
    comparable across engines)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "complete"
) -> None:
    """Execute a streaming plan to completion over the currently available
    data (availableNow trigger) into an in-memory sink — the test/bench
    harness path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# custom stateful operator: running per-user totals via applyInPandasWithState
# ---------------------------------------------------------------------------

RUNNING_STATE_SCHEMA = "n long, total double"
RUNNING_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: cumulative per-user event count
    and value total, maintained in the state store across micro-batches.

    The per-group update function is pure pandas over Arrow batches; state
    is a (count, total) pair per user — constant-size state per key, so
    the operator is safe at any stream length.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdf_iter, state: GroupState):
        user_id = key[0]
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": round(total, 4)}]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def stream_stream_purchase_view_join(
    events: DataFrame, band: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same user's
    views from the preceding `band`.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can size the state store and evict rows older
    than (watermark + band) — without the time bound, stream-stream join
    state grows forever. Batch twin: operators/temporal.interval_self_join
    filtered to (view → purchase) pairs; the test asserts equality.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    cond = (
        (purchases["user_id"] == views["view_user_id"])
        & (views["view_ts"] < purchases["purchase_ts"])
        & (views["view_ts"] >= purchases["purchase_ts"] - F.expr(f"INTERVAL {band}"))
    )
    return purchases.join(views, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "view_id", "view_ts"
    )


def upsert_batch(batch_df: DataFrame, target_dir: str, key_cols: list[str]) -> None:
    """Merge one micro-batch of updated rows into a parquet key-value
    table: delete-by-key then insert (classic foreachBatch upsert — what
    MERGE INTO does on a real lakehouse table format).

    Idempotent by construction: a replayed micro-batch carries the same
    per-key rows, and delete+insert of identical rows is a no-op — this
    is what makes update-mode output exactly-once end-to-end even though
    foreachBatch itself is at-least-once (the standard Spark sink
    contract).

    Scale posture: the anti-join is key-partitioned (no driver
    involvement, no collect); the rewrite cost is the table size, which
    a real deployment bounds by partitioning the target on a key prefix
    and rewriting only touched partitions — same plan, partition-pruned.
    """
    spark = batch_df.sparkSession
    import shutil

    staged = batch_df.persist()
    try:
        if os.path.isdir(target_dir):
            old = spark.read.parquet(target_dir)
            merged = old.join(staged, key_cols, "left_anti").unionByName(staged)
        else:
            merged = staged
        tmp = target_dir.rstrip("/") + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(target_dir):
            shutil.rmtree(target_dir)
        os.rename(tmp, target_dir)
    finally:
        staged.unpersist()


def run_counts_to_upsert_sink(
    spark: SparkSession, sf_dir: str, target_dir: str
) -> None:
    """Stream per-event-type counts (update mode) through a foreachBatch
    upsert sink into a parquet table — the production pattern for
    landing a continuously-updating aggregate where downstream readers
    need a consistent point-in-time table."""
    events = stream_events(spark, sf_dir)
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _bid: upsert_batch(df, target_dir, ["event_type"])
        )
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            target_dir.rstrip("/") + "_ckpt",
        )
        .start()
    )
    q.awaitTermination(120)


def deduped_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once event delivery: drop duplicate event_ids
    within the watermark horizon (at-least-once upstreams re-deliver;
    this is the standard idempotency filter in front of any streaming
    aggregate).

    State = one entry per event_id seen within the watermark; the
    watermark bounds it — state for ids older than the horizon is
    evicted, so memory is O(events per horizon), not O(stream length).

    dropDuplicatesWithinWatermark (not plain dropDuplicates) is what
    delivers that bound: with dropDuplicates the event-time column would
    have to be part of the dedup key for state to evict, and event_id
    alone would keep state forever.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same cumulative per-user totals as running_user_totals, built on
    Spark 4's transformWithStateInPandas — the successor stateful API
    (typed state handles, per-state TTL, timers) that replaces the
    applyInPandasWithState GroupState dict. Both implementations are
    kept: the operator surface promises the semantics, not the API
    vintage, and the equality test pins them to each other.

    State here is one ValueState[(count, total)] per user — constant per
    key, so the state store stays O(distinct users) at any stream
    length.

    Requires the RocksDB state store provider and the protobuf package
    (the TWS state-server protocol) — this container ships without
    protobuf, so the equality test import-skips here and runs on a full
    deployment.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events long, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "total_value": round(total, 4),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_docs_dir(
    spark: SparkSession,
    stage_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of documents parquet files —
    the ingestion feed of a crawling pipeline (each arriving file is one
    crawl batch). Streams need an explicit schema; documents carries no
    timestamp so no footer probe is needed (contrast stream_events_dir).
    ``max_files_per_trigger=1`` makes each staged file its own
    micro-batch — the knob the incremental-dedup registration uses to
    model one ingest round per batch."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage_dir)
