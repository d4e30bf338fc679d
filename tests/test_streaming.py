"""Structured Streaming tests: stream-vs-batch equivalence via the
availableNow trigger, plus the custom stateful operator."""

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_spark.sources.tables import load_table
from parallel_map_reduce_spark.streaming import windowed

SF = "/root/testdata/sf0.001"


def _collect_memory(spark, name):
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_tumbling_stream_matches_batch(spark):
    stream = windowed.tumbling_counts(windowed.stream_events(spark, SF))
    windowed.run_stream_to_memory(stream, "t_tumbling", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in _collect_memory(spark, "t_tumbling")
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want


def test_sliding_stream_runs(spark):
    stream = windowed.sliding_means(windowed.stream_events(spark, SF))
    windowed.run_stream_to_memory(stream, "t_sliding", output_mode="complete")
    rows = _collect_memory(spark, "t_sliding")
    assert rows
    # each window_start must align to the 30-minute slide
    for r in rows[:20]:
        assert r["window_start"].minute in (0, 30)


def test_session_stream_matches_batch_twin(spark):
    stream = windowed.session_window_stats(windowed.stream_events(spark, SF))
    windowed.run_stream_to_memory(stream, "t_sessions", output_mode="complete")
    got = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"],
            r["n_events"],
            r["session_value"],
        )
        for r in _collect_memory(spark, "t_sessions")
    }
    from parallel_map_reduce_spark.operators.queries_sessions import q_session_windows

    want = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"],
            r["n_events"],
            r["session_value"],
        )
        for r in q_session_windows(spark, SF).collect()
    }
    assert got == want


def test_stateful_running_totals(spark):
    stream = windowed.running_user_totals(windowed.stream_events(spark, SF))
    windowed.run_stream_to_memory(stream, "t_running", output_mode="update")
    # update mode emits one row per user per micro-batch; the LAST row per
    # user carries the final cumulative state
    rows = _collect_memory(spark, "t_running")
    assert rows
    finals = {}
    for r in rows:  # memory sink preserves batch order; later overwrites
        finals[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert finals == want


def test_stream_stream_join_matches_batch(spark):
    stream = windowed.stream_stream_purchase_view_join(
        windowed.stream_events(spark, SF), band="60 minutes", watermark="2 hours"
    )
    windowed.run_stream_to_memory(stream, "t_ssjoin", output_mode="append")
    got = {
        (r["purchase_id"], r["view_id"]) for r in _collect_memory(spark, "t_ssjoin")
    }
    ev = load_table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("view_ts"),
    )
    want = {
        (r["purchase_id"], r["view_id"])
        for r in p.join(
            v,
            (p["user_id"] == v["vu"])
            & (v["view_ts"] < p["purchase_ts"])
            & (v["view_ts"] >= p["purchase_ts"] - F.expr("INTERVAL 60 MINUTES")),
        ).collect()
    }
    assert want, "corpus should contain view→purchase pairs within the band"
    assert got == want
