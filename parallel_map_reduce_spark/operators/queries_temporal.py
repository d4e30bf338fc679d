"""Registered temporal-join queries over the `events` table.

As-of and interval joins are absent from both the reference (which has no
joins — SURVEY.md §2.3) and Spark's built-in operator set; these queries
exercise the compositions in :mod:`.temporal` and oracle-check them
against explicit window/range SQL in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators.temporal import asof_join, interval_self_join
from parallel_map_reduce_spark.registry import register
from parallel_map_reduce_spark.sources.tables import load_table


@register(
    "asof_join_purchase_to_view",
    """
SELECT event_id,
       user_id,
       ts,
       view_event_id,
       view_ts
FROM (
    SELECT p.event_id,
           p.user_id,
           p.ts,
           v.event_id AS view_event_id,
           v.ts AS view_ts,
           ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY v.ts DESC, v.event_id DESC
           ) AS rn
    FROM events p
    JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND v.ts <= p.ts
    WHERE p.event_type = 'purchase'
) WHERE rn = 1
""",
)
def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's most recent view at-or-before it
    (ties broken by the larger event_id) — the canonical as-of join, via
    the single-shuffle union+window operator."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        value_cols=["view_event_id", "view_ts"],
        tie_break="view_event_id",
    )


@register(
    "interval_join_event_pairs",
    """
SELECT a.event_id AS first_event_id,
       a.event_type AS first_type,
       b.event_id AS second_event_id,
       b.event_type AS second_type,
       a.user_id,
       ROUND((epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0, 3) AS gap_seconds
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 300 SECOND
""",
)
def q_interval_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within a 5-minute band: an interval range
    join planned as an equality-key join with a residual time predicate
    (never a cartesian product)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts"
    )
    pairs = interval_self_join(
        events,
        on="user_id",
        ts="ts",
        band_seconds=300,
        left_cols=["event_id", "event_type", "user_id"],
        right_cols=["event_id", "event_type"],
    )
    gap = F.col("__tb").cast("double") - F.col("__ta").cast("double")
    return pairs.select(
        F.col("l_event_id").alias("first_event_id"),
        F.col("l_event_type").alias("first_type"),
        F.col("r_event_id").alias("second_event_id"),
        F.col("r_event_type").alias("second_type"),
        F.col("l_user_id").alias("user_id"),
        F.round(gap, 3).alias("gap_seconds"),
    )
