"""Sessionization queries (batch twins of the streaming session windows).

Two formulations, both oracle-checked:
- events_sessionization: classic gap-based sessions via lag + cumulative
  sum over (user, time) windows — the portable relational form.
- events_session_windows: Spark's native session_window aggregation; the
  oracle reproduces its merge semantics (session end = last event + gap)
  with the lag/cumsum construction, proving the built-in operator
  agrees with the relational definition.

Session bounds are emitted as unix MICROSECONDS (integers) — exactly
comparable across engines regardless of timestamp precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parallel_map_reduce_spark.registry import register
from parallel_map_reduce_spark.sources.tables import load_table

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000

_SESSION_CTE = f"""
WITH marked AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked
)
"""


def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > F.lit(_GAP_US)), 1
    ).otherwise(0)
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select("user_id", "event_id", "value", ts_us.alias("ts_us"), is_new.alias("is_new"))
        .withColumn("session_seq", F.sum("is_new").over(wc))
    )


@register(
    "events_sessionization",
    _SESSION_CTE
    + """
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       ROUND(SUM(value), 4) AS session_value
FROM sess
GROUP BY user_id, session_seq
""",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: 30-minute inactivity closes a session.
    One shuffle on user_id (window + groupBy share the partitioning;
    Catalyst reuses the exchange)."""
    return _sessionized(spark, sf_dir).groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@register(
    "events_session_windows",
    _SESSION_CTE
    + f"""
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sess
GROUP BY user_id, session_seq
""",
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (the batch twin of the streaming
    operator in streaming/windowed.py). The oracle derives the same
    sessions relationally — window end = last event + gap."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", f"{GAP_MINUTES} minutes").alias("sw"), "user_id")
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


@register(
    "funnel_conversion",
    """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 1 DAY
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL 1 DAY
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: first view -> first click within a day of
    it -> first purchase within a day of that, counted per stage (the
    product-analytics query every event warehouse runs).

    Scale posture: the oracle's 3-CTE join cascade would shuffle events
    three times; this plan instead chains three Window mins over the
    SAME user_id partitioning — Catalyst plans ONE exchange and three
    in-partition window passes, then a global count. Events never join
    events."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    day = F.expr("INTERVAL 1 DAY")
    step1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    step2 = step1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    step3 = step2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    return step3.agg(
        F.countDistinct(
            F.when(F.col("t_view").isNotNull(), F.col("user_id"))
        ).alias("n_view"),
        F.countDistinct(
            F.when(F.col("t_click").isNotNull(), F.col("user_id"))
        ).alias("n_view_click"),
        F.countDistinct(
            F.when(F.col("t_purchase").isNotNull(), F.col("user_id"))
        ).alias("n_full_funnel"),
    )


@register(
    "cohort_retention",
    """
WITH su AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
        FROM events),
j AS (SELECT su.user_id, su.cohort_week,
             date_diff('day', su.cohort_week, act.act_week) // 7 AS week_offset
      FROM su JOIN act ON su.user_id = act.user_id
      WHERE act.act_week >= su.cohort_week)
SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active
FROM j GROUP BY cohort_week, week_offset
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by signup week, counted as
    active in each subsequent week — the standard growth-analytics
    triangle. Week offsets are exact integer divisions of day
    differences between week-truncated dates (identical in both
    engines). One shuffle builds each per-user relation on user_id, the
    join reuses that partitioning, and the final aggregate shuffles only
    (cohort, offset) pairs."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week"))
    )
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("act_week")
    ).distinct()
    return (
        su.join(act, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.expr("CAST(datediff(act_week, cohort_week) DIV 7 AS BIGINT)").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_TRANSITIONS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_transition_matrix", _TRANSITIONS_SQL)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each consecutive (prev → next) event-type pair, the transition
    count and how many distinct users exhibit it — the path-analysis
    primitive behind funnel discovery and next-action models, computed
    with the same lag-over-(user, time) ordering the sessionization
    queries pin (event_id tiebreak makes same-timestamp order
    deterministic across engines).

    Scale posture: one shuffle on user_id for the lag window (events
    for one user co-locate; the user key is high-cardinality so it
    balances), then one partial→final agg on the (prev, next) pair key
    — the matrix itself is |event_types|² rows, trivially small."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    ordered = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return ordered.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("user_id").alias("n_users"),
    )
