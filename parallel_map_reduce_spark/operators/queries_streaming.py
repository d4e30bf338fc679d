"""Registry entries that execute REAL Structured Streaming queries.

Every other streaming feature is verified in pytest against batch twins
(tests/test_streaming.py); this module routes one end-to-end streaming
plan through the driver's oracle gate so the streaming engine itself —
file-source micro-batching, watermarking, foreachBatch upsert sink —
earns a CORRECTNESS row, not just its batch-equivalent expression tree.

Reference parity: the reference engine is batch-only (SURVEY.md §1.4);
streaming is part of the beyond-reference surface (SURVEY.md §2.4).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from parallel_map_reduce_spark.registry import register
from parallel_map_reduce_spark.streaming import windowed


@register(
    "streaming_tumbling_counts",
    """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY window_start, event_type
""",
)
def q_streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts computed by the STREAMING engine: the events
    parquet is consumed as a file-source stream (availableNow), aggregated
    with a 2-hour watermark in update mode, and landed through the
    idempotent foreachBatch upsert sink into a parquet table keyed on
    (window_start, event_type). The returned DataFrame reads that table,
    so the driver's value-hash covers the whole streaming path — source
    schema probe, micro-batch aggregation state, sink merge — against the
    same DuckDB oracle as the batch twin ``events_tumbling_window``.

    Scale posture: identical to the production pattern — the upsert sink
    rewrites only keys present in each micro-batch (anti-join + union,
    no driver collect), and watermark eviction bounds aggregation state
    to the late-data horizon, so an unbounded stream runs in constant
    state. The sink table is re-derived per call (fresh temp dir), which
    keeps the registered query deterministic and idempotent.
    """
    target = os.path.join(
        tempfile.gettempdir(),
        "pmr_spark_stream_sink",
        sf_dir.strip("/").replace("/", "_") + "_tumbling",
    )
    for stale in (target, target + "_ckpt"):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    os.makedirs(os.path.dirname(target), exist_ok=True)

    counts = windowed.tumbling_counts(windowed.stream_events(spark, sf_dir))
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _bid: windowed.upsert_batch(
                df, target, ["window_start", "event_type"]
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", target + "_ckpt")
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(target)
