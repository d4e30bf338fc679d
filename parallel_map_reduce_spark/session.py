"""SparkSession factory with scale-aware defaults.

Local mode is for correctness testing only; every conf here is chosen to
also be the right default on a 1000-executor cluster:

- AQE on: runtime partition coalescing + skew-join splitting replaces the
  reference's hand-tuned "10 chunks per thread" over-decomposition
  (reference: src/omp_count_words.cpp:24,91,332).
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden per-deploy (AQE coalesces the excess anyway).
- Arrow enabled so the Pandas-UDF slow path is batch-vectorized.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "parallel_map_reduce_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound per-batch memory for every Pandas-UDF/mapInPandas stage
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # bucketed-table writes (sinks.write_parquet) need a warehouse;
        # keep it off the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pmr_spark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
