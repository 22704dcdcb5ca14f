"""SparkSession factory tuned for the driver environment.

Local mode is `local[$SPARK_GRAFT_CPUS]` (default 32 threads, single JVM),
but every config here is chosen to also hold on a multi-executor cluster:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow for
any Python exchange, UTC session time so timestamp semantics match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "iceberg_rest_server_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Match shuffle parallelism to local cores; on a real cluster AQE
        # coalesces this down / splits skew at runtime anyway.
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # opt-in (Spark 4.1) pushdown hook for Python Data Sources —
        # lets catalog/datasource.py prune partition files pre-scan
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # local-mode executors live inside the driver JVM: across a
        # 137-query bench the codegen cache, broadcasts, and shuffle
        # buffers accumulate, and a 16g heap showed 2-3x run-to-run
        # variance on the heavy dedup queries from full-GC pauses;
        # 48g (of the 128 GiB box) keeps GC out of the measurements
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # caller overrides (e.g. tools/scaling.py re-enables the UI so the
    # public monitoring REST API can report per-stage shuffle bytes)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
