"""SparkSession factory for the propensity_spark engine.

Configured for correctness-vs-DuckDB comparison (UTC session timezone,
ANSI-off like the reference) and for scale (AQE, partition coalescing,
skew-join handling, Arrow transfers). The reference relies on the
Databricks runtime session (SURVEY.md §4); we build our own.

At 100 TB the same settings hold: AQE re-plans shuffle partition counts
at runtime, so `spark.sql.shuffle.partitions` is only an upper bound;
skew joins are split automatically; broadcast threshold stays default so
dimension tables (region/nation/part/supplier) broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "propensity_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode is a single JVM; `spark.driver.memory` is set via
    SPARK_DRIVER_MEM (default 48g) only if no session exists yet.
    """
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Spark 4 defaults ANSI on; the reference semantics (div-by-zero
        # -> NULL, silent casts) require legacy mode, and DuckDB agrees.
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
