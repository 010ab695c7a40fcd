"""SparkSession factory tuned for the local[N] harness.

The settings mirror what a 1000-executor deployment would want where the
two agree (AQE on, Arrow on, UTC timestamps) and pin local-specific knobs
(shuffle partitions ~ cores, big driver heap) only where local mode needs
them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "flink_infotheoretic_feature_selection_spark", cpus: str | int | None = None) -> SparkSession:
    """Return (or create) the process-wide SparkSession."""
    cpus = str(cpus or _DEF_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.reuse", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
