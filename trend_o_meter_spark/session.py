"""SparkSession construction and runtime tuning.

The engine is designed for a 1000-executor cluster reading ~100 TB; the
defaults here encode that stance (AQE on, skew-join handling, partition
coalescing) while remaining correct on ``local[*]`` test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf that must be set at session BUILD time — only JVM sizing truly
# is (everything else runtime-settable lives in RUNTIME_CONF below so
# tune() can apply it to sessions we did not build).
BUILD_CONF: dict[str, str] = {
    # In local mode the driver JVM IS the executor; Spark's 1g default
    # starves 32 concurrent tasks (GC stalls at bench scale, OOM in the
    # 16x scaling probes).  Only takes effect when get_spark launches the
    # JVM itself — a driver-owned session keeps its own sizing.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}

# Conf that is runtime-settable: applied by tune() even on a SparkSession
# we did not build (the driver hands us its own session — without these
# here it would run the suite at shuffle.partitions=200 with arrow off;
# bench.py itself proves shuffle partitions flip at runtime).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local[32] single-JVM testing default; a real cluster would size this
    # to ~2-3x total cores via spark-submit conf.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # All timeseries arithmetic (epoch conversions, day-bin edges) assumes
    # UTC so results match the DuckDB oracle bit-for-bit.
    "spark.sql.session.timeZone": "UTC",
    # Deterministic timestamp parsing.
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
}


def get_spark(app_name: str = "trend-o-meter-spark", master: str | None = None) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    for k, v in BUILD_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune(spark)
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf; safe on externally-built sessions."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build; build-time default applies
    return spark
