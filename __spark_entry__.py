"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``trend_o_meter_spark/workload.py``; this file
just re-exports it in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trend_o_meter_spark.workload import flagship_day_bins, registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A3 day-binned extremes over downsampled events) at sf0.001."""
    return flagship_day_bins(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark for spec in registry()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in registry() if spec.oracle is not None}
