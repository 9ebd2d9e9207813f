"""Streaming sources (reference S3/S4, trend-o-meter:382,446-450,528).

The reference subscribes to Redis pub/sub channels; the Spark equivalents
are any ``readStream`` source carrying a JSON payload column (Kafka value,
file stream, socket).  ``decode_sensor_stream`` is the transport-agnostic
envelope decoder: give it any streaming (or batch — same expressions)
DataFrame with a string column and it produces the canonical long-format
reading rows.  ``rate_sensor_stream`` synthesizes a deterministic sensor
stream from the built-in rate source for tests and demos (no broker in
the test environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SENSOR_MESSAGE


def decode_sensor_stream(
    df: DataFrame,
    *,
    payload_col: str = "value",
    primary_source: str | None = None,
) -> DataFrame:
    """JSON envelope -> long-format readings (S2 decode + P1 projection + F1).

    Output: ``ts TIMESTAMP, source STRING, metric STRING, value DOUBLE,
    corrupt STRING`` — malformed JSON rows survive with ``corrupt`` set
    (the Spark-native replacement for the reference's catch-and-log at
    trend-o-meter:440-443; downstream filters them out or quarantines).

    ``primary_source``: if set, apply the reference's source-equality
    filter (F1, trend-o-meter:408) after decode.
    """
    parsed = df.withColumn("__msg", F.from_json(F.col(payload_col).cast("string"), SENSOR_MESSAGE))
    # Spark's PERMISSIVE from_json yields an all-null struct (not a null
    # struct) for malformed input; a usable envelope must carry ts, so a
    # null __msg.ts marks the row corrupt.
    bad = F.col("__msg").isNull() | F.col("__msg.ts").isNull()
    out = (
        parsed.select(
            F.timestamp_seconds(F.col("__msg.ts")).alias("ts"),
            F.col("__msg.source").alias("source"),
            F.explode_outer(F.col("__msg.value")).alias("metric", "value"),
            F.when(bad, F.col(payload_col).cast("string")).alias("corrupt"),
        )
    )
    if primary_source is not None:
        out = out.filter((F.col("source") == F.lit(primary_source)) | F.col("corrupt").isNotNull())
    return out


def rate_sensor_stream(
    spark: SparkSession,
    *,
    rows_per_second: int = 100,
    n_sources: int = 3,
    metrics: tuple[str, ...] = ("temperature", "humidity", "pressure", "mc_2p5"),
) -> DataFrame:
    """Deterministic synthetic sensor stream from the rate source.

    Each rate tick becomes one JSON sensor message (the §1.1 envelope) so
    the whole decode path is exercised end-to-end without a broker.
    """
    metric_map = ", ".join(
        f"'{m}', round(50 + 40 * sin(value / {7 + i}.0), 3)" for i, m in enumerate(metrics)
    )
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.to_json(
                F.struct(
                    F.unix_timestamp("timestamp").cast("double").alias("ts"),
                    F.concat(F.lit("sensor-"), (F.col("value") % n_sources).cast("string")).alias(
                        "source"
                    ),
                    F.expr(f"map({metric_map})").alias("value"),
                )
            ).alias("value")
        )
    )
