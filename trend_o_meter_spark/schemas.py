"""Explicit StructType schemas (SURVEY §1).

The reference has no schema machinery — ``JSON.parse`` is the whole
decoder (trend-o-meter:290,385).  Streaming sources must not infer, so
every wire format gets an explicit schema here; malformed messages land in
``_corrupt_record`` (PERMISSIVE) instead of the reference's catch-and-log
(trend-o-meter:440-443).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The pub/sub sensor message envelope: {ts, source, value: {metric: num}}
# (trend-o-meter:385-410; ts is epoch seconds on the wire).
SENSOR_MESSAGE = StructType(
    [
        StructField("ts", DoubleType(), False),  # epoch seconds (may be fractional)
        StructField("source", StringType(), True),
        StructField("value", MapType(StringType(), DoubleType()), True),
    ]
)

# Canonical long-format reading (SURVEY §7.0): one row per (metric, sample).
READING = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("source", StringType(), True),
        StructField("metric", StringType(), False),
        StructField("value", DoubleType(), True),
    ]
)

# Historical list element: JSON array [ts, value] (trend-o-meter:289-290).
HISTORY_TUPLE = "array<double>"

# Firehose element for rate metrics: only (ts, channel, byte length) is
# consumed (trend-o-meter:488-526).
BUS_MESSAGE = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("channel", StringType(), True),
        StructField("payload", StringType(), True),
    ]
)

# C2 audit-log parquet table (control plane): epoch-seconds ts + typed
# valid flag; ret_val/error serialized JSON/text (trend-o-meter:253-262).
AUDIT_LOG_SCHEMA = StructType(
    [
        StructField("ts", DoubleType(), False),
        StructField("valid", BooleanType(), False),
        StructField("message", StringType(), True),
        StructField("ret_val", StringType(), True),
        StructField("error", StringType(), True),
    ]
)

# C2 command-log record (trend-o-meter:253-262).
# The C2 audit-log record (reference's cmdlog list) is defined ONCE, in
# control/plane.py as AUDIT_LOG_SCHEMA — the schema actually written to
# and read from parquet.  (An earlier duplicate here had silently
# diverged on ts/valid/retVal typing; one source of truth only.)
