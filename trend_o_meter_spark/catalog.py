"""Logical table name -> storage mapping (SURVEY §1.4).

The reference's "catalog" is Redis key shapes (`${sensor}:${metric}:.list`
etc., reference trend-o-meter:289,167-169); here the catalog maps logical
names to parquet paths under a scale-factor directory.  All reads go
through :func:`table` so predicate pushdown / column pruning apply at the
parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

# The driver-provided star schema + stream tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Timestamp columns per table.  The driver's parquet files carry
# TIMESTAMP(NANOS) annotations (pandas datetime64[ns] writer), which Spark's
# vectorized reader rejects; we read them as raw int64 nanos
# (spark.sql.legacy.parquet.nanosAsLong) and truncate to micros — exactly
# what DuckDB does when it coerces TIMESTAMP_NS to its micro TIMESTAMP, so
# both engines see identical values.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# --- source-adapter seam ----------------------------------------------------
#
# The reference's real I/O is Redis lists + pub/sub (trend-o-meter:289,
# 446,165-169); this sandbox substitutes parquet snapshots.  A deployment
# with a live broker registers a reader here — operators never name a
# storage system, they call table(), so swapping the backing store is a
# registration, not a rewrite.  A reader is ``(spark, name, sf_dir) ->
# DataFrame`` and must deliver the TESTDATA.md schema for ``name``
# (timestamps already micro-precision TIMESTAMP, session tz UTC).
_SOURCE_READERS: dict[str, object] = {}


def register_source(name: str, reader) -> None:
    """Route ``table(spark, name, ...)`` through a custom reader (e.g. a
    Redis/Kafka adapter).  Pass ``None`` to restore the parquet default."""
    if reader is None:
        _SOURCE_READERS.pop(name, None)
    else:
        _SOURCE_READERS[name] = reader


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load a logical table; the single entry point for batch scans (S1)."""
    tune(spark)
    # default resolved BEFORE the adapter dispatch, so a registered
    # reader sees the same sf_dir the parquet fallback would have
    sf_dir = sf_dir or DEFAULT_SF_DIR
    reader = _SOURCE_READERS.get(name)
    if reader is not None:
        return reader(spark, name, sf_dir)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":  # ns-as-long -> micros timestamp
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            # session tz is pinned to UTC, so NTZ -> TIMESTAMP is value-preserving
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan to one task per core before CPU-heavy map work.

    Byte-based split planning undercounts CPU cost: a few-MB single-row-
    group parquet file is one split, so interpreted higher-order functions
    (shingling, minhash folds, cosine dot products) run on one core.  This
    round-robin repartitions ONLY when the plan has fewer partitions than
    ``defaultParallelism`` — at 100 TB every scan already has thousands of
    splits, so this is a no-op there (no extra shuffle at scale; the
    shuffle it does add on small inputs is bounded by the input size).
    """
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # df.rdd forces a plan->RDD conversion (Catalyst planning for this
    # frame runs here, once per spread() call) just to read the
    # partition count.  Cheap at call time and the resulting RDD is
    # discarded — the returned frame plans independently — but callers
    # in tight loops should hoist the spread() out of the loop.
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name in TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
