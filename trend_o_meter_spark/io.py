"""Table IO: the lakehouse layout layer (SURVEY §1.4 catalog + S1/S2).

The reference's only store is Redis (list + pub/sub); its "catalog" is a
key-naming convention (SURVEY §1.4).  The Spark build treats storage as
first-class: explicit-schema readers for the wire formats (never infer on
a production path), and a date-partitioned parquet layout for event
tables so time-range queries prune partitions at the file-listing level —
at 100 TB the difference between scanning a day and scanning a decade.

``write_daily_partitioned`` / ``read_daily_partitioned`` pin the layout
contract: a derived ``ds`` (yyyy-MM-dd, UTC) partition column, payload
columns untouched.  ``read_csv``/``read_json`` are schema-explicit
ingest paths with PERMISSIVE corrupt-row capture (the Spark-native form
of the reference's catch-and-log at trend-o-meter:440-443).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def write_daily_partitioned(
    df: DataFrame,
    path: str,
    *,
    ts: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by UTC day of ``ts``.

    Partition count = distinct days — coarse enough that smallish SFs
    don't fragment into tiny files, fine enough that day-range predicates
    prune.  (Sub-daily or hash sub-bucketing is a layout parameter a real
    deployment would add per table volume.)
    """
    out = df.withColumn("ds", F.date_format(F.col(ts), "yyyy-MM-dd"))
    out.write.partitionBy("ds").mode(mode).parquet(path)


def read_daily_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the daily layout back; filters on ``ds`` prune partitions
    (verify with .explain: PartitionFilters, not PushedFilters)."""
    return spark.read.parquet(path)


def compact_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    roughly ``target_file_bytes`` each, preserving rows exactly.

    Streaming sinks and incremental appends fragment tables into
    per-micro-batch files; at 100 TB a 10 k-file day costs more in
    file-listing and task-scheduling overhead than in actual I/O.  File
    count is computed from the CURRENT on-disk byte size (not row
    count), so compaction adapts to the table's real density.  With
    ``partition_col`` the rewrite repartitions by (partition column,
    content-derived salt) so each partition directory compacts to
    roughly target-sized files instead of one potentially-huge file per
    value — the salt range is sized from the AVERAGE bytes per
    partition value (a heavily skewed partition can still exceed the
    target; per-partition byte stats would be the next refinement).

    The swap is two renames (write to ``<path>.__compact__``, displace
    the original to ``<path>.__old__``, promote).  A crash between them
    is healed by :func:`recover_table` — run automatically at the start
    of this function; long-lived readers should call it after a crash
    before reading.  Returns the number of output files requested.
    """
    import math
    import shutil
    from pathlib import Path

    recover_table(path)
    src = Path(path)
    total = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp_p = src.with_name(src.name + ".__compact__")
    if tmp_p.exists():
        shutil.rmtree(str(tmp_p))
    tmp = str(tmp_p)
    if partition_col is not None:
        n_parts = df.select(partition_col).distinct().count()
        files_per_part = max(1, math.ceil(n_files / max(1, n_parts)))
        salt = F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(files_per_part)
        )
        (
            df.repartition(n_files, F.col(partition_col), salt)
            .write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = str(src.with_name(src.name + ".__old__"))
    shutil.move(str(src), old)
    shutil.move(tmp, str(src))
    shutil.rmtree(old)
    return n_files


def recover_table(path: str) -> None:
    """Heal a table whose compaction swap crashed between its two
    renames (see :func:`compact_table`): if the canonical path is
    missing, promote a COMPLETE rewrite (``.__compact__`` carrying
    Spark's ``_SUCCESS``) or else restore the displaced original
    (``.__old__``); sweep leftovers once the canonical path exists."""
    import shutil
    from pathlib import Path

    src = Path(path)
    old = src.with_name(src.name + ".__old__")
    tmp = src.with_name(src.name + ".__compact__")
    if not src.exists():
        if tmp.exists() and (tmp / "_SUCCESS").exists():
            shutil.move(str(tmp), str(src))
        elif old.exists():
            shutil.move(str(old), str(src))
    for leftover in (old, tmp):
        if src.exists() and leftover.exists():
            shutil.rmtree(str(leftover), ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Bucketing pre-shuffles the data ONCE at write time: every later join
    or aggregation keyed on ``bucket_col`` between tables sharing the
    bucket spec runs with NO exchange (and with ``sort_col``, no sort) —
    at 100 TB this turns the nightly fact-fact join from the dominant
    shuffle into a zip of co-located files.  Requires ``saveAsTable``
    (bucket metadata lives in the catalog, not the parquet footer).
    """
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode(mode).format("parquet").saveAsTable(table_name)


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    salt: str = "epoch-0",
    n_shards: int = 8,
    mode: str = "overwrite",
) -> int:
    """Materialize a training epoch: deterministic shuffled order cut
    into ``n_shards`` contiguous-position shards (parquet, one
    ``shard=<s>`` partition directory each).

    Reading shards in order and rows by ``position`` within each shard
    reconstructs the exact global :func:`llm.text.epoch_shuffle` order —
    change ``salt`` per epoch for a fresh reproducible permutation.
    Shard = ``floor(position * n_shards / N)`` (sizes differ by at most
    one) — an explicit value, NOT ``repartitionByRange``, whose sampled
    boundaries are not reproducible across runs.

    Scale: epoch_shuffle's bucketed rank (no global sort) + one
    id-keyed join + one shard-keyed shuffle; the only driver-side value
    is the row count N (an O(1)-result job any fixed-count sharder
    needs).  Returns N.
    """
    from .llm.text import epoch_shuffle

    n = df.count()
    if n == 0:
        return 0
    pos = epoch_shuffle(df, id_col=id_col, salt=salt)
    shard = F.least(
        F.lit(n_shards - 1), (F.col("position") * n_shards / F.lit(n)).cast("long")
    )
    out = df.join(pos, id_col).withColumn("shard", shard)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "position")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
    return n


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-explicit JSON-lines ingest; malformed rows land in
    ``_corrupt_record`` instead of being dropped or poisoning inference."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: StructType, *, header: bool = True
) -> DataFrame:
    """Schema-explicit CSV ingest with corrupt-row capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def zorder_code(
    df: DataFrame, cols: "tuple[str, ...]", *, bits: int = 12
) -> DataFrame:
    """Append a Morton (Z-order) code column ``__z`` interleaving the
    bits of rank-scaled ``cols`` (Morton 1966; the curve behind Delta's
    OPTIMIZE ZORDER and Databricks/Iceberg Z-ordering).

    Each column maps to a ``bits``-bit code by min/max scaling (the
    anchors are a 1-row broadcast — the anchor pattern), then the codes
    interleave bit-by-bit so nearby Z values are nearby in EVERY listed
    dimension at once.  Constant columns code to 0.
    """
    dtypes = dict(df.dtypes)
    # timestamps order by epoch micros (timestamp - timestamp would be an
    # interval, which the scaling math can't use)
    ord_of = {
        c: (F.unix_micros(F.col(c)) if dtypes[c].startswith("timestamp") else F.col(c))
        for c in cols
    }
    aggs = []
    for c in cols:
        aggs += [F.min(ord_of[c]).alias(f"__min_{c}"), F.max(ord_of[c]).alias(f"__max_{c}")]
    anchor = F.broadcast(df.agg(*aggs))
    out = df.crossJoin(anchor)
    scale = (1 << bits) - 1
    codes = []
    for c in cols:
        rng = (F.col(f"__max_{c}") - F.col(f"__min_{c}")).cast("double")
        norm = (
            F.when(rng > 0, (ord_of[c] - F.col(f"__min_{c}")).cast("double") / rng)
            .otherwise(F.lit(0.0))
        )
        codes.append(
            F.least(F.floor(norm * F.lit(float(scale))).cast("long"), F.lit(scale))
        )
    k = len(cols)
    morton = F.lit(0).cast("long")
    for i in range(bits):
        for j, code in enumerate(codes):
            morton = morton + F.shiftleft(
                F.shiftright(code, i).bitwiseAND(F.lit(1)), i * k + j
            )
    drop = [f"__min_{c}" for c in cols] + [f"__max_{c}" for c in cols]
    return out.withColumn("__z", morton).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    cols: "tuple[str, ...]",
    bits: int = 12,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``cols``: range-partition by the Morton code, sort within partitions,
    drop the helper column.

    Why at 100 TB: parquet row-group min/max stats prune scans only when
    values CLUSTER within files.  A linear sort clusters one column and
    leaves the others full-range per file; the Z layout gives every
    listed column a ~``n_files^(1/k)``-fold narrower per-file range, so
    selective filters on ANY of them skip most of the table
    (evidence-tested against the linear layout via parquet footer
    stats in ``tests/test_io.py``).
    """
    z = zorder_code(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
