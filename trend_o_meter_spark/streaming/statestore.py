"""Idempotent, compactable parquet state tables for foreachBatch pipelines.

The micro-batch pipelines in :mod:`.pipeline` keep their durable state
(downsampled history, partial trend counts, partial CMS grids, partial
HLL sketches) in a parquet table that each micro-batch appends to.  Two
failure modes of the naive ``mode("append")`` write:

1. **Replay double-counting.** ``foreachBatch`` is AT-LEAST-ONCE: after
   a crash between the state write and the checkpoint commit, the same
   micro-batch (same ``batch_id``, same source offsets) re-runs and a
   blind append lands its rows twice.  Register-max sketches (HLL)
   shrug that off; additive state (CMS grids, trend counts, history
   rows) double-counts and the "streaming result EQUALS batch result"
   contract breaks.
2. **Unbounded growth.** One small file per batch means per-batch read
   cost grows O(#batches) in file-listing and task scheduling even when
   the live row volume is tiny.

:class:`PartialStateTable` fixes both with one mechanism — the table is
partitioned by ``__batch_id``:

* ``append(df, batch_id)`` is a DYNAMIC-partition overwrite of exactly
  the ``__batch_id=<id>`` directory: a replayed batch overwrites its own
  previous attempt instead of appending next to it (idempotent for any
  deterministic batch content, and at-least-once-safe regardless — the
  read side filters superseded partitions, below).
* ``compact(spark, batch_id, transform=...)`` folds every live
  partition into the base partition (``__batch_id=-1``), optionally
  applying a retention ``transform`` so culled rows leave disk, and
  records the highest batch id folded in (the *watermark*) in a
  ``_compacted_through`` marker file.  ``read`` keeps only the base and
  partitions ABOVE the watermark, so a batch replayed from before the
  compaction point writes a partition that is simply ignored — never
  double-counted with its copy inside the base.
* the rewrite goes to a sibling temp dir and is atomically renamed over
  the table (the marker travels inside it), so readers never see a
  half-compacted state — same discipline as :func:`..io.compact_table`.

Call ``compact`` at the TOP of the ``foreachBatch`` body (before the
current batch's append): on replay the previous attempt's partition is
folded in with the watermark advanced over it, and the re-append is
filtered out on read.

Local/HDFS filesystem semantics (atomic directory rename) are assumed,
matching the rest of the repo's sink utilities; on object stores use a
table format (Delta/Iceberg) whose commit protocol provides the same
property.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

BASE_PARTITION = -1  # __batch_id value of the compacted base
_MARKER = "_compacted_through"  # underscore-prefixed: invisible to parquet scans


class PartialStateTable:
    """A parquet table of per-micro-batch partial state (see module doc)."""

    def __init__(self, path: str):
        self.path = str(path)

    # -- marker --------------------------------------------------------

    def _watermark(self) -> int:
        """Highest batch id already folded into the base partition."""
        marker = Path(self.path) / _MARKER
        try:
            return int(marker.read_text().strip())
        except (FileNotFoundError, ValueError):
            return BASE_PARTITION

    # -- writes --------------------------------------------------------

    def append(self, df: DataFrame, batch_id: int) -> None:
        """Idempotently write one batch's partial rows (replay-safe:
        overwrites only this batch's own partition)."""
        (
            df.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(self.path)
        )

    def seed(self, df: DataFrame) -> None:
        """Write (or replace) the base partition directly — the backfill
        half of the lambda shape, before any micro-batch runs."""
        self.append(df, BASE_PARTITION)

    # -- reads ---------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Current live state: base + partitions above the compaction
        watermark (superseded replay partitions excluded).  ``None``
        until the first write creates the table."""
        try:
            raw = spark.read.parquet(self.path)
        except AnalysisException:
            return None
        wm = self._watermark()
        bid = F.col("__batch_id").cast("long")
        return raw.filter((bid == BASE_PARTITION) | (bid > wm)).drop("__batch_id")

    # -- compaction ----------------------------------------------------

    def compact(self, spark: SparkSession, *, transform=None) -> bool:
        """Fold all live partitions into the base; advance the watermark
        to the highest batch id folded in.  ``transform`` (DataFrame ->
        DataFrame, e.g. a retention cull) is applied to the merged state
        so expired rows leave disk.  Atomic swap; returns False if the
        table doesn't exist yet."""
        import shutil

        try:
            raw = spark.read.parquet(self.path)
        except AnalysisException:
            return False
        wm = self._watermark()
        bid = F.col("__batch_id").cast("long")
        live = raw.filter((bid == BASE_PARTITION) | (bid > wm))
        new_wm = (
            live.agg(F.max(bid).alias("m")).collect()[0]["m"]
        )
        new_wm = max(int(new_wm if new_wm is not None else BASE_PARTITION), wm)
        merged = live.drop("__batch_id")
        if transform is not None:
            merged = transform(merged)
        src = Path(self.path)
        # output file count from the CURRENT on-disk byte size (the
        # io.compact_table discipline) — state tables are bounded-row by
        # design, but "bounded" for a million-metric history is still GBs
        import math

        total = sum(f.stat().st_size for f in src.rglob("*.parquet"))
        n_files = max(1, math.ceil(total / (128 * 1024 * 1024)))
        tmp = src.with_name(src.name + ".__compact__")
        (
            merged.withColumn("__batch_id", F.lit(BASE_PARTITION))
            .repartition(n_files)
            .write.mode("overwrite")
            .partitionBy("__batch_id")
            .parquet(str(tmp))
        )
        (tmp / _MARKER).write_text(str(new_wm))
        old = src.with_name(src.name + ".__old__")
        shutil.move(str(src), str(old))
        shutil.move(str(tmp), str(src))
        shutil.rmtree(str(old))
        return True

    # -- observability -------------------------------------------------

    def file_count(self) -> int:
        """Data files currently on disk (growth-boundedness probe)."""
        return sum(1 for _ in Path(self.path).rglob("*.parquet"))
