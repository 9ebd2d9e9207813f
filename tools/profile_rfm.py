"""Per-phase profiling of the stream_rfm foreachBatch twin (VERDICT r14
item 4).  Drives the per_batch callable directly over 20 one-file
micro-batches (the bench probe's shape) and times each internal phase:
compact / isEmpty / partial+append / state read+merge / rfm score+count.

Usage: python tools/profile_rfm.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_LOCAL_SCRATCH", "1")

from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table as cat_table
from trend_o_meter_spark.session import get_spark, scratch_dir


def main() -> None:
    import tempfile

    from trend_o_meter_spark.operators.analytics import rfm_from_per_user
    from trend_o_meter_spark.streaming.statestore import PartialStateTable

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = 20
    spark = get_spark("profile-rfm", master="local[32]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    batch = cat_table(spark, "events", sf_dir).select(
        "ts", "user_id", "event_type", "value"
    )
    with tempfile.TemporaryDirectory(dir=scratch_dir()) as tmp:
        src = os.path.join(tmp, "src")
        batch.repartition(n_batches).write.mode("overwrite").parquet(src)
        files = sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
        st = PartialStateTable(os.path.join(tmp, "state"))

        def merge(df):
            return df.groupBy("__u").agg(
                F.max("__r_s").alias("__r_s"),
                F.sum("__n").cast("long").alias("__n"),
                F.sum("__md").cast("decimal(38,8)").alias("__md"),
            )

        phases = {k: 0.0 for k in ("isempty", "partial_append", "read_merge_score")}
        t_all = time.time()
        for bid, f in enumerate(files):
            bdf = spark.read.schema(batch.schema).parquet(f)
            t0 = time.time()
            empty = bdf.isEmpty()
            phases["isempty"] += time.time() - t0
            t0 = time.time()
            if not empty:
                partial = (
                    bdf.filter(F.col("event_type") == "purchase")
                    .groupBy(F.col("user_id").alias("__u"))
                    .agg(
                        F.max(F.unix_seconds(F.col("ts"))).alias("__r_s"),
                        F.count(F.lit(1)).cast("long").alias("__n"),
                        F.sum(F.col("value").cast("decimal(28,8)"))
                        .cast("decimal(38,8)")
                        .alias("__md"),
                    )
                )
                st.append(partial, bid)
            phases["partial_append"] += time.time() - t0
            t0 = time.time()
            state = st.read(spark)
            n = rfm_from_per_user(merge(state)).count()
            phases["read_merge_score"] += time.time() - t0
        total = time.time() - t_all
        print(f"total: {total:.2f}s over {n_batches} batches "
              f"({total/n_batches:.3f} s/batch); last report rows: {n}")
        for k, v in phases.items():
            print(f"  {k}: {v:.2f}s ({v/n_batches:.3f} s/batch)")
        print("  state files at end:", st.file_count())


if __name__ == "__main__":
    main()
