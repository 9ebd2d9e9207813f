"""Interleaved A/B of stream_rfm re-score variants (VERDICT r14 item 4).

Builds the 20-batch state table once, then times the per-batch
read+merge+score leg under each variant, interleaved (V0,V1,...,V0,...)
so ambient bursts hit every variant equally.

Variants:
  v0  current library path (mergeSchema read, cut counts, sp=8)
  v1  explicit-schema read (skip per-batch mergeSchema footer job)
  v2  v1 + no-cut counts inside the quantile leg (re-derive per branch)
  v3  v1 + shuffle.partitions=4
  v4  v1 + shuffle.partitions=16
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_LOCAL_SCRATCH", "1")

from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table as cat_table
from trend_o_meter_spark.lineage import cut
from trend_o_meter_spark.session import get_spark, scratch_dir


def merge(df):
    return df.groupBy("__u").agg(
        F.max("__r_s").alias("__r_s"),
        F.sum("__n").cast("long").alias("__n"),
        F.sum("__md").cast("decimal(38,8)").alias("__md"),
    )


def rfm_score(per_user, *, cut_counts: bool):
    """rfm_from_per_user with an optional no-cut counts leg."""
    from trend_o_meter_spark.operators.quantiles import (
        exact_quantiles_from_counts,
    )

    per_user = per_user.select(
        "__u",
        F.col("__r_s").cast("double").alias("__r"),
        F.col("__n").cast("double").alias("__f"),
        F.col("__md").cast("double").alias("__m"),
    )
    per_user = cut(per_user)
    qs = [0.2, 0.4, 0.6, 0.8]
    melt = per_user.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("__dim"), F.col(f"__{d}").alias("__v"))
                    for d in ("r", "f", "m")
                ]
            )
        ).alias("__e")
    ).select("__e.__dim", "__e.__v")
    counts = (
        melt.select("__dim", F.col("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__dim", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    if cut_counts:
        counts = cut(counts)
    bq = exact_quantiles_from_counts(counts, keys=("__dim",), qs=qs)
    breaks = bq.groupBy().agg(
        *[
            F.max(
                F.when((F.col("__dim") == d) & (F.col("__qi") == i), F.col("quantile"))
            ).alias(f"__{d}{i}")
            for d in ("r", "f", "m")
            for i in range(4)
        ]
    )

    def score(d):
        c = F.lit(1)
        for i in range(4):
            c = c + F.when(F.col(f"__{d}") > F.col(f"__{d}{i}"), 1).otherwise(0)
        return c.cast("string")

    scored = per_user.crossJoin(F.broadcast(breaks)).select(
        F.concat(score("r"), score("f"), score("m")).alias("rfm")
    )
    return scored.groupBy("rfm").agg(F.count(F.lit(1)).alias("n_users"))


def main() -> None:
    import tempfile

    from trend_o_meter_spark.streaming.statestore import PartialStateTable

    sf_dir = "/root/testdata/sf0.1"
    n_batches = 20
    n_trials = int(os.environ.get("AB_TRIALS", "4"))
    spark = get_spark("ab-rfm", master="local[32]")
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
        for bid, f in enumerate(files):
            bdf = spark.read.schema(batch.schema).parquet(f)
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
        state_schema = st.read(spark).schema  # post-drop(__batch_id) schema

        def read_v0():
            return st.read(spark)

        def read_v1():
            raw = spark.read.schema(
                st.read(spark).schema  # placeholder, replaced below
            )

        # explicit-schema read: same keep-filter as PartialStateTable.read
        full_schema = spark.read.option("mergeSchema", "true").parquet(st.path).schema

        def read_explicit():
            raw = spark.read.schema(full_schema).parquet(st.path)
            bid = F.col("__batch_id").cast("long")
            keep = (bid == -1) | (bid == -2) | (bid > -1)
            return raw.filter(keep).drop("__batch_id")

        variants = {
            "v0_current": (read_v0, True, 8),
            "v1_schema": (read_explicit, True, 8),
            "v2_schema_nocut": (read_explicit, False, 8),
            "v3_schema_sp4": (read_explicit, True, 4),
            "v4_schema_sp16": (read_explicit, True, 16),
        }
        results = {k: [] for k in variants}
        segs = {}
        for t in range(n_trials):
            for name, (reader, cc, sp) in variants.items():
                spark.conf.set("spark.sql.shuffle.partitions", str(sp))
                spark._jvm.System.gc()
                t0 = time.time()
                rep = rfm_score(merge(reader()), cut_counts=cc)
                n = rep.count()
                results[name].append(round(time.time() - t0, 3))
                segs[name] = n
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        for name, ts in results.items():
            print(f"{name:18s} median {statistics.median(ts):6.3f}  runs {ts}  segments {segs[name]}")


if __name__ == "__main__":
    main()
