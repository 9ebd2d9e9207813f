"""Interleaved A/B of stream_near_dup_lsh probe configs (VERDICT r14
item 5): HDFS-backed vs RocksDB state store provider, at the bench
probe's shape (20 one-file micro-batches, fused layout G=4, sp=4).

The provider is a per-query config read at stream start; each pass uses
a fresh checkpoint so the A/B is clean.  Reports per-pass whole-run sec
and marginal docs/s (batches 2..n), interleaved A,B,A,B,...
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
from trend_o_meter_spark.session import get_spark, scratch_dir

ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def main() -> None:
    import tempfile

    from trend_o_meter_spark.streaming.lsh import stream_near_dup_lsh

    n_batches = 20
    n_trials = int(os.environ.get("AB_TRIALS", "3"))
    spark = get_spark("ab-lsh", master="local[32]")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    batch = cat_table(spark, "documents", "/root/testdata/sf0.1").select(
        "doc_id", "text"
    )
    n_rows = batch.count()
    variants = {"hdfs": HDFS, "rocksdb": ROCKS}
    res = {k: {"sec": [], "marg": [], "pairs": []} for k in variants}
    # one untimed cold pass (python workers, state-store init, codegen)
    # per provider, mirroring the bench probe's untimed warm pass
    for provider in variants.values():
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        with tempfile.TemporaryDirectory(dir=scratch_dir()) as tmp:
            src = os.path.join(tmp, "src")
            batch.limit(500).repartition(4).write.mode("overwrite").parquet(src)
            stream = (
                spark.readStream.schema(batch.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            pairs = stream_near_dup_lsh(stream, state_groups=4, fuse_signatures=True)
            q = (
                pairs.writeStream.format("noop")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    for t in range(n_trials):
        for name, provider in variants.items():
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
            with tempfile.TemporaryDirectory(dir=scratch_dir()) as tmp:
                src = os.path.join(tmp, "src")
                batch.repartition(n_batches).write.mode("overwrite").parquet(src)
                stream = (
                    spark.readStream.schema(batch.schema)
                    .option("maxFilesPerTrigger", "1")
                    .parquet(src)
                )
                pairs = stream_near_dup_lsh(
                    stream, state_groups=4, fuse_signatures=True
                )
                t0 = time.time()
                q = (
                    pairs.writeStream.format("noop")
                    .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                sec = round(time.time() - t0, 3)
                progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
                res[name]["sec"].append(sec)
                if len(progress) > 1:
                    tail = progress[1:]
                    tr = sum(p["numInputRows"] for p in tail)
                    ts = sum(p["durationMs"]["triggerExecution"] for p in tail) / 1e3
                    if ts > 0:
                        res[name]["marg"].append(round(tr / ts))
                res[name]["pairs"].append(
                    sum(p.get("sink", {}).get("numOutputRows", 0) for p in progress)
                )
    for name, r in res.items():
        print(
            f"{name:8s} sec_median {statistics.median(r['sec']):7.3f} secs {r['sec']} "
            f"marg_median {statistics.median(r['marg']) if r['marg'] else '-'} margs {r['marg']} "
            f"pairs {r['pairs']}"
        )


if __name__ == "__main__":
    main()
