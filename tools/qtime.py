"""Isolate one (or a few) registry queries: noop-sink timing + plan dump.

    python tools/qtime.py name [name ...]           # time at $SPARK_GRAFT_SF_DIR
    SPARK_GRAFT_QTIME_RUNS=5 python tools/qtime.py name
    SPARK_GRAFT_QTIME_PLAN=plans/r13 python tools/qtime.py name   # also write <name>_before/after.txt

Methodology mirrors bench.py (guide §1.4): one untimed warm pass of
q1_pricing_summary, then N timed passes per query with the noop sink,
median reported.  Plans are ``.explain("formatted")`` of the exact frame
the bench would write.  SPARK_GRAFT_QTIME_SUFFIX chooses the plan-file
suffix (default "before").
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measurement parity with bench.py: tmpfs scratch is opt-in since r14
os.environ.setdefault("SPARK_GRAFT_LOCAL_SCRATCH", "1")

from trend_o_meter_spark.session import get_spark
from trend_o_meter_spark.workload import registry


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("SPARK_GRAFT_QTIME_RUNS", "3"))
    plan_dir = os.environ.get("SPARK_GRAFT_QTIME_PLAN")
    suffix = os.environ.get("SPARK_GRAFT_QTIME_SUFFIX", "before")

    spark = get_spark("qtime", master=f"local[{cpus}]")
    specs = {s.name: s for s in registry()}
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warm JVM + parquet footers (same as bench.py)
    specs["q1_pricing_summary"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, object] = {}
    for name in names:
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            frame = specs[name].spark(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(frame._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        ts = []
        for _ in range(n_runs):
            # ContextCleaner only frees localCheckpoint RDD blocks and
            # stale broadcasts after a JVM GC notices the dead refs;
            # without this, back-to-back runs accumulate block-manager
            # state and later runs measure GC pressure, not the query
            # (observed: decontaminate_spans 7.5 -> 16.4 s over 5 runs).
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            specs[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"median": statistics.median(ts), "runs": ts} if ts else "plan-only"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
