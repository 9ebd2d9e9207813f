"""Skew stress probe: salted operators vs their unsalted forms on a
degenerate key distribution (one key owns ~90% of all rows by
default — `hot_tenths`/10; the earlier 50% setting sat under AQE's skew
threshold and the sort-merge pain point, so all variants tied).

The 16x scaling probe (BASELINE.md) covers volume; this probe covers the
orthogonal failure mode — a HOT KEY pinning one reducer.  Input is the
lineitem table replicated ``reps``x (deterministic explode, no synthetic
value distributions), with a derived key where an xxhash64 residue
sends the hot share to key 0 and sprays the rest over ``n_cold`` cold
keys.
The skewed input is materialized to parquet once so every timed variant
reads identical bytes.

Probed (timed end-to-end through the noop sink, median of 3):

* per-key top-k — plain window vs ``salted_topk``.  MEASURED FINDING
  (BASELINE.md round-4 table): Spark >= 3.5 plans ``row_number() <= k``
  as a Partial+Final ``WindowGroupLimit`` — a map-side per-key top-k
  that collapses the hot key to <= k rows per map task BEFORE the
  shuffle, so the plain form is already skew-safe and the salted form
  just pays a second shuffle.  ``salted_topk`` remains the escape hatch
  only where the group-limit rewrite does not fire (non-rank window
  functions, engines without the rule); both variants stay probed so
  the artifact keeps proving which plan wins on this Spark version.
* fact-dim equi-join, broadcast disabled (the 100 TB case where the dim
  exceeds the broadcast budget) — sort-merge with AQE skew-join ON
  (Spark's own runtime mitigation), sort-merge with it OFF (the
  "stats missed the skew / partition pinned" case the salted form is the
  escape hatch for, per operators/skew.py:66), and ``salted_join``.
  The hot share defaults to ~90% so the hot partition clears AQE's
  skewedPartitionThresholdInBytes (256 MB default) — below it AQE
  rightly declines to split and all three variants tie.

Prints one JSON line; recorded in BASELINE.md.

Usage: python tools/skew_probe.py [sf_dir] [reps] [hot_tenths]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table as cat_table
from trend_o_meter_spark.operators.skew import salted_join, salted_topk
from trend_o_meter_spark.session import get_spark

N_COLD = 20_000
K = 10
N_SALTS = 16


def _median3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(sorted(ts)[1], 3)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    hot_tenths = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    spark = get_spark("skew-probe", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")

    li = cat_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    rid = F.xxhash64("l_orderkey", "l_linenumber", "rep")
    skewed = (
        li.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(reps))))
        .withColumn(
            "k",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "rep"), F.lit(10)) < hot_tenths, F.lit(0)
            ).otherwise(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "rep"), F.lit(N_COLD)) + 1
            ),
        )
        .withColumn("rid", rid)
        .select("k", "rid", F.col("l_extendedprice").alias("v"))
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "skewed")
        skewed.write.mode("overwrite").parquet(src)
        fact = spark.read.parquet(src)
        n_rows = fact.count()
        hot_share = fact.filter(F.col("k") == 0).count() / n_rows

        dim = (
            spark.range(N_COLD + 1)
            .select(F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("attr"))
        )
        dim_src = os.path.join(tmp, "dim")
        dim.write.mode("overwrite").parquet(dim_src)
        dim = spark.read.parquet(dim_src)

        from pyspark.sql import Window

        def topk_plain():
            w = Window.partitionBy("k").orderBy(F.desc("v"), "rid")
            _noop(fact.withColumn("__rank", F.row_number().over(w)).filter(F.col("__rank") <= K))

        def topk_salted():
            _noop(
                salted_topk(
                    fact, ["k"], [F.desc("v"), F.asc("rid")], k=K, salt_on="rid", n_salts=N_SALTS
                )
            )

        def join_run(skew_join: bool, salted: bool):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
            try:
                if salted:
                    _noop(salted_join(fact, dim, ["k"], salt_on="rid", n_salts=N_SALTS))
                else:
                    _noop(fact.join(dim, on="k", how="inner"))
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")

        out = {
            "probe": "skew_degenerate_key",
            "sf_dir": sf_dir,
            "reps": reps,
            "rows": n_rows,
            "hot_key_share": round(hot_share, 4),
            "n_cold_keys": N_COLD,
            "n_salts": N_SALTS,
            "topk_plain_sec": _median3(topk_plain),
            "topk_salted_sec": _median3(topk_salted),
            "join_smj_aqe_skew_sec": _median3(lambda: join_run(True, False)),
            "join_smj_no_skew_handling_sec": _median3(lambda: join_run(False, False)),
            "join_salted_sec": _median3(lambda: join_run(False, True)),
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
