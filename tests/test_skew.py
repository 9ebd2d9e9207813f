"""Salted two-phase aggregation equals the direct aggregation."""

from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table
from trend_o_meter_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    ev = table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "event_type", "value"
    )
    direct = {
        tuple(r[:-3]) + (r[-3], round(r[-2], 9), r[-1])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("value").cast("decimal(28,8)")).cast("double").alias("sum_v"),
             F.max("value").alias("max_v"))
        .collect()
    }
    salted = salted_agg(
        ev,
        ["event_type"],
        "event_id",
        {
            "cnt": F.count(F.lit(1)),
            "sum_v": F.sum(F.col("value").cast("decimal(28,8)")),
            "max_v": F.max("value"),
        },
        {
            "cnt": F.sum("cnt"),
            "sum_v": F.sum("sum_v").cast("double"),
            "max_v": F.max("max_v"),
        },
        n_salts=8,
    )
    got = {
        tuple(r[:-3]) + (r[-3], round(r[-2], 9), r[-1]) for r in salted.collect()
    }
    assert got == direct

    # phase-1 must group by (key, salt): two exchanges in the plan
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2
    # the salt survives as a grouping expression on the first exchange
    assert "pmod(xxhash64" in plan


def test_salted_topk_equals_plain_window(spark):
    from trend_o_meter_spark.llm.text import balanced_sample

    # one mega-stratum (90%) + small ones; both paths must agree exactly
    rows = [(i, "mega" if i % 10 else f"s{i % 7}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    plain = sorted(map(tuple, balanced_sample(df, k=25).collect()))
    safe = sorted(map(tuple, balanced_sample(df, k=25, skew_safe=True).collect()))
    assert plain == safe


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from trend_o_meter_spark.operators.skew import salted_join

    # 95% of fact rows share one hot key; dim has one row per key + one
    # key with NO fact rows (exercises left-join nulls)
    fact = spark.createDataFrame(
        [(i, "hot" if i % 20 else f"k{i % 5}", float(i)) for i in range(2000)],
        "row_id long, k string, v double",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k5", 3)], "k string, attr int"
    )
    plain_inner = sorted(map(tuple, fact.join(dim, ["k"], "inner").collect()))
    salted_inner = sorted(
        map(tuple, salted_join(fact, dim, ["k"], salt_on="row_id").collect())
    )
    assert salted_inner == plain_inner

    plain_left = sorted(map(tuple, fact.join(dim, ["k"], "left").collect()))
    salted_left = sorted(
        map(tuple, salted_join(fact, dim, ["k"], salt_on="row_id", how="left").collect())
    )
    assert salted_left == plain_left

    # the hot key must actually spread: all n_salts buckets populated
    n = (
        fact.withColumn("__salt", F.pmod(F.xxhash64("row_id"), F.lit(16)))
        .filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 16

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, ["k"], salt_on="row_id", how="full")
