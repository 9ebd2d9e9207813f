"""exact_quantiles: bit-identity with Spark's exact ``percentile`` (the
definition it replaces at scale), DuckDB-twin hash parity, and a
hypothesis property sweep over tie-heavy / tiny / degenerate groups.

The operator exists so population-wide quantiles (rfm_segments
breakpoints, mad_anomalies medians, value_quantiles) never build the
per-key value-multiset aggregation buffer — see
operators/quantiles.py's module docstring for the construction.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trend_o_meter_spark.operators.quantiles import (
    exact_quantiles,
    exact_quantiles_sql_ctes,
)

QS = [0.2, 0.4, 0.5, 0.6, 0.8, 0.9, 0.99]


def _check(spark, rows, qs=QS, buckets=16):
    """Assert exact_quantiles == F.percentile (bitwise) == DuckDB twin."""
    df = spark.createDataFrame(rows, "k string, v double")
    mine = {
        (r["k"], r["__qi"]): r["quantile"]
        for r in exact_quantiles(
            df, value="v", keys=("k",), qs=qs, buckets=buckets
        ).collect()
    }
    ref = {}
    for row in (
        df.groupBy("k")
        .agg(*[F.percentile("v", F.lit(q)).alias(f"q{i}") for i, q in enumerate(qs)])
        .collect()
    ):
        for i in range(len(qs)):
            if row[f"q{i}"] is not None:
                ref[(row["k"], i)] = row[f"q{i}"]
    assert mine == ref

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "v"]))
    ctes = exact_quantiles_sql_ctes("t", value="v", keys=("k",), qs=qs, prefix="qq")
    sql_res = {
        (k, qi): v
        for k, qi, v in con.execute(
            f"WITH {ctes} SELECT k, __qi, quantile FROM qq"
        ).fetchall()
    }
    assert sql_res == mine


def test_matches_percentile_and_duckdb_basic(spark):
    rows = (
        [("a", float(v)) for v in [5, 1, 3, 3, 3, 9, -2, 7]]
        + [("b", 4.25)] * 10  # all-equal key: single bucket, frac irrelevant
        + [("c", 1.5)]  # n=1: every quantile is the value itself
        + [("d", None), ("d", 2.0), ("d", 8.0)]  # NULLs excluded like percentile
    )
    _check(spark, rows)


def test_all_null_key_emits_no_row(spark):
    df = spark.createDataFrame([("a", None), ("a", None), ("b", 1.0)], "k string, v double")
    out = exact_quantiles(df, value="v", keys=("k",), qs=[0.5]).collect()
    assert {r["k"] for r in out} == {"b"}


def test_requires_keys_and_qs(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError):
        exact_quantiles(df, value="v", keys=(), qs=[0.5])
    with pytest.raises(ValueError):
        exact_quantiles(df, value="v", keys=("k",), qs=[])


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(
                st.sampled_from([0.0, 1.0, 1.0, 2.5, -3.75]),  # tie mass
                st.floats(
                    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
                ),
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    buckets=st.sampled_from([2, 7, 64]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_property_matches_percentile(spark, rows, buckets):
    _check(spark, [(k, float(v)) for k, v in rows], qs=[0.25, 0.5, 0.75], buckets=buckets)


def test_interarrival_quantiles_planted_gaps(spark, tmp_path):
    """Gaps of a planted irregular series: quantiles computed over the
    n-1 consecutive differences, interpolated per quantile_cont."""
    from trend_o_meter_spark.workload import registry

    # key 'a': gaps 1, 1, 1, 10 (seconds); key 'b': constant gap 5
    offs_a = [0, 1, 2, 3, 13]
    offs_b = [0, 5, 10, 15]
    rows = [(i, float(1_700_000_000 + o), "a") for i, o in enumerate(offs_a)]
    rows += [(100 + i, float(1_700_000_000 + o), "b") for i, o in enumerate(offs_b)]
    df = spark.createDataFrame(rows, "event_id long, epoch double, event_type string")
    import pyspark.sql.functions as F

    pq = tmp_path / "events.parquet"
    df.select(
        "event_id", F.timestamp_seconds("epoch").alias("ts"), "event_type",
        F.lit(1.0).alias("value"), F.lit(0).cast("long").alias("user_id"),
    ).write.parquet(str(pq))
    spec = {s.name: s for s in registry()}["interarrival_quantiles"]
    got = {r["event_type"]: r for r in spec.spark(spark, str(tmp_path)).collect()}

    def qc(vals, q):
        vals = sorted(vals)
        h = (len(vals) - 1) * q
        lo = int(h)
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (h - lo) * (vals[hi] - vals[lo])

    gaps_a = [1.0, 1.0, 1.0, 10.0]
    for nm, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        want = round(qc(gaps_a, q) * 1e9) / 1e9
        assert got["a"][nm] == want, (nm, got["a"][nm], want)
    assert (got["b"]["p50"], got["b"]["p99"]) == (5.0, 5.0)
