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
