"""Golden tests for the flagship day-binned extremes (A3).

Hand-computed expectations pin the quirky semantics: disjoint consecutive
bins (NOT cumulative trailing windows), per-metric max-ts anchor, strict->
completeness on ceil(span_hours), inclusive bin edges (age <= bin days),
and the deterministic struct-ordering tie-break (reference
trend-o-meter:11-12,17-64).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trend_o_meter_spark.operators.daybins import day_binned_extremes

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 10, 0, 0, 0, tzinfo=UTC)  # anchor


def _mk(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts timestamp, value double")


def _utc_naive(d: dt.datetime) -> dt.datetime:
    return d.astimezone(UTC).replace(tzinfo=None)


def test_disjoint_bins_not_cumulative(spark):
    rows = [
        ("m", T0, 10.0),                                  # age 0    -> bin 1
        ("m", T0 - dt.timedelta(hours=30), 99.0),         # age 1.25d -> bin 3
        ("m", T0 - dt.timedelta(days=4), -5.0),           # age 4d   -> bin 5
        ("m", T0 - dt.timedelta(days=6), 50.0),           # age 6d   -> bin 7
        ("m", T0 - dt.timedelta(days=9), 77.0),           # age 9d   -> rest
    ]
    out = {r["day_bin"]: r for r in day_binned_extremes(_mk(spark, rows)).collect()}
    assert set(out) == {"1", "3", "5", "7", "rest"}
    # bin 3 holds ONLY the 1-3d slice; its max is 99, untouched by bin-1 data
    assert out["3"]["max_val"] == 99.0 and out["3"]["n_samples"] == 1
    assert out["5"]["min_val"] == -5.0
    assert out["rest"]["n_samples"] == 1


def test_bin_edge_inclusive(spark):
    # age exactly 1 day goes to bin '1' (reference walks while ts >= edge)
    rows = [("m", T0, 1.0), ("m", T0 - dt.timedelta(days=1), 2.0)]
    out = {r["day_bin"]: r["n_samples"] for r in day_binned_extremes(_mk(spark, rows)).collect()}
    assert out == {"1": 2}


def test_anchor_is_per_metric_max_ts(spark):
    rows = [
        ("a", T0, 1.0),
        ("a", T0 - dt.timedelta(hours=12), 2.0),
        # metric b lives 5 days earlier; its own anchor keeps it in bin 1
        ("b", T0 - dt.timedelta(days=5), 3.0),
        ("b", T0 - dt.timedelta(days=5, hours=6), 4.0),
    ]
    out = day_binned_extremes(_mk(spark, rows)).collect()
    by = {(r["metric"], r["day_bin"]): r for r in out}
    assert ("a", "1") in by and ("b", "1") in by
    assert by[("b", "1")]["n_samples"] == 2


def test_completeness_strict_greater(spark):
    # span exactly 18h -> ceil(18) = 18, NOT > 18 -> incomplete (strict >,
    # trend-o-meter:59); span 18h + 1s -> ceil = 19 -> complete
    rows = [("m", T0, 1.0), ("m", T0 - dt.timedelta(hours=18), 2.0)]
    r = day_binned_extremes(_mk(spark, rows)).collect()[0]
    assert r["is_complete"] is False
    rows2 = [("m", T0, 1.0), ("m", T0 - dt.timedelta(hours=18, seconds=1), 2.0)]
    r2 = day_binned_extremes(_mk(spark, rows2)).collect()[0]
    assert r2["is_complete"] is True


def test_argmin_argmax_tie_break(spark):
    # equal values: argmin takes the EARLIEST ts, argmax the LATEST
    # (struct-ordering lattice; pinned contract, order-free)
    t1, t2 = T0 - dt.timedelta(hours=2), T0 - dt.timedelta(hours=1)
    rows = [("m", t1, 5.0), ("m", t2, 5.0), ("m", T0, 7.0)]
    r = day_binned_extremes(_mk(spark, rows)).collect()[0]
    assert r["min_val"] == 5.0 and _utc_naive(t1) == r["min_ts"].replace(tzinfo=None)
    assert r["max_val"] == 7.0


def test_custom_bins_numeric_sort(spark):
    # bins >= 10 sort numerically ('10' after '3') — fixes the reference's
    # lexicographic Object.keys().sort() quirk (trend-o-meter:157, SURVEY O3)
    rows = [
        ("m", T0, 1.0),
        ("m", T0 - dt.timedelta(days=2), 2.0),
        ("m", T0 - dt.timedelta(days=12), 3.0),
    ]
    out = day_binned_extremes(_mk(spark, rows), day_bins=(1, 3, 14)).orderBy(
        F.when(F.col("day_bin") == "rest", F.lit(10**9)).otherwise(F.col("day_bin").cast("int"))
    ).collect()
    assert [r["day_bin"] for r in out] == ["1", "3", "14"]
