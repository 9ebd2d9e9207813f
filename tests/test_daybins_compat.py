"""Golden tests for the quirk-faithful A3 (day_binned_extremes_compat).

Expectations hand-traced through the reference's minMaxForDayBins walk
(trend-o-meter:17-64): exclusive slice ends, one-edge-per-element
advancement, and the :37 leftover off-by-one.
"""

import pytest
from pyspark.sql import functions as F

from trend_o_meter_spark.operators.daybins import day_binned_extremes_compat

BASE = 1_700_000_000
DAY = 86400


def _df(spark, offsets_values):
    """offsets are seconds BEFORE the anchor (age); newest has age 0."""
    return spark.createDataFrame(
        [(float(BASE - age), float(v), "m") for age, v in offsets_values],
        "epoch double, value double, metric string",
    ).select(F.timestamp_seconds("epoch").alias("ts"), "value", "metric")


def _rows(df):
    return {r["day_bin"]: r for r in df.collect()}


def test_edge_crossing_element_starts_next_slice(spark):
    # ages: 0, 0.5d, 1.2d, 2d — edge for bin '1' is at age 1d.
    # Reference walk: element at age 1.2d is the FIRST past the edge ->
    # slice '1' = [0, 0.5d] (exclusive of 1.2d); 1.2d starts the next
    # slice.  Data ends before the 3d edge, so the leftover rule fires:
    # start = idx(1.2d) + 1 -> the 1.2d sample is DROPPED ENTIRELY and
    # bin '3' holds only the 2d sample.
    data = [(0, 10.0), (int(0.5 * DAY), 20.0), (int(1.2 * DAY), 99.0), (2 * DAY, 5.0)]
    out = _rows(day_binned_extremes_compat(_df(spark, data)))
    assert set(out) == {"1", "3"}
    assert out["1"]["n_samples"] == 2
    assert out["1"]["min_val"] == 10.0 and out["1"]["max_val"] == 20.0
    assert out["3"]["n_samples"] == 1
    assert out["3"]["min_val"] == 5.0 and out["3"]["max_val"] == 5.0  # 99.0 dropped


def test_one_edge_per_element_mislabels_after_gap(spark):
    # ages: 0, 4d, 6d.  The 4d element crosses edge '1' (one edge per
    # element) -> slice '1' = [age 0].  The 6d element then crosses edge
    # '3' -> slice '3' = [4d sample] (a 3.5-5d-old sample labeled '3' by
    # walk order).  The leftover for bin '5' starts one PAST the 6d
    # element -> empty; the 6d sample is dropped by the off-by-one.
    data = [(0, 1.0), (4 * DAY, 50.0), (6 * DAY, 7.0)]
    out = _rows(day_binned_extremes_compat(_df(spark, data)))
    assert set(out) == {"1", "3", "5"}
    assert out["1"]["n_samples"] == 1 and out["1"]["max_val"] == 1.0
    assert out["3"]["n_samples"] == 1 and out["3"]["max_val"] == 50.0
    assert out["5"]["n_samples"] == 0


def test_empty_slice_between_consecutive_crossings(spark):
    # ages: 0, 1.5d, 3.5d, then nothing.  1.5d crosses edge '1' ->
    # slice '1' = [0]; 3.5d crosses edge '3' -> slice '3' = [1.5d].
    # Leftover fires for bin '5': starts at idx(3.5d)+1 -> EMPTY bin
    # (the 3.5d sample is dropped).
    data = [(0, 1.0), (int(1.5 * DAY), 2.0), (int(3.5 * DAY), 3.0)]
    out = _rows(day_binned_extremes_compat(_df(spark, data)))
    assert set(out) == {"1", "3", "5"}
    assert out["3"]["n_samples"] == 1 and out["3"]["max_val"] == 2.0
    assert out["5"]["n_samples"] == 0
    assert out["5"]["min_val"] is None and out["5"]["is_complete"] is False


def test_tie_keeps_newest_and_leftover_drops_head(spark):
    # No edge is ever crossed (all ages < 1d), so the whole series is
    # the leftover slice — which starts at index 1, dropping the NEWEST
    # sample (age 0).  Equal minimum values at ages 100 and 200: strict
    # < keeps the first-encountered in newest-first order = age 100.
    data = [(0, 5.0), (100, 1.0), (200, 1.0), (300, 9.0)]
    out = _rows(day_binned_extremes_compat(_df(spark, data)))
    r = out["1"]
    assert r["n_samples"] == 3  # age-0 sample dropped by the :37 off-by-one
    assert r["min_val"] == 1.0
    assert r["min_ts"].timestamp() == BASE - 100
    assert r["max_val"] == 9.0 and r["max_ts"].timestamp() == BASE - 300


def test_completeness_strict_gt(spark):
    # The leftover drops the newest sample, so the surviving slice is
    # [age 60s .. age 18h+60s]: span exactly 18h -> ceil = 18, NOT > 18
    # -> incomplete.
    data = [(0, 1.0), (60, 1.5), (18 * 3600 + 60, 2.0)]
    out = _rows(day_binned_extremes_compat(_df(spark, data), min_data_hours=18))
    assert out["1"]["n_samples"] == 2
    assert out["1"]["is_complete"] is False
    # one second past 18h span: ceil -> 19 > 18 -> complete
    data2 = [(0, 1.0), (60, 1.5), (18 * 3600 + 61, 2.0)]
    out2 = _rows(day_binned_extremes_compat(_df(spark, data2), min_data_hours=18))
    assert out2["1"]["is_complete"] is True


def test_full_seven_days_no_leftover(spark):
    # dense hourly data over 7.5 days: all four slices real, NO leftover
    # (slices == len(day_bins) blocks the leftover branch) — data older
    # than the last crossing stays in the final slice? No: the 4th
    # crossing closes slice '7'... trace: crossings at 1d,3d,5d,7d ->
    # slices [0,1d),[1d,3d),[3d,5d),[5d,7d); leftover blocked, so
    # samples >= 7d old are silently absent.
    data = [(h * 3600, float(h % 24)) for h in range(0, 180)]  # 7.5 days
    out = _rows(day_binned_extremes_compat(_df(spark, data)))
    assert set(out) == {"1", "3", "5", "7"}
    total = sum(r["n_samples"] for r in out.values())
    assert total < len(data)  # tail beyond the last edge is dropped
    for r in out.values():
        assert r["is_complete"] is True


def test_compat_sql_oracle_matches_walk_on_adversarial_data(spark):
    # The oracle promotion (day_binned_extremes_compat_sql) must agree
    # with the real applyInPandas walk on shapes the sf corpus never
    # exercises: multi-edge gaps (empty closed slices), all-four-edges
    # crossed (no leftover, post-slice elements discarded), a no-trigger
    # single-element metric (the ':37' drop eats the anchor itself),
    # ties in value, and fractional-second ages near edge boundaries.
    import random

    import duckdb
    import pandas as pd

    from trend_o_meter_spark.operators.daybins import (
        day_binned_extremes_compat_sql,
    )

    rng = random.Random(7)
    rows = []
    # m0: gap spanning the 3d and 5d edges in one step -> empty slices
    for age, v in [(0, 1.0), (3600, 2.0), (5.5 * DAY, 3.0), (6 * DAY, 1.0)]:
        rows.append((BASE - float(age), float(v), "m0"))
    # m1: all four edges crossed, elements beyond bin '7' discarded
    for age, v in [(0, 5.0), (1.5 * DAY, 4.0), (3.5 * DAY, 3.0),
                   (5.5 * DAY, 2.0), (7.5 * DAY, 1.0), (8 * DAY, 9.0),
                   (9 * DAY, 0.5)]:
        rows.append((BASE - float(age), float(v), "m1"))
    # m2: single element, zero triggers -> ':37' drops the anchor
    rows.append((float(BASE), 42.0, "m2"))
    # m3: dense random walk with value ties and sub-second jitter
    age = 0.0
    for _ in range(120):
        age += rng.uniform(60, 0.12 * DAY)
        rows.append((BASE - age, float(rng.choice([1.0, 2.0, 3.0])), "m3"))
    # m4: trigger element is the LAST element (empty leftover slot)
    for age, v in [(0, 1.0), (0.5 * DAY, 2.0), (1.5 * DAY, 3.0)]:
        rows.append((BASE - float(age), float(v), "m4"))

    df = spark.createDataFrame(
        [(e, v, m) for e, v, m in rows], "epoch double, value double, metric string"
    ).select(F.timestamp_seconds("epoch").alias("ts"), "value", "metric")
    got = day_binned_extremes_compat(df).toPandas()

    oracle_in = df.toPandas()
    con = duckdb.connect()
    con.register("t", oracle_in)
    exp = con.execute(day_binned_extremes_compat_sql("t")).fetchdf()

    key = ["metric", "day_bin"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(
        got, exp.astype(got.dtypes.to_dict()), check_like=True
    )
