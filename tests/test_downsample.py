"""Exact anchored downsample (F2) golden + property tests.

The anchored variant reproduces the reference's stateful scan
(trend-o-meter:296-310): walk newest-first, keep iff
``abs(ts - last_kept_ts) > gap``.  The fixed-grid variant is the scale
contract checked by the oracle; here we pin the anchored semantics the
oracle can't express.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from trend_o_meter_spark.operators.downsample import (
    downsample_anchored,
    downsample_fixed_grid,
)

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, offsets_sec, metric="m"):
    rows = [(metric, T0 + dt.timedelta(seconds=o), float(i)) for i, o in enumerate(offsets_sec)]
    return spark.createDataFrame(rows, "metric string, ts timestamp, value double")


def _kept_offsets(df):
    return sorted(
        (r["ts"].replace(tzinfo=None) - T0).total_seconds() for r in df.collect()
    )


def test_anchored_newest_always_kept(spark):
    df = _mk(spark, [0, 30, 59, 90, 200])
    kept = _kept_offsets(downsample_anchored(df, keys=("metric",), gap_seconds=60))
    # walk newest-first: 200 kept (mark=200), 90 kept (|90-200|>60),
    # 59 skipped (|59-90|=31), 30 skipped (|30-90|=60, not >), 0 kept
    assert kept == [0.0, 90.0, 200.0]


def test_anchored_differs_from_fixed_grid(spark):
    # samples at 50s and 70s: same anchored-kept decision differs from the
    # epoch-grid variant (50 and 70 land in different minute cells)
    df = _mk(spark, [0, 50, 70])
    anchored = _kept_offsets(downsample_anchored(df, keys=("metric",), gap_seconds=60))
    grid = _kept_offsets(downsample_fixed_grid(df, keys=("metric",), gap_seconds=60))
    assert anchored == [0.0, 70.0]  # newest-first: 70 kept, 50 too close to 70, 0 kept
    assert grid == [0.0, 70.0]  # first-per-cell: cell0 -> 0 (50 dropped), cell1 -> 70


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=3600), min_size=1, max_size=40, unique=True)
)
def test_anchored_gap_property(spark, offsets):
    """Every pair of consecutive kept samples is > gap apart."""
    df = _mk(spark, offsets)
    kept = _kept_offsets(downsample_anchored(df, keys=("metric",), gap_seconds=60))
    assert max(offsets) in kept  # newest always kept
    for a, b in zip(kept, kept[1:]):
        assert b - a > 60


def test_fixed_grid_one_per_cell_per_key(spark):
    df = _mk(spark, [0, 10, 20, 61, 62, 150], metric="a").union(
        _mk(spark, [5, 15], metric="b")
    )
    out = downsample_fixed_grid(df, keys=("metric",), gap_seconds=60)
    rows = out.collect()
    cells = {}
    for r in rows:
        key = (r["metric"], int((r["ts"].replace(tzinfo=None) - T0).total_seconds() // 60))
        assert key not in cells
        cells[key] = r
    # first (smallest ts) of each cell is the keeper
    assert (
        cells[("a", 0)]["value"] == 0.0
        and cells[("a", 1)]["value"] == 3.0
        and cells[("b", 0)]["value"] == 0.0
    )
