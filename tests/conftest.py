from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from trend_o_meter_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def events_df(spark):
    from trend_o_meter_spark.catalog import table

    return table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type", "value"
    )
