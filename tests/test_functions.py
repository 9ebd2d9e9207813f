"""Scalar function library golden tests (reference §2.8 X1-X12 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trend_o_meter_spark import functions as tfn


def _one(spark, col, value, schema="v string"):
    return spark.createDataFrame([(value,)], schema).select(col.alias("out")).collect()[0]["out"]


def test_devoweled_and_abbrev(spark):
    # reference strips lowercase [aeiouy] only (trend-o-meter:83)
    assert _one(spark, tfn.devoweled("v"), "temperature") == "tmprtr"
    assert _one(spark, tfn.abbrev3("v"), "temperature") == "tmp"
    assert _one(spark, tfn.abbrev3("v"), "humidity") == "hmd"
    assert _one(spark, tfn.devoweled("v"), "AEIOU") == "AEIOU"  # case-sensitive, as the ref


def test_display_round_half_away(spark):
    # JS toFixed(0) rounds half away from zero for positives
    assert _one(spark, tfn.display_round("v"), 2.5, "v double") == 3
    assert _one(spark, tfn.display_round("v"), 2.4, "v double") == 2
    assert _one(spark, tfn.display_round("v"), 1013.25, "v double") == 1013


def test_pressure_last2(spark):
    # trend-o-meter:149 — rounded value's last two characters
    assert _one(spark, tfn.pressure_last2("v"), 1013.2, "v double") == "13"
    assert _one(spark, tfn.pressure_last2("v"), 998.7, "v double") == "99"


def test_to_bool_matrix(spark):
    # trend-o-meter:196-205: parseInt prefix -> !=0; else lower(x)=='true'
    cases = {
        "1": True, "0": False, "42": True, "-1": True,
        "true": True, "TRUE": True, "false": False, "yes": False, "": False,
        # JS Number.parseInt accepts numeric PREFIXES (advisor-flagged):
        "1.5": True, "2abc": True, "0.9": False, "0rest": False,
        "-0": False, " 7 ": True, "+3x": True, ".5": False,
        # longer than int64: parseInt yields a truthy float, we stay truthy
        "99999999999999999999999": True,
    }
    for s, want in cases.items():
        assert _one(spark, tfn.to_bool("v"), s) is want, s
    # driver-side mirror must agree on the same matrix
    from trend_o_meter_spark.control.plane import _to_bool

    for s, want in cases.items():
        assert _to_bool(s) is want, s


def test_tokenize_ws(spark):
    out = _one(spark, tfn.tokenize_ws("v"), "  get   stats  now ")
    assert out == ["get", "stats", "now"]


def test_hhmm_ampm(spark):
    import datetime as dt

    df = spark.createDataFrame([(dt.datetime(2024, 1, 1, 13, 5, 0),)], "v timestamp")
    row = df.select(tfn.hhmm("v").alias("h"), tfn.ampm("v").alias("a")).collect()[0]
    assert row["h"] == "01:05" and row["a"] == "PM"
