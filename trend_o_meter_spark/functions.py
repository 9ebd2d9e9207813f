"""Scalar function library (reference §2.8, X1-X12).

Each function is a ``Column -> Column`` built from JVM-side builtins (no
Python UDFs — these all stay inside whole-stage codegen).  Where JS and
SQL rounding semantics differ (``Number.toFixed`` is round-half-away-from-
zero on the decimal representation), we pin an explicit deterministic
contract (``floor(x + 0.5)`` for non-negative display rounding) so Spark
and the DuckDB oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def devoweled(col: Column | str) -> Column:
    """X1 (trend-o-meter:83): strip [aeiouy] (lowercase only, as the ref)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, "[aeiouy]", "")


def abbrev3(col: Column | str) -> Column:
    """X1 call-site form (trend-o-meter:96,356): devoweled then first 3 chars."""
    return F.substring(devoweled(col), 1, 3)


def display_round(col: Column | str) -> Column:
    """X2 (trend-o-meter:147-150): JS ``toFixed(0)`` for non-negative values.

    ``floor(x + 0.5)`` == round-half-away-from-zero for x >= 0, and is
    bit-identical across Spark and DuckDB (no decimal re-rendering).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c + F.lit(0.5)).cast("long")


def pressure_last2(col: Column | str) -> Column:
    """X3 (trend-o-meter:149): last two chars of the rounded value."""
    return F.substring(display_round(col).cast("string"), -2, 2)


def to_bool(col: Column | str) -> Column:
    """X5 (trend-o-meter:196-205): JS ``Number.parseInt`` truthiness.

    parseInt accepts a leading-integer *prefix* ('1.5' -> 1, '2abc' -> 2,
    '0rest' -> 0), so truthy iff that prefix contains a nonzero digit;
    no integer prefix (NaN) falls through to ``lower(x) == 'true'``.
    The nonzero-digit test (not a cast) stays exact for arbitrarily long
    digit strings, where parseInt returns a truthy float.  Documented
    divergence: parseInt's hex '0x..' prefix form is not recognized (no
    reference payload uses it).
    """
    c = F.col(col) if isinstance(col, str) else col
    prefix = F.regexp_extract(c, r"^\s*([+-]?\d+)", 1)
    return F.when(prefix != "", prefix.rlike("[1-9]")).otherwise(F.lower(c) == "true")


def tokenize_ws(col: Column | str) -> Column:
    """X6 (trend-o-meter:173): whitespace split."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), "\\s+")


def hhmm(col: Column | str) -> Column:
    """X7 (trend-o-meter:343-345): 12h clock 'hh:mm'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "hh:mm")


def ampm(col: Column | str) -> Column:
    """X7: AM/PM marker."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "a")
