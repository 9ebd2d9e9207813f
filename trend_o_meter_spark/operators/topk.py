"""Top-k by recency (reference O1/O2, trend-o-meter:289).

The reference's backfill scan is "newest 14401 rows" (lrange 0..14400,
inclusive — config/default.json:6).  In Spark a desc-sort + limit compiles
to ``TakeOrderedAndProject``: each partition keeps its local top-k, the
driver merges k-sized heaps — no global sort, scale-safe for the k values
this engine uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_k_recent(
    df: DataFrame,
    *,
    ts: str = "ts",
    k: int = 14401,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    order = [F.col(ts).desc()] + [F.col(c).desc() for c in tiebreak]
    return df.orderBy(*order).limit(k)


def top_k_recent_sql(
    table: str,
    *,
    ts: str = "ts",
    k: int = 14401,
    tiebreak: Sequence[str] = (),
    columns: str = "*",
) -> str:
    order = ", ".join(f"{c} DESC" for c in [ts, *tiebreak])
    return f"SELECT {columns} FROM {table} ORDER BY {order} LIMIT {k}"
