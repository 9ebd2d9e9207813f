"""Cross-engine deterministic hashing primitives.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` are different
functions, so every hash the oracle must reproduce is built from ``md5``
(identical in both engines) re-interpreted as an integer:

    h(s) = int(md5(s)[:HEX_DIGITS], 16)

Spark:  ``conv(substring(md5(s), 1, N), 16, 10)`` cast to bigint
DuckDB: ``CAST('0x' || substring(md5(s), 1, N) AS BIGINT)``

HEX_DIGITS=7 keeps h < 2^28 so the MinHash permutation ``(a*h + b) % p``
with a,b < 2^31 stays comfortably inside int64 (no overflow divergence).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 7  # 28-bit hash values
MERSENNE_P = 2_147_483_647  # 2^31 - 1
SIM_HEX_DIGITS = 15  # 60-bit hash values for SimHash


def md5_int(col: Column, hex_digits: int = HEX_DIGITS) -> Column:
    """First ``hex_digits`` of md5 as a bigint (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, hex_digits), 16, 10).cast("bigint")


def md5_int_sql(expr: str, hex_digits: int = HEX_DIGITS) -> str:
    """DuckDB twin of :func:`md5_int`."""
    return f"CAST('0x' || substring(md5({expr}), 1, {hex_digits}) AS BIGINT)"


def minhash_perms(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation constants shared with the oracle."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_perm)]
