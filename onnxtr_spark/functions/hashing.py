"""Cross-engine deterministic 64-bit hashing.

Spark's xxhash64 and DuckDB's hash() disagree, so every operator that
must be oracle-checkable hashes through md5 (identical in both engines):
the first 15 hex chars (60 bits) of md5("<seed>:<value>") as a bigint.
Slower than xxhash64 but still JVM-side and vectorized; a production
deployment without the cross-engine constraint would swap in xxhash64
via the same helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column, seed: int = 0) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB mirror of ``hash64`` for oracle SQL."""
    return f"CAST(concat('0x', substring(md5(concat('{seed}:', {expr})), 1, 15)) AS BIGINT)"


def round_half_up(col: Column, scale: int) -> Column:
    """Deterministic cross-engine rounding.

    Spark's round() is HALF_UP while DuckDB's rint-based round is
    HALF_EVEN, so exact .5 boundaries diverge. floor(x*m + 0.5)/m is the
    same double-op sequence in both engines; the trailing +0.0
    normalizes -0.0 to +0.0 (they stringify differently)."""
    m = 10**scale
    return F.floor(col * m + F.lit(0.5)) / F.lit(float(m)) + F.lit(0.0)


def round_half_up_sql(expr: str, scale: int) -> str:
    """DuckDB mirror of ``round_half_up``."""
    m = 10**scale
    return f"(floor(({expr}) * {m} + 0.5) / {m}.0 + 0.0)"
