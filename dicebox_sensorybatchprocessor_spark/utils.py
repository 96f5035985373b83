"""Shared expression helpers.

The driver's correctness gate hash-compares values against DuckDB, so any
aggregate whose floating-point result depends on accumulation order is a
mismatch hazard (SURVEY.md §5.2 discipline). Money/measure columns in the
fixtures carry ≤2 fixed decimals (FIXTURES.md), so sums over them are
computed in fixed-point: scale to integer units per row (exact — each
row value is within ~1e-10 of an integer after scaling), sum as
DECIMAL(38,0) (overflow-safe far beyond the 100 TB design point, unlike
int64), and descale to double once. The oracle SQL mirrors the identical
computation with HUGEINT, so both engines produce bit-identical doubles
regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_point_sum(col: Column, decimals: int) -> Column:
    """Order-insensitive exact sum of a fixed-decimal double column."""
    factor = float(10**decimals)
    units = F.round(col * F.lit(factor), 0).cast("decimal(38,0)")
    return F.sum(units).cast("double") / F.lit(factor)


def fixed_point_sum_sql(expr: str, decimals: int) -> str:
    """DuckDB SQL mirroring :func:`fixed_point_sum` bit-for-bit."""
    factor = float(10**decimals)
    return f"CAST(SUM(CAST(round(({expr}) * {factor}, 0) AS HUGEINT)) AS DOUBLE) / {factor}"


def ts_ntz(literal: str) -> Column:
    """TIMESTAMP_NTZ literal — fixture timestamps are naive (FIXTURES.md)."""
    return F.expr(f"TIMESTAMP_NTZ '{literal}'")
