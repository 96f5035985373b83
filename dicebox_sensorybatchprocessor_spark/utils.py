"""Shared expression helpers.

The driver's correctness gate hash-compares values against DuckDB, so any
aggregate whose floating-point result depends on accumulation order is a
mismatch hazard (SURVEY.md §5.2 discipline). Money/measure columns in the
fixtures carry ≤2 fixed decimals (FIXTURES.md), so sums over them are
computed in fixed-point: scale to integer units per row (exact — each
row value is within ~1e-10 of an integer after scaling), sum the units
exactly, and descale to double once. The oracle SQL mirrors the identical
computation with HUGEINT, so both engines produce bit-identical doubles
regardless of partial-aggregation order.

A single ``sum(decimal(38,0))`` would be the obvious exact accumulator,
but Spark's >18-digit decimal aggregation leaves the long-backed
fast path (measured 7× slower on TPC-H Q1 at sf0.1). Instead each row's
integer units are split hi/lo around 2**20 and summed as two plain
``bigint`` aggregates — full whole-stage codegen — then recombined in
decimal once per *group*. Overflow headroom: per-row units ≲ 1e11
(charge at 6 decimals), so ``sum(hi)`` ≲ 1e5·n and ``sum(lo)`` < 2**20·n
stay inside int64 up to n ≈ 8e12 rows — beyond the 100 TB design point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CHUNK = 2**20  # hi/lo split base for exact long-only summation


def fixed_point_sum(col: Column, decimals: int) -> Column:
    """Order-insensitive exact sum of a fixed-decimal double column."""
    factor = float(10**decimals)
    units = F.round(col * F.lit(factor), 0).cast("long")
    if decimals <= 2:
        # ≤2-decimal measures (quantities, prices ≲ 1e6) keep per-row units
        # under ~1e8, so a single int64 sum is exact up to ~9e10 rows per
        # group — beyond the 100 TB design point for any one group.
        return F.sum(units).cast("double") / F.lit(factor)
    lo = F.pmod(units, F.lit(_CHUNK))  # in [0, CHUNK) for any sign
    hi = ((units - lo) / F.lit(_CHUNK)).cast("long")  # exact: |hi| < 2**53
    total = (
        F.sum(hi).cast("decimal(38,0)") * F.lit(_CHUNK)
        + F.sum(lo).cast("decimal(38,0)")
    )
    return total.cast("double") / F.lit(factor)


def fixed_point_sum_sql(expr: str, decimals: int) -> str:
    """DuckDB SQL mirroring :func:`fixed_point_sum` bit-for-bit."""
    factor = float(10**decimals)
    return f"CAST(SUM(CAST(round(({expr}) * {factor}, 0) AS HUGEINT)) AS DOUBLE) / {factor}"


def fixed_point_sum_sql_spark(expr: str, decimals: int) -> str:
    """Spark SQL string form of :func:`fixed_point_sum` (same hi/lo long
    decomposition), for spark.sql-surface queries that must hash-match the
    DuckDB HUGEINT oracle. ``expr`` may be any SQL expression, including a
    CASE WHEN for filtered sums."""
    factor = float(10**decimals)
    units = f"CAST(round(({expr}) * {factor}, 0) AS BIGINT)"
    lo = f"pmod({units}, {_CHUNK})"
    return (
        f"CAST(CAST(SUM(CAST(({units} - {lo}) / CAST({_CHUNK} AS DOUBLE) AS BIGINT))"
        f" AS DECIMAL(38,0)) * {_CHUNK}"
        f" + CAST(SUM({lo}) AS DECIMAL(38,0)) AS DOUBLE) / {factor}"
    )


def ts_ntz(literal: str) -> Column:
    """TIMESTAMP_NTZ literal — fixture timestamps are naive (FIXTURES.md)."""
    return F.expr(f"TIMESTAMP_NTZ '{literal}'")
