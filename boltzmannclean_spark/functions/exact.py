"""Bit-exact cross-engine aggregation helpers.

Problem: summing doubles is order-dependent, and ROUND() at half
boundaries (ubiquitous with 2-decimal money data) disagrees between
engines (Spark HALF_UP on the decimal expansion vs C-library rounding of
scaled doubles). Either one breaks the driver's value-hash comparison
against DuckDB.

Recipe used by every money-aggregating query in this engine, mirrored in
its oracle SQL:

1. Per-row arithmetic on doubles needs nothing: IEEE ops are
   deterministic, so both engines produce bit-identical row values.
2. Aggregates: cast inputs to decimal (the data is exactly 2-decimal,
   verified in tests/test_exact_decimal.py), aggregate in exact decimal
   arithmetic, cast the final result to double. Exact decimal → nearest
   double is deterministic, so both engines agree bit-for-bit with no
   rounding step at all.
3. Averages: exact decimal sum → double, divided by the bigint count —
   one IEEE division of identical operands.

This also holds at 100 TB: decimal sums are just wider accumulators in
the same partial+final hash aggregation; no extra shuffle or pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Cast a (2-decimal-exact) double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def sum_d(expr: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Exact decimal sum, returned as double (deterministic both engines)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    if isinstance(expr, str):
        c = dec(expr, prec, scale)
    return F.sum(c).cast("double")


def avg_d(expr: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """avg = exact-decimal-sum-as-double / count — deterministic division."""
    c = dec(expr, prec, scale) if isinstance(expr, str) else expr
    return F.sum(c).cast("double") / F.count(F.lit(1))


def sdiv_duck(num: str, den: str) -> str:
    """Sign-safe integer division for oracle SQL: DuckDB ``//`` floors
    but Spark ``div`` truncates toward zero, so both twins divide
    magnitudes (where the engines agree) and reapply the sign —
    identical bits for any signed operands."""
    return (
        f"CASE WHEN {num} < 0 THEN -((-({num})) // {den})"
        f" ELSE ({num}) // {den} END"
    )


def sdiv_spark(num: str, den: str) -> str:
    """Spark-SQL twin of :func:`sdiv_duck` (same trunc-of-magnitude
    semantics, expressed with ``div``)."""
    return (
        f"CASE WHEN {num} < 0 THEN -((-({num})) div {den})"
        f" ELSE ({num}) div {den} END"
    )
