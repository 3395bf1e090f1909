"""Exact, order-independent numeric aggregation helpers.

Floating-point sums depend on reduction order, which differs across engines
and across shuffle layouts — a 1000-executor sum of doubles is not
bit-reproducible. The fixture money columns are 2-decimal doubles, so we
aggregate in DECIMAL (exact integer arithmetic, associative/commutative →
order-independent → reproducible at any cluster size) and cast the final
result to DOUBLE once. The DuckDB oracle does the identical casts, giving
bit-equal hashes.

Precision budget is chosen to stay within 38 digits through products:
money(12,2) * rate(3,2) -> decimal(17,4), and a second rate factor (the
Q1 charge term) -> decimal(20,6); a 10^12-row sum still fits 38 digits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
RATE = "decimal(3,2)"
QTY = "decimal(12,2)"


def money(c: str | Column) -> Column:
    """Money column (2-decimal double in fixtures) as exact decimal."""
    return (F.col(c) if isinstance(c, str) else c).cast(MONEY)


def rate(c: str | Column) -> Column:
    """Rate in [0,1] with 2 decimals (discount/tax) as exact decimal."""
    return (F.col(c) if isinstance(c, str) else c).cast(RATE)


def qty(c: str | Column) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(QTY)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double (order-independent)."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """avg = exact-decimal sum cast to double, divided by count.

    One double division of two identical operands is bit-deterministic on
    both engines, unlike a running double mean.
    """
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)
