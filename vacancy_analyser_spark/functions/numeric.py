"""Numeric helpers shared by queries and their oracles.

Cross-engine float discipline: a plain SUM(double) differs between Spark and
DuckDB in the last bits because addition order differs (partial aggregation,
different partitioning). Summing an exact fixed-point representation makes
the aggregate associative and order-independent, so both engines produce the
identical value; casting the result back to DOUBLE keeps the output schema
simple and identical. ``*_SQL`` strings are the DuckDB-side mirror.

Physical choice: the Spark side sums ``round(x * 10^6)`` as BIGINT rather
than casting to DECIMAL(18,6). The two are the same arithmetic — DuckDB
itself stores DECIMAL(18,6) as a scaled int64 — but Spark's decimal SUM
promotes to a 128-bit accumulator and casts each double through
``BigDecimal.valueOf`` (a string round-trip), which measured 3x slower than
the long-sum path on the Q1-shape aggregate (1.56s vs 0.49s at sf0.1).
Both engines round half-away-from-zero at the 6th decimal, and the final
``scaled / 10^6`` double division is the same operation DuckDB performs
when casting its decimal sum to DOUBLE, so results are bit-identical.

Overflow bound: the scaled long accumulator holds |Σx| ≤ 2^63/10^6 ≈
9.2 * 10^12 per group. Money-valued group sums sit far below that at any
realistic group cardinality; for a truly unbounded global sum, fall back to
``F.sum(c.cast("decimal(18,6)"))`` (38-digit accumulator) at the 3x cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed-point scale — matches DECIMAL(_, 6) in the oracle SQL.
_SCALE = 10**6


def _scaled(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * _SCALE).cast("bigint")


def dsum(col: str | Column) -> Column:
    """Order-independent SUM over a DOUBLE column → DOUBLE."""
    return (F.sum(_scaled(col)).cast("double") / _SCALE).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent AVG over a DOUBLE column → DOUBLE.

    Computed as exact fixed-point SUM divided by COUNT so both engines do
    one identical double division at the end (oracle divides the decimal
    sum cast to double by the count — same two doubles, same result).
    """
    c = F.col(col) if isinstance(col, str) else col
    return ((F.sum(_scaled(c)).cast("double") / _SCALE) / F.count(c)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
