"""Numeric helpers shared by queries and their oracles.

Cross-engine float discipline: a plain SUM(double) differs between Spark and
DuckDB in the last bits because addition order differs (partial aggregation,
different partitioning). Summing after an exact DECIMAL(18,6) cast makes the
aggregate associative and order-independent, so both engines produce the
identical value; casting the result back to DOUBLE keeps the output schema
simple and identical. ``*_SQL`` strings are the DuckDB-side mirror.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def dsum(col: str | Column) -> Column:
    """Order-independent SUM over a DOUBLE column → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent AVG over a DOUBLE column → DOUBLE.

    Computed as exact-decimal SUM divided by COUNT so both engines do one
    identical double division at the end.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
