"""Scalar text helpers (SURVEY.md §2.9).

All JVM-side Column expressions — no Python UDFs — so they stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cut_text(col: str | Column, limit: int = 128) -> Column:
    """Clip text to ``limit`` chars and append '...' when clipped.

    Reference semantics: feeder_postgres.py:105-109 (``cut_text``).
    """
    c = _c(col)
    return F.when(F.length(c) > limit, F.concat(F.substring(c, 1, limit), F.lit("..."))).otherwise(c)


def normalize_ws(col: str | Column) -> Column:
    """Lowercase + collapse whitespace runs + trim — canonical text form used
    by dedup fingerprints and tokenization."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization → array<string> (notebook cells 15/27 use
    ``str.split``; split on space after whitespace normalization)."""
    return F.split(normalize_ws(col), " ")
