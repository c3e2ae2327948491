"""Query registry: one place where every operator's Spark implementation and
its DuckDB oracle SQL live side by side.

The driver contract (__spark_entry__.py) needs two dicts — ``queries()`` and
``oracle_sql()`` — whose keys and *result column names* must agree exactly
(the compare sorts columns by name before value-hashing). Registering both
halves in a single ``@register(...)`` call site keeps them from drifting.

Float discipline (SURVEY.md §7 watch item 3): any aggregate over DOUBLE
columns must be order-independent to hash-match across engines. The helpers
``dsum``/``davg`` (functions/numeric.py) sum via DECIMAL(18,6) — exact,
associative — then cast back to DOUBLE identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    #: ANSI SQL DuckDB can run on the pre-registered views (region nation
    #: customer supplier part orders lineitem events documents embeddings).
    #: None → not SQL-expressible; the driver records a rows-only check.
    oracle: str | None
    tags: tuple[str, ...]
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), (fn.__doc__ or "").strip())
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every plans module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        analytic_windows,
        dedup,
        flagship,
        joins,
        lake,
        multimodal,
        rowops,
        reshape,
        similarity,
        snapshot,
        streaming_batch,
        subqueries,
        textops,
    )

    _LOADED = True
