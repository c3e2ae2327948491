"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over vacancy_analyser_spark.plans.registry — every operator from
SURVEY.md §2 registers its (Spark impl, DuckDB oracle SQL) pair there; this
module only re-exports the dicts and the flagship smoke entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vacancy_analyser_spark.plans import registry as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from vacancy_analyser_spark.plans.flagship import flagship_region_share

    return flagship_region_share(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return _registry.oracle_sql()
