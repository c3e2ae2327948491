"""Interactive workspace binding — the switch-over surface for reference
users (SURVEY §3.2: the notebook audience works in Jupyter SQL/pandas).

A user of the reference runs analyses against named tables; this module
gives them the same experience on the engine:

    from vacancy_analyser_spark.workspace import bind, run, catalog

    bind(spark, "/root/testdata/sf0.01")     # tables become SQL views
    spark.sql("SELECT lang, count(*) FROM documents GROUP BY lang")
    run(spark, "/root/testdata/sf0.01", "skill_freq")   # any registered op
    catalog()                                 # name → one-line description

Views are plain temp views over the parquet scans — Catalyst still sees
the files directly, so pushdown/pruning are unchanged; binding costs no
read. `run` resolves the same registry the driver grades, so interactive
results and oracle-checked results are the same code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import load_table
from .plans import all_specs
from .schemas import TESTDATA_SCHEMAS

TESTDATA_TABLES: tuple[str, ...] = tuple(TESTDATA_SCHEMAS)


def bind(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None) -> None:
    """Register each testdata table as a SQL temp view named after itself."""
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run one registered operator by name (same registry the driver uses)."""
    specs = all_specs()
    if name not in specs:
        raise KeyError(f"unknown query {name!r}; see catalog() for the {len(specs)} available")
    return specs[name].fn(spark, sf_dir)


def catalog() -> dict[str, str]:
    """name → first docstring line, for interactive discovery."""
    return {
        name: (spec.doc.splitlines()[0] if spec.doc else "")
        for name, spec in sorted(all_specs().items())
    }
