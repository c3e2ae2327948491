"""Partitioned-lake layout queries (SURVEY §1.4, §4 partition-pruning rows).

The harness testdata is flat parquet, but the reference's lake is
date-partitioned by construction (yearly analysis files, notebook cell 4;
date-dir snapshots, periodic_run.py:25-26; our write path exposes
partitionBy like feeder_hadoop's maxRecordsPerFile). These queries
materialize a year-partitioned copy of `orders` once per sf_dir under the
repo's spark-warehouse and answer the filter-arrives-through-a-dim shape —
the case where only DYNAMIC partition pruning keeps a 100 TB scan at
one-partition cost (a literal year filter would be static pruning, already
asserted in tests/test_sinks.py).

The materialization is idempotent (skipped when the layout's _SUCCESS
marker exists) and the result is layout-independent, so the DuckDB oracle
runs the same ANSI query against the flat view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_sql
from ..io import load_table, materialization_is_fresh, write_parquet
from .registry import register

_WAREHOUSE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse")


def _orders_lake_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_WAREHOUSE, f"lake_{tag}", "orders_by_year")


def orders_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-partitioned `orders` lake, materialized once per sf_dir.

    Layout: `o_year=YYYY/` directories (partition column derived from
    o_orderdate), 50k-row files for parity with feeder_hadoop.py:20.
    """
    path = _orders_lake_path(sf_dir)
    # _SUCCESS + source-mtime freshness: a regenerated orders.parquet under
    # the same sf_dir must rebuild the layout, not serve the stale one
    if not materialization_is_fresh(path, os.path.join(sf_dir, "orders.parquet")):
        orders = load_table(spark, sf_dir, "orders")
        write_parquet(
            orders.withColumn("o_year", F.year("o_orderdate")),
            path,
            partition_by=["o_year"],
        )
    # explicit schema: skips footer-based inference on the warm path and
    # keeps an EMPTY layout readable (zero data files → inference fails
    # with UNABLE_TO_INFER_SCHEMA; the declared schema serves 0 rows)
    expected = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .schema
    )
    return spark.read.schema(expected).parquet(path)


@register(
    "lake_dpp_star_join",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice')} AS total_price
        FROM orders
        WHERE year(o_orderdate) = 1997
        GROUP BY o_orderpriority
    """,
    tags=("lake", "J5", "opt-partition-pruning"),
)
def lake_dpp_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join over the year-partitioned lake where the year constraint
    arrives ONLY through a dimension join (a 3-row campaign dim selects
    1997) — no literal partition predicate anywhere in the query. Spark
    must inject a dynamicpruning subquery from the broadcast dim so the
    fact scan lists one `o_year=` directory; the plan guard asserts it.

    At 100 TB this shape is the difference between reading one partition
    and reading the lake every time an analyst filters via a dim table.
    The oracle proves layout-independence: DuckDB answers from the flat
    table with a plain year() predicate."""
    campaigns = spark.createDataFrame(
        [(1996, "old"), (1997, "campaign"), (1998, "old")],
        "o_year int, label string",
    )
    dim = F.broadcast(campaigns.filter(F.col("label") == "campaign")).drop("label")
    lake = orders_partitioned(spark, sf_dir)
    return (
        lake.join(dim, "o_year")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


def _documents_lake_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_WAREHOUSE, f"lake_{tag}", "documents_by_lang")


def documents_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-partitioned `documents` lake, materialized once per sf_dir
    — the production corpus layout (real pipelines partition by
    source/crawl-date/lang precisely so per-slice jobs scan one
    directory). Same freshness/idempotence contract as the orders lake."""
    path = _documents_lake_path(sf_dir)
    if not materialization_is_fresh(path, os.path.join(sf_dir, "documents.parquet")):
        docs = load_table(spark, sf_dir, "documents")
        write_parquet(docs, path, partition_by=["lang"])
    expected = load_table(spark, sf_dir, "documents").schema
    return spark.read.schema(expected).parquet(path)


@register(
    "corpus_lake_pruned_scan",
    oracle="""
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE lang IN ('en', 'de')
        GROUP BY lang, source
    """,
    tags=("lake", "ext-text", "opt-partition-pruning"),
)
def corpus_lake_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus census restricted to two languages, over
    the lang-partitioned lake: the literal IN-filter becomes STATIC
    partition pruning — the scan lists two `lang=` directories and the
    text column never leaves the files (plan-guarded: PartitionFilters
    carries lang, ReadSchema excludes text). At 100 TB this is the
    difference between a per-language stats job reading its slice and
    rereading the corpus. The oracle answers from the flat view —
    layout-independence, like the orders lake."""
    lake = documents_partitioned(spark, sf_dir)
    return (
        lake.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
