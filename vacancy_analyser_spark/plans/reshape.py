"""R-ops: pivot / union / set ops (SURVEY.md §2.6)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIVOT_ALIASES = ["p_urgent", "p_high", "p_medium", "p_not_specified", "p_low"]


@register(
    "pivot_by_year",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p_urgent,
               COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p_high,
               COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p_medium,
               COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p_not_specified,
               COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p_low
        FROM orders
        GROUP BY year(o_orderdate)
    """,
    tags=("R1",),
)
def pivot_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 pivot (notebook cells 17/28: per-year frames concat'd into an
    [entity × year] matrix). Explicit value list → single-pass pivot, no
    distinct-values pre-scan; missing cells coalesced to 0 to match COUNT
    semantics. At 100 TB prefer the long format and pivot only at display —
    this query keeps the pivoted side bounded (5 columns)."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.select(F.year("o_orderdate").cast("int").alias("order_year"), "o_orderpriority")
        .groupBy("order_year")
        .pivot("o_orderpriority", ORDER_PRIORITIES)
        .count()
    )
    cols = [F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a) for v, a in zip(ORDER_PRIORITIES, _PIVOT_ALIASES)]
    return pivoted.select("order_year", *cols)


@register(
    "union_years",
    oracle="""
        SELECT order_year, COUNT(*) AS n_orders
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS order_year FROM orders WHERE year(o_orderdate) = 1995
            UNION ALL
            SELECT CAST(year(o_orderdate) AS INT) AS order_year FROM orders WHERE year(o_orderdate) = 1996
        )
        GROUP BY order_year
    """,
    tags=("R3",),
)
def union_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 union of per-year partitions (the notebook's concat loop over
    yearly CSVs). unionByName keeps it schema-safe; at scale this is what
    reading a partitioned table already does — partition pruning turns the
    two filters into two directory scans."""
    orders = load_table(spark, sf_dir, "orders")
    years = [
        orders.filter(F.year("o_orderdate") == y).select(
            F.year("o_orderdate").cast("int").alias("order_year")
        )
        for y in (1995, 1996)
    ]
    return reduce(DataFrame.unionByName, years).groupBy("order_year").agg(F.count("*").alias("n_orders"))


@register(
    "except_skills",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    tags=("R4",),
)
def except_skills(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 set difference ('skills present in year A but not B'): customers
    who ordered in 1995 but not in 1996. EXCEPT DISTINCT — Spark's
    subtract()."""
    orders = load_table(spark, sf_dir, "orders")

    def custs(year: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == year).select("o_custkey")

    return custs(1995).subtract(custs(1996))


@register(
    "nations_per_region_agg",
    oracle="""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("R-ext",),
)
def nations_per_region_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation (LISTAGG): collect_list is
    order-nondeterministic under parallelism, so the engine-portable form
    is collect_list → array_sort → array_join — same canonical order the
    oracle's ORDER BY clause pins. At scale beware per-group result size
    (this is a display op, not a data op)."""
    nation = load_table(spark, sf_dir, "nation")
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )
