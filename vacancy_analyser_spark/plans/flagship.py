"""Flagship query (driver smoke entry; SURVEY.md §7 M1).

The notebook's core question — "top entities by share, per period"
(cells 27-32: filter → explode → join dim → count → % of total → top-N) —
expressed on the star schema: revenue share per region-year, ranked.
Exercises the whole batch spine: scan → filter → broadcast+shuffle joins →
partial/final agg → window → top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_sql
from ..io import load_table
from .registry import register


@register(
    "flagship_region_share",
    oracle=f"""
        WITH rev AS (
            SELECT r_name,
                   CAST(year(o_orderdate) AS INT) AS order_year,
                   {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, year(o_orderdate)
        )
        SELECT r_name, order_year, revenue,
               CAST(revenue * 100.0 /
                    CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER (PARTITION BY order_year) AS DOUBLE)
                    AS DOUBLE) AS pct_of_year,
               CAST(row_number() OVER (PARTITION BY order_year
                                       ORDER BY revenue DESC, r_name) AS INT) AS rank_in_year
        FROM rev
    """,
    tags=("flagship",),
)
def flagship_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per (region, year) with rank — the engine's M1 slice.

    Physical shape worth keeping at 100 TB: fact⋈fact joins stay
    sort-merge (AQE-skew-safe), the bounded dims (nation, region) carry
    explicit broadcast hints, customer is left to AQE (broadcast from
    runtime sizes at small SF, exchange at 100 TB where it is ~1.5B rows),
    two-phase agg down to |regions|×|years| rows, then windows over that
    tiny aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(dsum(revenue_expr).alias("revenue"))
    )
    by_year = Window.partitionBy("order_year")
    rank_w = Window.partitionBy("order_year").orderBy(F.col("revenue").desc(), F.col("r_name"))
    year_total = F.sum(F.col("revenue").cast("decimal(18,6)")).over(by_year).cast("double")
    return rev.select(
        "r_name",
        "order_year",
        "revenue",
        (F.col("revenue") * 100.0 / year_total).cast("double").alias("pct_of_year"),
        F.row_number().over(rank_w).cast("int").alias("rank_in_year"),
    )
