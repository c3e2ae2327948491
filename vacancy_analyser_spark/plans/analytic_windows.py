"""Analytic window functions (SURVEY.md §2 O-ops/A-ops extension).

The notebook's trend analysis (cells 16-19: per-year series, deltas,
top-N-over-time) implies the full ANSI window surface beyond row_number:
lead/lag, sliding frames, ntile, percentiles. Registered here with DuckDB
oracles; every query keeps the float discipline of functions/numeric.py
(fixed-point frame sums; *discrete* percentiles so outputs are input
values, never interpolated arithmetic that could differ in the last bit).

Scale notes inline per query — the recurring theme: windows partitioned by
a key (customer, user) parallelize for free; global windows (ntile over
everything) serialize one sort partition and at 100 TB should be replaced
by range partitioning + per-range offsets, or approximate quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


@register(
    "order_gap_days",
    oracle="""
        SELECT o_custkey, o_orderkey,
               date_diff('day',
                         CAST(lag(o_orderdate) OVER w AS DATE),
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window-ext",),
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag: days since the customer's previous order (NULL for the
    first). One shuffle on the partition key, sort within partitions;
    the per-key history is tiny so this scales linearly with customers."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag("o_orderdate").over(w).cast("date")
        ).alias("gap_days"),
    )


@register(
    "moving_sum_value",
    oracle="""
        SELECT user_id, event_id,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / 1000000 AS mov_sum
        FROM events
    """,
    tags=("window-ext",),
)
def moving_sum_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-row frame sum per user — the batch shape of a trailing
    window metric. Fixed-point inside the frame keeps the sum associative,
    so Spark's running-frame evaluation and DuckDB's agree bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    mov = F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).over(w)
    return events.select(
        "user_id",
        "event_id",
        (mov.cast("double") / 1_000_000).alias("mov_sum"),
    )


@register(
    "ntile_quartiles",
    oracle="""
        WITH t AS (
            SELECT o_totalprice,
                   ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
            FROM orders
        )
        SELECT tile,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS sum_price
        FROM t GROUP BY tile
    """,
    tags=("window-ext",),
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) price quartiles with per-tile counts and fixed-point sums.

    The global ORDER BY forces a single sort partition — acceptable for a
    driver-scale result, WRONG as a pattern at 100 TB: there, compute
    approx quartile bounds first (approx_percentile / range sampling) and
    bucket by comparison, which is embarrassingly parallel."""
    orders = load_table(spark, sf_dir, "orders")
    tile = F.ntile(4).over(Window.orderBy("o_totalprice", "o_orderkey"))
    scaled = F.sum(F.round(F.col("o_totalprice") * 1_000_000).cast("bigint"))
    return (
        orders.select("o_totalprice", tile.alias("tile"))
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_orders"),
            (scaled.cast("double") / 1_000_000).alias("sum_price"),
        )
    )


@register(
    "price_percentiles",
    oracle="""
        WITH r AS (
            SELECT o_orderpriority, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
            FROM orders
        )
        SELECT o_orderpriority,
               MIN(CASE WHEN rn = GREATEST(1, CAST(ceil(0.25 * cnt) AS BIGINT)) THEN o_totalprice END) AS p25,
               MIN(CASE WHEN rn = GREATEST(1, CAST(ceil(0.50 * cnt) AS BIGINT)) THEN o_totalprice END) AS p50,
               MIN(CASE WHEN rn = GREATEST(1, CAST(ceil(0.90 * cnt) AS BIGINT)) THEN o_totalprice END) AS p90
        FROM r GROUP BY o_orderpriority
    """,
    tags=("window-ext",),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p25/p50/p90) per order priority.

    Discrete (type-1) percentiles return actual input values — unlike
    interpolated percentile_cont, whose lower+(higher-lower)*frac
    arithmetic can differ between engines in the last bit. One windowed
    rank pass + one aggregate; partitioned by the group key, so it
    parallelizes. At 100 TB prefer approx_percentile unless exactness is
    a requirement."""
    orders = load_table(spark, sf_dir, "orders")
    wr = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    r = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )

    def pick(p: float, name: str):
        target = F.greatest(F.lit(1), F.ceil(p * F.col("cnt")).cast("bigint"))
        return F.min(F.when(F.col("rn") == target, F.col("o_totalprice"))).alias(name)

    return r.groupBy("o_orderpriority").agg(pick(0.25, "p25"), pick(0.50, "p50"), pick(0.90, "p90"))
