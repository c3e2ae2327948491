"""Correlated / scalar subquery shapes (decorrelation family).

The reference's per-row SQL lookups (feeder_postgres.py:138 — one SELECT per
CSV row) are the degenerate form of a correlated subquery: for each outer
row, evaluate an inner query. At engine scale that pattern must be
*decorrelated* into joins against pre-aggregated sides — never a per-row
probe. This module registers the classic decorrelation shapes (TPC-H
Q13/Q15/Q17/Q18/Q22 silhouettes, adapted to the testdata star schema) and
implements each as the decorrelated plan we want Catalyst to reach:

- scalar aggregate subquery      → 1-row aggregate, broadcast cross join
- correlated per-group aggregate → groupBy on the correlation key, join back
- IN (SELECT ... HAVING ...)     → aggregate once, use it as the join input
- NOT EXISTS                     → left_anti join

Scale notes (100 TB): every shape here aggregates the big side FIRST —
the join then moves only group-level rows (orders, parts, suppliers), not
lineitems. The 1-row scalar sides are broadcast by construction; nothing
shuffles a fact table to answer a scalar comparison.

Float discipline: any aggregate that feeds a *comparison* (threshold, max)
goes through the fixed-point helpers so row membership can't flip on a
last-bit difference between engines (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg, davg_sql, dsum, dsum_sql
from ..io import load_table
from .registry import register


@register(
    "small_qty_revenue",
    oracle=f"""
        SELECT CAST({dsum_sql('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11'
          AND l_quantity < (
              SELECT 0.2 * {davg_sql('l_quantity')}
              FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey
          )
    """,
    tags=("J1", "ext"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand.

    The correlated scalar subquery (per-part 20%-of-average threshold) is
    decorrelated by hand into the plan Catalyst's RewriteCorrelatedScalarSubquery
    would produce: aggregate lineitem once by l_partkey, join the per-part
    thresholds back (AQE-sized: the threshold table scales with |part|, so
    it must not carry a forced broadcast hint), filter, aggregate. The per-part aggregate runs
    over the FULL lineitem (matching the oracle's inner query, which is not
    brand-filtered), but only threshold rows — one per part — flow into the
    join; the brand filter prunes the part dim before it touches lineitem.
    Threshold avg uses the fixed-point davg so the `<` comparison can't flip
    on a last-bit float difference between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    thresholds = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(brand_parts, li.l_partkey == brand_parts.p_partkey)
        .join(thresholds.withColumnRenamed("l_partkey", "t_partkey"),
              F.col("p_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"))
    )


@register(
    "large_order_customers",
    oracle=f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               big.sum_qty AS sum_qty
        FROM (
            SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
        ) big
        JOIN orders   ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
    """,
    tags=("J1", "A7", "ext"),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the very largest orders.

    The textbook form is `o_orderkey IN (SELECT l_orderkey ... HAVING
    SUM(qty) > T)` followed by re-aggregating the same sum in the outer
    query. Decorrelated: aggregate lineitem ONCE, filter on the aggregate,
    and reuse that row as both the semi-join input and the output column —
    lineitem is scanned a single time and the join moves only the ~1% of
    orders above the threshold (250 ≈ the 99th percentile of per-order
    quantity)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@register(
    "customer_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) per_cust
        GROUP BY c_count
    """,
    tags=("J4", "A1", "ext"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of non-urgent order counts per customer.

    Count-of-counts over a filtered LEFT join — the join predicate (not a
    WHERE) keeps order-less customers in the c_count=0 bucket, which a
    post-join filter would silently drop. Two cascaded aggregations: the
    first shuffles on c_custkey, the second on the (tiny) count domain —
    the classic two-level shrink where each stage's output is orders of
    magnitude smaller than its input."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "idle_rich_customers",
    oracle=f"""
        SELECT c_nationkey, COUNT(*) AS numcust,
               {dsum_sql('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        GROUP BY c_nationkey
    """,
    tags=("J2", "ext"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent orders.

    Two decorrelations in one query: the scalar avg subquery becomes a 1-row
    aggregate cross-joined in (broadcast nested loop over one row — free),
    and NOT EXISTS becomes a left_anti join against the pre-filtered urgent
    snapshot. The anti-join side is filtered BEFORE the join so only urgent
    orders shuffle. Threshold avg is fixed-point so membership at the
    boundary matches the oracle exactly."""
    customer = load_table(spark, sf_dir, "customer")
    threshold = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


@register(
    "top_supplier_revenue",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("A3", "ext"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum total revenue.

    Scalar MAX over an aggregated view, compared back against the same view.
    Naive decorrelation (aggregate → MAX → cross join back) plans TWO
    lineitem scans because the pushed null-filters differ between the
    subtrees and Spark can't reuse the exchange (probed: 3 parquet scans,
    no ReusedExchange). The r2 shape avoided the rescan with an
    unpartitioned window over the aggregated table — but that serializes
    |supplier| rows (~1e8 at extreme SF) into one partition. The r3 shape
    gets both: PERSIST the per-supplier revenue (small relative to
    lineitem, stays distributed), reduce the cached table to a one-row MAX,
    and broadcast it back with a scalar cross join — lineitem scanned once,
    nothing ever single-partition. Revenue goes through fixed-point sums so
    the equality against MAX is exact — with raw double sums, ties at the
    top could differ between engines.

    Cache lifecycle: unpersist cannot be sequenced into a lazily-returned
    plan, but the cache manager canonicalizes — repeated invocations
    (bench min-of-3, the driver window) reuse ONE aggregate-sized entry
    per distinct plan rather than accumulating copies, and LRU eviction
    bounds the residue across a long session. important_part_value shares
    this pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    ).persist()
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "order_priority_check",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    tags=("J6", "ext"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count of one quarter's orders, by priority, that had
    at least one late line (shipped >60 days after the order date — the
    testdata has no commit/receipt dates, so order-to-ship latency plays
    the lateness role).

    The correlated EXISTS decorrelates to a left_semi join whose condition
    carries the non-equi lateness conjunct alongside the key equality: the
    semi join early-outs per order on the first late line and duplicates
    nothing. The quarter band prunes the orders scan first, so the semi
    probe side is one quarter of orders, not the full table."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "waiting_suppliers",
    oracle="""
        WITH order_stats AS (
            SELECT l_orderkey AS ok,
                   MAX(l_shipdate) AS max_ship,
                   COUNT(DISTINCT l_suppkey) AS n_supp
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT s_name, COUNT(DISTINCT l_orderkey) AS numwait
        FROM lineitem
        JOIN order_stats ON l_orderkey = ok
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND l_shipdate = max_ship
          AND n_supp >= 2
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    tags=("J6", "ext"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers from one nation who were the LAST to ship
    on multi-supplier orders (the testdata lacks commit/receipt dates, so
    "kept the order waiting" = shipped on the order's max ship date while
    at least one other supplier was involved).

    The reference Q21 uses two correlated EXISTS over lineitem; the oracle
    decorrelates them into a per-order aggregate CTE joined back — TWO
    lineitem passes. The Spark plan does better: both per-order stats
    (max ship date, distinct-supplier count) come from window functions
    over the same l_orderkey partitioning, so lineitem is scanned ONCE and
    shuffled ONCE; the one-nation supplier label joins only the few
    surviving last-to-ship lines (AQE broadcasts it here). countDistinct at the end guards
    against a supplier having several lines at the max date."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    ).filter((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = supplier.join(nation, supplier.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        flagged.join(supp, flagged.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "important_part_value",
    oracle=f"""
        WITH natval AS (
            SELECT l_partkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS partkey, value
        FROM natval
        WHERE value > (SELECT {dsum_sql('value')} * 0.001 FROM natval)
    """,
    tags=("J6", "A5", "ext"),
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through one nation's
    suppliers exceeds a fraction of that nation's total (lineitem value
    plays partsupp supplycost*availqty).

    The scalar subquery compares each group against an aggregate OF the
    same aggregation — naive decorrelation recomputes the whole
    lineitem⋈supplier subtree for the threshold (probed: 6 parquet scans,
    no ReusedExchange). Like top_supplier_revenue, the r3 shape persists
    the aggregated per-part values (|parts one nation supplies| rows, tiny
    next to lineitem, still distributed), reduces the cache to a one-row
    total, and broadcasts it back — one lineitem scan, no unpartitioned
    window serializing the per-part table. Both the per-part values and
    the global sum are fixed-point, so threshold membership at the
    boundary is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    natval = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    ).persist()
    total = natval.agg(dsum("value").alias("total"))
    return (
        natval.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("total") * 0.001)
        .select("partkey", "value")
    )


@register(
    "potential_part_promotion",
    oracle="""
        WITH cold_parts AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'cold%'
        ),
        shipped AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              AND l_partkey IN (SELECT p_partkey FROM cold_parts)
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM (
                  SELECT l_suppkey, qty,
                         SUM(qty) OVER (PARTITION BY l_partkey) AS part_total
                  FROM shipped
              ) dominated
              WHERE qty > 0.3 * part_total
          )
    """,
    tags=("J6", "ext"),
)
def potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers from one nation who dominated a product
    line's shipments in one year (shipped >30% of a cold-named part's
    total; shipped quantity plays partsupp availqty).

    Three nested INs in the textbook form; here each becomes the cheap
    side of a semi join. The cold-part id list broadcasts as a left_semi
    gate on lineitem BEFORE the aggregate, so only the product line's rows
    shuffle. Per-(part,supplier) totals and the per-part denominator come
    from one aggregation plus a window over it — no join-back, no second
    lineitem pass. Quantity sums are integer-valued doubles (exact at any
    accumulation order), so no fixed-point detour is needed for the 30%
    comparison."""
    cold = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("cold"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cold, F.col("l_partkey") == cold.p_partkey, "left_semi")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    dominant = (
        shipped.withColumn(
            "part_total", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("qty") > F.lit(0.3) * F.col("part_total"))
        .select("l_suppkey")
    )
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return supplier.join(dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi")


@register(
    "min_cost_supplier",
    oracle="""
        WITH offers AS (
            SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_price
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ),
        eur AS (
            SELECT l_partkey, unit_price, s_name, s_acctbal, n_name
            FROM offers
            JOIN supplier ON s_suppkey   = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_price
        FROM eur JOIN part ON p_partkey = l_partkey
        WHERE p_size = 10
          AND unit_price = (
              SELECT MIN(e2.unit_price) FROM eur e2
              WHERE e2.l_partkey = eur.l_partkey
          )
    """,
    tags=("J6", "O2", "ext"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-10 part, the European supplier(s)
    offering the best unit price (min l_extendedprice/l_quantity over that
    part-supplier's lines plays partsupp ps_supplycost).

    The correlated MIN re-scans the offer table per outer row in textbook
    form. Decorrelated: offers aggregate once per (part, supplier); the
    part filter and the Europe supplier filter both apply BEFORE the
    per-part window min, shrinking its input to the few surviving parts —
    legal because the correlated min is per-part and unaffected by which
    parts/suppliers the outer query keeps. The window then replaces a
    second scan + join-back; ties at the min (same unit price from two
    suppliers) are preserved by the equality filter exactly as the SQL
    does. unit_price is a double quotient of identical inputs on both
    engines, so the MIN-equality cannot drift."""
    li = load_table(spark, sf_dir, "lineitem")
    # r12 (guide §3.2): the p_size=10 filter keeps ~2% of parts, and the
    # correlated MIN is per-part, so pruning lineitem to surviving partkeys
    # BEFORE the (partkey, suppkey) aggregate is result-identical — offers
    # for other parts only ever fed the inner part join that discards them.
    # The semi-join is unhinted: AQE broadcasts the filtered part keys at
    # bench SFs (scan-side prune, the aggregate exchange shrinks ~50x); at
    # 100 TB the key set scales with |part| and AQE keeps sort-merge, where
    # the post-join aggregate reuses the semi-join's partkey partitioning
    # (partial-key clustering) and the runtime Bloom filter can prune the
    # scan — never a forced broadcast of a scaling side.
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey")
    )
    offers = (
        li.join(part_keys, li.l_partkey == part_keys.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    eur_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part10 = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey", "p_type")
    )
    w = Window.partitionBy("l_partkey")
    return (
        offers.join(part10, offers.l_partkey == part10.p_partkey)
        .join(eur_supp, offers.l_suppkey == eur_supp.s_suppkey)
        .withColumn("min_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_price"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_price")
    )
