"""J-ops: joins (SURVEY.md §2.3).

Join-strategy discipline for 100 TB:
- explicit broadcast() hints ONLY for tables bounded by the schema
  (region, nation, the ≤500-row taxonomy, 1-row scalars) — never shuffle
  a fact table to meet one of those. Tables that SCALE WITH THE DATA
  (customer, supplier, part, per-key aggregates) carry no hint: AQE
  promotes them to broadcast from runtime sizes at small SF and keeps
  sort-merge at 100 TB, where a forced broadcast of a billion-row side
  would OOM every executor.
- fact⋈fact equi-joins → sort-merge with AQE skew splitting; co-partition by
  writing both sides bucketed on the key when the join repeats.
- anti/semi joins → Spark's dedicated left_anti / left_semi (no row
  duplication, early-out per match).
- non-equi range join → keep the small side broadcast so the nested-loop is
  per-partition over the fact; at real scale rewrite as band-key equi-join
  (see range_join_salary docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg, davg_sql, dsum, dsum_sql
from ..io import load_table
from .registry import register


@register(
    "employer_enrich_join",
    oracle="""
        SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    tags=("S3", "J4"),
)
def employer_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/J4 enrichment join: the reference does one HTTP GET per vacancy to
    fetch employer industries (get_vacancies.py:136-148). Engine version:
    fetch the employer dim once and join it in — never per-row I/O inside
    the hot path. No broadcast hint: customer SCALES WITH THE DATA (module
    header discipline), so AQE promotes it to broadcast at small SF and
    keeps sort-merge at 100 TB where a forced broadcast would OOM."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


@register(
    "anti_join_removed",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        )
    """,
    tags=("J2",),
)
def anti_join_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 anti-join disappearance detection (feeder_postgres.py:181-192: ids
    in the DB but absent from today's snapshot → removed). The snapshot side
    is 'orders currently in Pending status'; left_anti streams — no row
    duplication, no post-filter."""
    customer = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(pending, customer.c_custkey == pending.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "broadcast_synonym_join",
    oracle="""
        SELECT l_orderkey, l_linenumber, p_name, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    tags=("J3",),
)
def broadcast_synonym_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 broadcast dimension join (notebook cells 26-27 map every term
    through the synonym dict — a hand-rolled broadcast hash join). The
    notebook's actual synonym dim (≤430 rows, operators/taxonomy.py)
    deserves a forced broadcast(); TPC-H `part` scales with SF, so it
    carries NO hint — AQE broadcasts it at small SF (one pass over the
    fact, zero fact shuffle) and falls back to sort-merge at a scale where
    a forced broadcast would OOM."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return li.join(part, li.l_partkey == part.p_partkey, "inner").select(
        "l_orderkey", "l_linenumber", "p_name", "p_brand"
    )


@register(
    "star_join_3way",
    oracle=f"""
        SELECT r_name,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("J5",),
)
def star_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 multi-way star join: revenue per region over
    lineitem⋈orders⋈customer⋈nation⋈region. lineitem⋈orders is the only
    fact⋈fact edge (sort-merge + AQE); customer/nation/region broadcast.
    Dynamic partition pruning applies when the fact is partitioned on the
    join key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(dsum(revenue).alias("revenue"), F.count("*").alias("n_lines"))
    )


@register(
    "semi_join",
    oracle="""
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49.0
        )
    """,
    tags=("J6",),
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 left-semi: orders having at least one bulk line — the 'vacancy has
    at least one skill in group X' pattern (notebook cell 27 semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    bulk = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49.0)
    return orders.join(bulk, orders.o_orderkey == bulk.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderpriority"
    )


#: Dispatch boundary for the interval join: up to this many bands the
#: broadcast nested-loop (m predicate evaluations per fact row, zero
#: shuffle) beats the grid plan's explode+equi-join constant; past it the
#: O(n·m) scan loses to the O(n + m·cells) band-key hash join. The probe
#: that decides is one dim-table aggregate (count + mean span).
RANGE_BNLJ_MAX_BANDS = 1024
#: Grid side broadcast bound: the exploded (band_id, lo, hi, band_cell)
#: table averages ~2 cells/band at the derived width, so up to ~1M bands
#: it stays a sane broadcast; past that the hint is dropped and the
#: equi-join shuffles both sides on band_cell (still a hash join, never
#: the quadratic NLJ).
RANGE_GRID_BROADCAST_MAX_BANDS = 1_000_000

#: Last range_join dispatch decision, for observability (the
#: LAST_SPARSE_DISPATCH pattern — read by tests/harnesses right after a
#: single-threaded dispatch, never control flow).
LAST_RANGE_DISPATCH: dict = {}


def range_join(fact: DataFrame, bands: DataFrame, value_col: str) -> DataFrame:
    """Interval/containment join of a fact column into ``bands`` (band_id,
    lo, hi half-open [lo, hi)), with the physical plan chosen from a
    measured probe of the BAND table (one aggregate over the dim side —
    trivial next to either plan):

    - few bands (≤ RANGE_BNLJ_MAX_BANDS): broadcast nested-loop — m
      predicate evaluations per fact row, no shuffle, linear in the fact.
    - many bands: the band-key GRID plan. Derive a grid width from the
      mean band span (physical-only: the width changes the candidate
      topology, never the result — a residual lo ≤ v < hi re-check runs
      after the equi-join). Each band explodes to the grid cells its
      interval overlaps (~span/width + 1 ≈ 2 rows/band at the derived
      width); each fact row maps to exactly ONE cell (floor(v/width)), so
      the equi-join on band_cell produces each matching (row, band) pair
      exactly once — no dedup pass. Turns O(n·m) into O(n + n·hits): a
      hash join against a broadcast grid (or a shuffled hash join past
      the broadcast bound), the shape that survives skewed/many bands at
      100 TB.

    Returns the joined frame (fact columns + band_id); callers aggregate.
    Both plans are result-identical (tested, forced-regime)."""
    stats = bands.agg(
        F.count("*").alias("m"), F.avg(F.col("hi") - F.col("lo")).alias("span")
    ).first()
    m, avg_span = stats["m"], stats["span"]
    v = F.col(value_col)
    LAST_RANGE_DISPATCH.clear()
    LAST_RANGE_DISPATCH.update({"n_bands": m, "avg_span": avg_span})
    if m <= RANGE_BNLJ_MAX_BANDS:
        LAST_RANGE_DISPATCH["plan"] = "broadcast_nlj"
        b = F.broadcast(bands)
        return fact.join(b, (v >= b.lo) & (v < b.hi), "inner")
    # grid regime: width from the mean span (floor at a sane default when
    # all spans are zero/degenerate)
    w = float(avg_span) if avg_span and avg_span > 0 else 1.0
    LAST_RANGE_DISPATCH.update({"plan": "grid_equi", "width": w})
    cells = F.sequence(
        F.floor(F.col("lo") / w).cast("long"), F.floor(F.col("hi") / w).cast("long")
    )
    grid = bands.withColumn("band_cell", F.explode(cells))
    if m <= RANGE_GRID_BROADCAST_MAX_BANDS:
        grid = F.broadcast(grid)
    return (
        fact.withColumn("band_cell", F.floor(v / w).cast("long"))
        .join(grid, "band_cell")
        .filter((v >= F.col("lo")) & (v < F.col("hi")))
        .drop("band_cell")
    )


@register(
    "range_join_salary",
    oracle=f"""
        WITH bands AS (
            SELECT DISTINCT p_size AS band_id,
                   (p_size - 1) * 10.0 AS lo,
                   p_size * 10.0 AS hi
            FROM part
        )
        SELECT band_id, COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id
    """,
    tags=("J7",),
)
def range_join_salary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 range/interval join — salary-band containment
    (salary_from <= x <= salary_to over feeder_postgres.py:67-68's model),
    through the measured range_join dispatch: here m≈50 distinct bands, so
    the probe picks the broadcast NLJ; the many-band regime is the grid
    equi-join, driver-checked separately as range_join_banded."""
    events = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    bands = part.select(
        F.col("p_size").alias("band_id"),
        ((F.col("p_size") - 1) * 10.0).alias("lo"),
        (F.col("p_size") * 10.0).alias("hi"),
    ).distinct()
    return (
        range_join(events, bands, "value")
        .groupBy("band_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


@register(
    "range_join_banded",
    oracle=f"""
        WITH bands AS (
            -- literals cast to DOUBLE: DuckDB parses bare 0.1 as DECIMAL
            -- (exact tenths) while Spark computes IEEE doubles — band
            -- edges must drift identically on both engines
            SELECT p_partkey AS band_id,
                   (p_partkey % 4900) * CAST(0.1 AS DOUBLE) AS lo,
                   (p_partkey % 4900) * CAST(0.1 AS DOUBLE)
                       + CAST(0.1 AS DOUBLE)
                       + (p_partkey % 13) * CAST(0.05 AS DOUBLE) AS hi
            FROM part
        )
        SELECT band_id, COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id
    """,
    tags=("J7", "ext-join"),
)
def range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MANY-BAND regime of the interval join, driver-checked: one band
    per part row (|part| ≥ 2000 at the driver's sf — past
    RANGE_BNLJ_MAX_BANDS, so the probe selects the grid equi-join; the
    plan is asserted NLJ-free in tests/test_joins_banded.py), with
    arbitrary overlapping intervals (lo from the key mod a 490-unit range,
    span 0.1-0.75) so nothing about the grid plan depends on bands being
    disjoint or uniform. The oracle is engine-blind — the same containment
    predicate — because the grid is physical topology only: every
    candidate passes the residual lo ≤ v < hi re-check.

    At 100 TB this is the shape that holds: the fact maps to one cell per
    row (no expansion), the band table explodes ~2× and broadcasts (or
    hash-shuffles past ~1M bands), and the join is a hash probe instead of
    m interval tests per row."""
    events = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    lo = (F.col("p_partkey") % 4900) * 0.1
    hi = (F.col("p_partkey") % 4900) * 0.1 + 0.1 + (F.col("p_partkey") % 13) * 0.05
    bands = part.select(
        F.col("p_partkey").alias("band_id"), lo.alias("lo"), hi.alias("hi")
    )
    return (
        range_join(events, bands, "value")
        .groupBy("band_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


@register(
    "asof_state_at_date",
    oracle="""
        SELECT user_id, event_id, ts, value
        FROM (
            SELECT user_id, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        ) WHERE rn = 1
    """,
    tags=("J8",),
)
def asof_state_at_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 as-of join: state of each entity as of time T — the reference's
    'vacancy state at date D' over added_at/updated_at/removed_at
    (feeder_postgres.py:92-94). One window pass per key; deterministic
    tie-break on event_id."""
    events = load_table(
        spark, sf_dir, "events", ts_filters=[("ts", "<=", "2024-01-15 00:00:00")]
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events
        .select("user_id", "event_id", "ts", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    tags=("J5",),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders by revenue for one segment.

    The full relational gauntlet in one query — selective filters on three
    tables (each pushed to its own scan), a dim-filtered semi-ish join
    (customer filtered BEFORE joining, so the segment predicate prunes the
    join input, not the join output), fact⋈fact join, grouped fixed-point
    aggregation, and TakeOrderedAndProject top-k (per-partition heaps, no
    global sort). Deterministic tie-break keeps the LIMIT stable across
    partitionings."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer
        .join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "disjunctive_filter_revenue",
    oracle=f"""
        SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 20
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 10 AND 40
               AND l_quantity BETWEEN 20 AND 45)
    """,
    tags=("J3", "ext"),
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs mixed-table predicate.

    The optimizer showcase here is partial pushdown of a disjunction:
    Catalyst factors the part-only conjuncts out of each OR branch and
    pushes `(brand=a AND size..) OR (brand=b AND size..) OR ..` down to the
    part scan, and the l_quantity-only disjunction `(1..15) OR (10..30) OR
    (20..45)` down to the lineitem scan — so both inputs shrink BEFORE the
    join and only the cross-table residual is evaluated after. Written as
    one boolean expression on the joined frame; the factoring is the
    optimizer's job (plan-asserted), not hand-split."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b = F.col("p_brand")
    sz = F.col("p_size")
    q = F.col("l_quantity")
    pred = (
        ((b == "Brand#11") & sz.between(1, 10) & q.between(1, 15))
        | ((b == "Brand#23") & sz.between(5, 20) & q.between(10, 30))
        | ((b == "Brand#34") & sz.between(10, 40) & q.between(20, 45))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n_lines"))
    )


@register(
    "nation_trade_volume",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(year FROM l_shipdate) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("J5", "ext"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations, by direction and year.

    Role-playing dimension: the nation table joins in TWICE under different
    aliases (supplier's nation vs customer's nation) — the same parquet is
    broadcast for both roles. supplier and nation are broadcast (tiny);
    lineitem⋈orders is the one real shuffle. The nation-pair disjunction
    can only be evaluated after both roles are attached, but each
    broadcast join is a no-shuffle pass so the 'late' filter costs one
    codegen stage, not an exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(rev).alias("revenue"))
    )


@register(
    "local_supplier_volume",
    oracle=f"""
        SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    tags=("J5", "ext"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier are
    local to each other, one region, one year.

    The distinguishing condition is c_nationkey = s_nationkey — an equality
    BETWEEN two dims reached through different fact paths. It rides the
    supplier join as a second conjunct, costing no extra exchange beyond
    that join's own. The region filter prunes customers through a
    broadcast nation⋈region dim (bounded, hinted) BEFORE the customer
    join, so non-ASIA customers never reach the fact join; supplier and
    customer are left to AQE — broadcast at small SF, sort-merge at
    100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    customer = load_table(spark, sf_dir, "customer").join(
        asia_nations, F.col("c_nationkey") == F.col("n_nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
    )


@register(
    "market_share",
    oracle=f"""
        SELECT o_year,
               CAST({dsum_sql("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END")}
                    / {dsum_sql('volume')} AS DOUBLE) AS mkt_share
        FROM (
            SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
    """,
    tags=("J5", "ext"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part revenue sold into
    AMERICA, by order year.

    Numerator and denominator come out of ONE pass (CASE-gated fixed-point
    sums) — the share is never two queries. Like nation_trade_volume, the
    nation dim role-plays twice: once to restrict the CUSTOMER side to the
    region (a semi-filtering broadcast join applied before the fact join)
    and once to label the SUPPLIER side (carried into the aggregate). part
    is filtered to the type before its join, so the selective p_type
    predicate prunes lineitem at the first join; how the filtered part
    moves (broadcast vs exchange) is AQE's call from its runtime size."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    america_keys = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("cust_nkey")
        )
    )
    customer = load_table(spark, sf_dir, "customer").join(
        america_keys, F.col("c_nationkey") == F.col("cust_nkey")
    )
    supp_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    gated = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supp_nation, F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(gated) / dsum(vol)).cast("double").alias("mkt_share"))
    )


@register(
    "returned_item_report",
    oracle=f"""
        SELECT c_custkey, c_name,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               c_acctbal, n_name
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("J5", "O2", "ext"),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in one
    quarter.

    Both selective predicates (returnflag on lineitem, date band on orders)
    are pushed to their scans before the fact⋈fact shuffle; the customer
    join then moves only the surviving quarter. TopK rides a total order
    (revenue is a fixed-point sum; c_custkey breaks ties) so LIMIT 20 picks
    the same rows on both engines. At cluster scale Spark executes
    orderBy+limit as per-partition TakeOrdered + single-reduce merge —
    no global sort materializes."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "product_type_profit",
    oracle=f"""
        SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
               {dsum_sql('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')} AS profit
        FROM lineitem
        JOIN part     ON p_partkey   = l_partkey
        JOIN supplier ON s_suppkey   = l_suppkey
        JOIN orders   ON o_orderkey  = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%rod%'
        GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    tags=("J5", "ext"),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product line, by supplier nation and
    order year (the testdata has no partsupp.ps_supplycost, so cost is a
    deterministic 60% of the part's retail price per unit).

    Four joins; nation (bounded) is hinted broadcast, part and supplier
    are AQE-sized. The p_name substring filter shrinks part before it
    prunes lineitem at the first join, so non-matching lines never reach
    the fact join.
    The profit expression is written with identical association on both
    engines so the fixed-point rounding sees the same double."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("rod"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit).alias("profit"))
    )


@register(
    "parts_supplier_relationship",
    oracle="""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("J2", "A8", "ext"),
)
def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) bucket, excluding one brand and a denylist of
    suppliers (low account balance plays the "customer complaints" role;
    lineitem plays partsupp as the part↔supplier bridge).

    NOT IN over a non-null key is a left_anti join; the denylist is a
    filtered fraction of supplier, so AQE broadcasts it at this scale and
    the anti probe is a per-row hash lookup. The part-side predicates
    prune their side before it gates lineitem. The only shuffle is the final distinct-count aggregate, which
    Spark executes as two cascaded hash aggregates (dedup on the full key,
    then count) — both partial-aggregated map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    denylist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000.0)
        .select("s_suppkey")
    )
    return (
        li.join(denylist, li.l_suppkey == denylist.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "skew_salted_enrich",
    oracle=f"""
        WITH dim AS (
            SELECT event_type,
                   COUNT(*) AS type_n,
                   {davg_sql('value')} AS type_avg
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value, d.type_n, d.type_avg
        FROM events e JOIN dim d USING (event_type)
    """,
    tags=("ext", "skew"),
)
def skew_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key enrichment via the salted-join operator
    (operators/skew.py): every event joins its event-type profile, and
    event_type is the canonical hot key — 5 distinct values, each holding
    ~20% of the fact, so a plain shuffle join streams a fifth of the
    table through ONE task per key and AQE's skew splitting cannot help
    (it subdivides partitions, not single-key hash groups on the build
    side). Salting spreads each hot key over n_salts shuffle groups by
    joining on (key, salt) with the dim replicated per salt — the
    standard fix when the dim scales past the broadcast threshold (a
    million-employer dimension under a power-law employer_id at 100 TB;
    module header of operators/skew.py).

    Salting is result-identical to the plain join by construction — the
    oracle IS the plain join. The merge pin keeps the demonstrated plan
    the distributed shape the operator exists for (at this SF the 5-row
    dim would broadcast and no salted Exchange would survive); the plan
    guard in test_plan_shapes.py asserts the Exchange partitions on
    (event_type, __salt)."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(
        F.count("*").alias("type_n"), davg("value").alias("type_avg")
    )
    return salted_join(ev, dim, on="event_type", n_salts=8, strategy="merge").select(
        "event_id", "event_type", "value", "type_n", "type_avg"
    )
