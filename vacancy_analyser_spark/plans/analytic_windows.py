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


#: approx_percentile accuracy for the boundary bands: rank error ≤ n/ACC,
#: band margin ±MARGIN/ACC keeps a 2× safety factor over the guarantee.
_NTILE_ACC = 10_000
_NTILE_MARGIN = 4.0

#: Size dispatch (same pattern as the Jaccard regime chooser,
#: plans/dedup.py): at or below this row count the plain ntile() window
#: runs — ONE job whose single sort partition holds ≤ ~64 MB of
#: (double, bigint) keys, trivially safe and 2-3× faster locally than the
#: 4-pass boundary plan (measured at sf0.1: 0.36s vs 1.02s, PLANS.md).
#: Above it the partition-parallel boundary-band plan takes over — the
#: sort-everything shape stops being safe long before it stops being
#: fast, and 4M rows is far below where a single 128 MB-budget task
#: would struggle, so the dispatch errs toward the scale-safe plan.
_NTILE_SMALL_N = 4_000_000


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
    """ntile(4) price quartiles with per-tile counts and fixed-point sums,
    size-dispatched like the Jaccard planner: at or below _NTILE_SMALL_N
    rows the plain ntile() window runs (one job; the global sort fits one
    task comfortably), above it the partition-parallel boundary-band plan
    below — exact at any scale, never a table-sized single-partition sort.
    Both paths replicate identical ntile arithmetic (pinned equal in
    tests/test_physical.py), so the dispatch is a physical choice only.

    Partition-parallel exact plan (the large-n path):

    1. one scan: n = count + approx_percentile band pivots around the three
       ntile boundary ranks (rank error ≤ n/ACC by the sketch guarantee);
    2. one scan: exact counts of rows strictly below each band's low pivot;
    3. boundary pick: the three boundary KEYS (price, orderkey) are found
       inside the narrow bands only (~MARGIN·n/ACC rows each) via a
       per-band window — the sole sort touches band rows, never the table;
    4. one scan: tile = 1 + Σ(key > boundary) comparisons, then the
       grouped aggregate. Embarrassingly parallel; nothing global remains.

    Boundary ranks replicate ntile arithmetic exactly (first n%4 tiles get
    one extra row; ties broken by o_orderkey), so the result hash-matches
    the same ntile() oracle. If a band misses its boundary (sketch
    guarantee violated) this raises rather than returning a wrong split."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")

    def tile_agg(tiled: DataFrame) -> DataFrame:
        scaled = F.sum(F.round(F.col("o_totalprice") * 1_000_000).cast("bigint"))
        return tiled.groupBy("tile").agg(
            F.count("*").alias("n_orders"),
            (scaled.cast("double") / 1_000_000).alias("sum_price"),
        )

    # pass 1: size + band pivots in a single aggregate (the pivots cost
    # nothing extra — the scan dominates — and are dead only on the small
    # path, so the dispatch probe is one job either way)
    probe = orders.agg(
        F.count("*").alias("n"),
        *[
            F.expr(
                f"approx_percentile(o_totalprice, array({0.25 * t} - {_NTILE_MARGIN / _NTILE_ACC},"
                f" {0.25 * t} + {_NTILE_MARGIN / _NTILE_ACC}), {_NTILE_ACC})"
            ).alias(f"band{t}")
            for t in (1, 2, 3)
        ],
    ).head()
    n = probe["n"]
    if n == 0:
        # empty relation: no quartile boundaries exist; emit the empty
        # frame with the output schema (the oracle's CTE chain is empty too)
        return spark.createDataFrame([], "tile int, n_orders bigint, sum_price double")
    if n <= _NTILE_SMALL_N:
        w = Window.orderBy("o_totalprice", "o_orderkey")
        return tile_agg(orders.select("o_totalprice", F.ntile(4).over(w).alias("tile")))
    base, extra = divmod(n, 4)
    # last global rank of tiles 1..3 under ntile(4) arithmetic
    cuts = []
    acc = 0
    for t in range(3):
        acc += base + (1 if t < extra else 0)
        cuts.append(acc)
    bands = []
    for t in (1, 2, 3):
        lo, hi = probe[f"band{t}"]
        bands.append((max(0.0, lo), hi))

    # pass 2: exact rank offset of each band start (strictly-below counts)
    offs = orders.agg(
        *[
            F.count(F.when(F.col("o_totalprice") < F.lit(lo), 1)).alias(f"off{i}")
            for i, (lo, _hi) in enumerate(bands)
        ]
    ).head()

    # pass 3: boundary keys from inside the bands only — ONE scan, not a
    # 3-way union of filters (which would issue three table reads): each
    # row computes which bands it falls in as an array and explodes the
    # non-empty memberships (bands can overlap, so a row may carry 2 cuts)
    membership = F.filter(
        F.array(
            *[
                F.when(F.col("o_totalprice").between(F.lit(lo), F.lit(hi)), F.lit(i))
                for i, (lo, hi) in enumerate(bands)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    band_rows = (
        orders.select("o_totalprice", "o_orderkey", membership.alias("cuts"))
        .filter(F.size("cuts") >= 1)
        .select("o_totalprice", "o_orderkey", F.explode("cuts").alias("cut"))
    )
    w = Window.partitionBy("cut").orderBy("o_totalprice", "o_orderkey")
    targets = {i: cuts[i] - offs[f"off{i}"] for i in range(3)}
    target_col = F.when(F.col("cut") == 0, F.lit(targets[0]))
    for i in (1, 2):
        target_col = target_col.when(F.col("cut") == i, F.lit(targets[i]))
    boundaries = (
        band_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == target_col)
        .select("cut", "o_totalprice", "o_orderkey")
        .collect()
    )
    if len(boundaries) != 3:
        raise RuntimeError(
            f"ntile boundary pick found {len(boundaries)}/3 boundaries — "
            f"approx_percentile band guarantee violated (n={n}, bands={bands})"
        )
    bkeys = {row["cut"]: (row["o_totalprice"], row["o_orderkey"]) for row in boundaries}

    # pass 4: comparison bucketing + grouped aggregate — fully parallel
    def gt(bp: float, bk: int):
        return (F.col("o_totalprice") > F.lit(bp)) | (
            (F.col("o_totalprice") == F.lit(bp)) & (F.col("o_orderkey") > F.lit(bk))
        )

    tile = F.lit(1)
    for i in range(3):
        bp, bk = bkeys[i]
        tile = tile + gt(bp, bk).cast("int")
    return tile_agg(orders.select("o_totalprice", tile.cast("int").alias("tile")))


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
