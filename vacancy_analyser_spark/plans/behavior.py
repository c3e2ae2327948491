"""Behavioral / observability analytics over `events` (SURVEY.md §2.11 [ext]).

The event-stream companions of the text-pipeline ops: multi-stage funnel
conversion (the ordered-sequence query product analytics runs on every
clickstream) and statistical outlier detection (the data-quality monitor a
training-data ingest runs on numeric telemetry before trusting a batch).

Both are pure DataFrame algebra over the shared `events` table — no UDFs,
no windows without partitions — and both carry their DuckDB oracle next to
the plan like every other registered query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg
from ..io import load_table
from .registry import register

#: Ordered funnel stages: a user converts to stage i+1 only with an event
#: strictly after their first stage-i event.
FUNNEL_STAGES = ("view", "click", "purchase")


def _epoch_day(ts_col: str = "ts"):
    """Integer epoch day of a TIMESTAMP_NTZ column — wall-clock
    timestampdiff from the NTZ epoch, floor-divided to days. Pure int64
    arithmetic with no calendar or session-timezone semantics, so the
    engines cannot disagree on a boundary. Load-bearing for cross-engine
    parity: every day-bucketing query (retention_cohorts,
    active_users_rollup) shares THIS definition, mirrored in their
    oracles as epoch_us(ts) // 86400000000."""
    epoch_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    return F.floor(epoch_us / F.lit(86_400_000_000)).cast("bigint")


@register(
    "funnel_conversion",
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        ),
        counts AS (
            SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', COUNT(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', COUNT(*) FROM s3
        )
        SELECT stage, event_type, n_users,
               round(CAST(n_users AS DOUBLE)
                     / NULLIF(LAG(n_users) OVER (ORDER BY stage), 0), 6)
                   AS conv_from_prev
        FROM counts
    """,
    tags=("ext-behavior",),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: how many users did view → click →
    purchase IN THAT ORDER, with each stage strictly after the user's
    first event of the previous stage. The sequence constraint is what
    separates a funnel from three independent counts — a purchase before
    the first view does not convert.

    Plan: one stage = one filtered groupBy(user_id).min(ts) semi-joined
    against the previous stage's first-event time — an equi-join on
    user_id carrying (user_id, timestamp) pairs only, never event
    payloads. Stages chain left-to-right, so the worked set shrinks
    monotonically (each join keeps only converting users). The final
    3-row result is aggregate-sized; the stage-over-stage ratio is a
    single ordered window over those 3 rows (constant, not data-scaling).

    At 100 TB: the event scan is pruned to the funnel's event types by
    predicate pushdown, each per-stage aggregate map-side combines to one
    row per user before its exchange, and AQE broadcasts the shrinking
    stage frames against the next filtered scan. Time-boxed funnels
    (convert within 7 days) add one predicate to each join — same shape."""
    events = load_table(spark, sf_dir, "events")
    stage_frames: list[DataFrame] = []
    prev = None
    for stage, etype in enumerate(FUNNEL_STAGES, start=1):
        cur = events.filter(F.col("event_type") == etype)
        if prev is None:
            agg = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            agg = (
                cur.join(prev, "user_id")
                .filter(F.col("ts") > F.col("prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        stage_frames.append(
            agg.agg(
                F.lit(stage).alias("stage"),
                F.lit(etype).alias("event_type"),
                F.count("*").alias("n_users"),
            )
        )
        prev = agg.select("user_id", F.col("t").alias("prev_t"))
    counts = stage_frames[0]
    for f in stage_frames[1:]:
        counts = counts.unionAll(f)
    # stage-over-stage ratio WITHOUT a partitionless window (even a 3-row
    # ordered window trips the WindowExec single-partition warning the
    # engine keeps out of its logs): broadcast-join each stage to its
    # predecessor on stage-1 — same LAG semantics over the constant frame.
    prev_counts = F.broadcast(
        counts.select((F.col("stage") + 1).alias("stage"), F.col("n_users").alias("prev_users"))
    )
    conv = F.round(
        F.col("n_users").cast("double") / F.nullif(F.col("prev_users"), F.lit(0)), 6
    )
    return (
        counts.join(prev_counts, "stage", "left")
        .select("stage", "event_type", "n_users", conv.alias("conv_from_prev"))
    )


#: Robustly detectable outlier threshold for the z-score monitor.
ZSCORE_LIMIT = 3.0


@register(
    "value_zscore_outliers",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(value) AS DOUBLE) AS mean_v,
                   CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
                        / COUNT(value) AS DOUBLE) AS mean_sq,
                   COUNT(value) AS n
            FROM events
            GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               round((e.value - s.mean_v)
                     / sqrt(s.mean_sq - s.mean_v * s.mean_v), 6) AS zscore
        FROM events e JOIN s ON e.event_type = s.event_type
        WHERE s.n > 1
          AND s.mean_sq > s.mean_v * s.mean_v
          AND abs((e.value - s.mean_v)
                  / sqrt(s.mean_sq - s.mean_v * s.mean_v)) > {ZSCORE_LIMIT}
    """,
    tags=("ext-behavior", "ext-profile"),
)
def value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group statistical outliers: events whose value sits more than
    ZSCORE_LIMIT population standard deviations from their event type's
    mean — the ingest-monitor primitive behind "this batch's values look
    wrong" alerts in a data pipeline.

    Two-pass shape: pass 1 aggregates per-type (mean, mean-of-squares)
    through the fixed-point discipline (functions/numeric.py) so both
    engines hold bit-identical doubles; pass 2 re-scans events and joins
    the tiny per-type stats frame back (broadcast — |event types| rows),
    evaluating z = (v − μ)/σ with IEEE basic ops only (subtract, divide,
    sqrt — all exactly rounded, so the filter threshold cannot flicker
    across engines). Degenerate groups (σ² ≤ 0 or a single row) are
    excluded on both sides.

    At 100 TB: pass 1 map-side combines to |types| rows per partition;
    pass 2 is scan + broadcast-hash-join + filter — no shuffle of the
    fact table at all. The same two-pass recipe extends to per-(type,
    day) drift monitors by widening the group key."""
    events = load_table(spark, sf_dir, "events")
    # mean of squares goes through DECIMAL(38,12), not the 10^6-scaled
    # bigint: squares blow the long accumulator's documented bound
    # (numeric.py — |Σx| ≤ 9.2e12) at ~1e9 rows of value≈100, and the
    # oracle's DECIMAL(18,6) even sooner; the 38-digit accumulator holds
    # any realistic Σv² and both engines round v² identically at 12
    # fractional digits before the exact decimal sum
    mean_sq = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")).cast("double")
        / F.count("value")
    ).cast("double")
    stats = F.broadcast(
        events.groupBy("event_type").agg(
            davg("value").alias("mean_v"),
            mean_sq.alias("mean_sq"),
            F.count("value").alias("n"),
        )
    )
    z = (F.col("value") - F.col("mean_v")) / F.sqrt(
        F.col("mean_sq") - F.col("mean_v") * F.col("mean_v")
    )
    return (
        events.join(stats, "event_type")
        .filter(
            (F.col("n") > 1)
            & (F.col("mean_sq") > F.col("mean_v") * F.col("mean_v"))
            & (F.abs(z) > ZSCORE_LIMIT)
        )
        .select("event_id", "event_type", "value", F.round(z, 6).alias("zscore"))
    )


@register(
    "retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) // 86400000000 AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_day,
               (epoch_us(e.ts) // 86400000000) - f.cohort_day AS age_days,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY f.cohort_day, (epoch_us(e.ts) // 86400000000) - f.cohort_day
    """,
    tags=("ext-behavior",),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the day of their FIRST
    event (the cohort), counted on each later day they return — the
    (cohort_day, age_days, n_users) triangle every growth dashboard draws.
    age_days=0 is the new-user count per day; a row's n_users / its
    cohort's age-0 count is the retention rate.

    Days are integer EPOCH days (floor(epoch_us / 86.4e9)) on both sides —
    pure int64 arithmetic with no calendar or session-timezone semantics,
    so the engines cannot disagree on a boundary (to_date() on a Spark
    TIMESTAMP renders in the session timezone; the driver's vanilla
    session makes that a dependency this formulation simply doesn't have).

    Plan: pass 1 aggregates first-event day per user (map-side combined to
    |users| rows); pass 2 joins it back on user_id and hash-aggregates
    (cohort, age) with a distinct-user count. At 100 TB the firsts frame
    is |users| rows — broadcastable for most products, shuffle-join on
    user_id otherwise — and the matrix itself is |days|² rows, driver-tiny.
    The same two-pass shape yields weekly cohorts by dividing by 7."""
    events = load_table(spark, sf_dir, "events")
    day = _epoch_day("ts")
    firsts = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    return (
        events.join(firsts, "user_id")
        .select("user_id", "cohort_day", (day - F.col("cohort_day")).alias("age_days"))
        .groupBy("cohort_day", "age_days")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT event_type AS src,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS dst
            FROM events
        ),
        c AS (
            SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
            GROUP BY src, dst
        ),
        tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY src)
        SELECT c.src, c.dst, c.n,
               round(CAST(c.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS p
        FROM c JOIN tot USING (src)
    """,
    tags=("ext-behavior",),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov chain: P(next event type | current type) from
    each user's time-ordered event sequence — the transition matrix behind
    drop-off analysis and journey simulation (bigram_lm_table's recipe
    lifted from tokens to behavioral events).

    Plan: one LEAD window PARTITIONED BY user_id (parallel in users, the
    sequence never leaves its partition), then a hash aggregate on the
    (src, dst) pair — |types|² rows — and the per-src totals re-aggregate
    THOSE counts (no second corpus pass; the join back is broadcast-tiny).
    The conditional probability is one exact integer-ratio division.

    At 100 TB: the window shuffles on user_id once; everything after is
    |types|²-sized. Time-windowed variants (transitions within a session)
    reuse the sessionization window's partition layout for free."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst")
    ).filter(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    tot = c.groupBy("src").agg(F.sum("n").alias("t"))
    p = F.round(F.col("n").cast("double") / F.col("t").cast("double"), 6)
    return c.join(F.broadcast(tot), "src").select("src", "dst", "n", p.alias("p"))


@register(
    "active_users_rollup",
    oracle="""
        WITH e AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
        )
        SELECT 'day' AS granularity, d AS bucket,
               COUNT(DISTINCT user_id) AS n_users
        FROM e GROUP BY d
        UNION ALL
        SELECT 'week', d // 7, COUNT(DISTINCT user_id) FROM e GROUP BY d // 7
        UNION ALL
        SELECT 'month', d // 30, COUNT(DISTINCT user_id) FROM e GROUP BY d // 30
    """,
    tags=("ext-behavior",),
)
def active_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU: distinct active users per day, per 7-day window, and
    per 30-day window — the engagement rollup every product dashboard
    leads with. Buckets are INTEGER epoch-day arithmetic (d, d//7, d//30
    — fixed-width windows, deliberately not calendar weeks/months), so
    like retention_cohorts no session-timezone or calendar semantics can
    move a boundary between engines.

    Plan: one narrow projection to (user_id, day), then one
    distinct-count aggregate per granularity, unioned — each map-side
    combines (user, bucket) pairs before its exchange, and the exchanges
    carry distinct pairs, not events. Distinct counts at different
    granularities cannot share one aggregate (a user active on two days
    of one week must count once there), which is why this is three
    aggregates and not a grouping-sets single pass; at 100 TB each is the
    same cheap shape, and approx_count_distinct swaps in per-granularity
    when exactness stops mattering (the approx_distinct entry pins that
    tier's contract)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select("user_id", _epoch_day("ts").alias("d"))
    frames = []
    for gran, bucket in (
        ("day", F.col("d")),
        ("week", F.floor(F.col("d") / 7).cast("bigint")),
        ("month", F.floor(F.col("d") / 30).cast("bigint")),
    ):
        frames.append(
            e.groupBy(bucket.alias("bucket")).agg(
                F.countDistinct("user_id").alias("n_users")
            ).select(F.lit(gran).alias("granularity"), "bucket", "n_users")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


#: Two-sided z-test threshold for the daily drift detector.
DRIFT_Z = 2.0


@register(
    "value_drift_by_day",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(value) AS DOUBLE) AS mean_v,
                   CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
                        / COUNT(value) AS DOUBLE) AS mean_sq,
                   COUNT(value) AS n
            FROM events GROUP BY event_type
        ),
        d AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(value) AS DOUBLE) AS daily_mean,
                   COUNT(value) AS n_events
            FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
        )
        SELECT d.event_type, d.day, d.n_events, d.daily_mean,
               round((d.daily_mean - s.mean_v) * sqrt(CAST(d.n_events AS DOUBLE))
                     / sqrt(s.mean_sq - s.mean_v * s.mean_v), 6) AS ztest
        FROM d JOIN s USING (event_type)
        WHERE s.n > 1 AND s.mean_sq > s.mean_v * s.mean_v
          AND abs((d.daily_mean - s.mean_v) * sqrt(CAST(d.n_events AS DOUBLE))
                  / sqrt(s.mean_sq - s.mean_v * s.mean_v)) > {DRIFT_Z}
    """,
    tags=("ext-behavior", "ext-profile"),
)
def value_drift_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity drift detection: days whose per-type mean value
    deviates from the type's corpus-wide mean by more than DRIFT_Z
    standard errors (a two-sided z-test of the daily mean, σ/√n) — the
    batch-ingest question behind "did Tuesday's feed change?", one level
    up from value_zscore_outliers' per-event alerts (an event can be fine
    while the day's MEAN quietly shifts, and vice versa).

    Plan: two aggregates — per-(type, day) daily means and per-type
    global moments, both through the fixed-point/decimal discipline —
    joined on type (broadcast: |types| rows). The test statistic is IEEE
    basic ops over bit-identical doubles, so the flag set cannot flicker
    across engines. Days come from the shared integer epoch-day helper
    (no calendar semantics).

    At 100 TB both aggregates map-side combine (|types|·|days| and
    |types| rows); nothing else moves. Weekly windows or per-source
    drill-downs widen the day key without changing the shape."""
    events = load_table(spark, sf_dir, "events")
    day = _epoch_day("ts")
    daily = events.groupBy("event_type", day.alias("day")).agg(
        davg("value").alias("daily_mean"), F.count("value").alias("n_events")
    )
    mean_sq = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")).cast("double")
        / F.count("value")
    ).cast("double")
    stats = F.broadcast(
        events.groupBy("event_type").agg(
            davg("value").alias("mean_v"),
            mean_sq.alias("mean_sq"),
            F.count("value").alias("n"),
        )
    )
    z = (
        (F.col("daily_mean") - F.col("mean_v"))
        * F.sqrt(F.col("n_events").cast("double"))
        / F.sqrt(F.col("mean_sq") - F.col("mean_v") * F.col("mean_v"))
    )
    return (
        daily.join(stats, "event_type")
        .filter(
            (F.col("n") > 1)
            & (F.col("mean_sq") > F.col("mean_v") * F.col("mean_v"))
            & (F.abs(z) > DRIFT_Z)
        )
        .select("event_type", "day", "n_events", "daily_mean", F.round(z, 6).alias("ztest"))
    )
