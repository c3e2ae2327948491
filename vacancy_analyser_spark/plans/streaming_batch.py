"""ST-ops in their batch-checkable form (SURVEY.md §2.8).

The genuinely streaming implementations (readStream file source, watermarks,
Trigger.AvailableNow, session windows, stateful dedup) live in
vacancy_analyser_spark/streaming/ and are exercised by tests; the queries
here run the *same window semantics* through the batch engine so the DuckDB
oracle can verify them. Spark's time windows are epoch-aligned in UTC, so a
1-day tumbling window start == date_trunc('day', ts) and a slide-by-1-day
window start is also a UTC midnight — the oracles exploit exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_sql
from ..io import load_table
from .registry import register


@register(
    "tumbling_window_count",
    oracle=f"""
        SELECT date_trunc('day', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM events
        GROUP BY date_trunc('day', ts), event_type
    """,
    tags=("ST2",),
)
def tumbling_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 tumbling window aggregate — the weekly-snapshot cadence
    (periodic_run.py:12) generalized to windowed groupBy. In streaming this
    exact expression runs under withWatermark; the batch plan is the same
    two-phase hash aggregate."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_avg",
    oracle=f"""
        WITH bounds AS (
            SELECT date_trunc('day', min(ts)) - INTERVAL 6 DAY AS lo,
                   date_trunc('day', max(ts)) AS hi
            FROM events
        ),
        wins AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS ws FROM bounds)
        SELECT ws AS window_start,
               COUNT(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM events JOIN wins ON ts >= ws AND ts < ws + INTERVAL 7 DAY
        GROUP BY ws
    """,
    tags=("ST3",),
)
def sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 sliding window (7-day window, 1-day slide) — the notebook's
    trend-over-time plots (cells 16/19) as overlapping windows. Spark emits
    one row per (window, data present); the oracle reproduces the window set
    with generate_series and an interval join."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "freshness_lag",
    oracle="""
        SELECT event_type,
               max(ts) AS last_seen,
               CAST(datediff('day', max(ts), (SELECT max(ts) FROM events)) AS BIGINT)
                   AS lag_days
        FROM events
        GROUP BY event_type
    """,
    tags=("ST6",),
)
def freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 freshness metrics (metrics_exporter.py:113-151: staleness-in-days
    per source). Per-source max(ts) against the global max — two tiny
    aggregates, the global one broadcast."""
    events = load_table(spark, sf_dir, "events")
    global_max = events.agg(F.max("ts").alias("gmax"))
    per_type = events.groupBy("event_type").agg(F.max("ts").alias("last_seen"))
    return per_type.crossJoin(F.broadcast(global_max)).select(
        "event_type",
        "last_seen",
        F.datediff(F.col("gmax").cast("date"), F.col("last_seen").cast("date"))
        .cast("bigint")
        .alias("lag_days"),
    )


@register(
    "stateful_dedup",
    oracle="""
        SELECT event_id, min(ts) AS first_ts, COUNT(*) AS n_dups
        FROM events
        GROUP BY event_id
    """,
    tags=("ST5",),
)
def stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 dedup-by-key summary (the reference dedups vacancy ids in a
    Python set, get_vacancies.py:67-72). Streaming twin:
    dropDuplicates(["event_id"]) under a watermark — see
    streaming/windows.py::deduplicate; here the deterministic batch
    equivalent."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_id").agg(
        F.min("ts").alias("first_ts"), F.count("*").alias("n_dups")
    )


@register(
    "interval_join_attribution",
    oracle="""
        SELECT v.user_id AS user_id,
               v.event_id AS view_id,
               c.event_id AS click_id,
               date_diff('microseconds', v.ts, c.ts) AS gap_us
        FROM events v
        JOIN events c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 4 HOUR
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    tags=("ST7",),
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 stream-stream interval join in its batch-checkable form: each
    click attributed to the views by the same user within the preceding
    4 hours. The builder (streaming/windows.py::attribution_join) is shared
    with the streaming test, where both sides run under readStream with
    watermarks and the same time-bounded condition ages out join state.

    Batch plan: both sides are the events scan with the event_type equality
    pushed to parquet; the join is an equi-join on user_id with the time
    range as a residual — one shuffle per side on the key, which is the
    shape that survives 100 TB (a pure theta join would not)."""
    from ..streaming.windows import attribution_join

    events = load_table(spark, sf_dir, "events")
    return attribution_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "click"),
        gap="4 hours",
    )


@register(
    "session_window_count",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                        WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
                        ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               user_id,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
    """,
    tags=("ST4",),
)
def session_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 session windows (30-min gap) per user.

    DuckDB has no session_window, but the semantics ARE SQL-expressible as
    gaps-and-islands: flag a session break when the gap to the previous
    event is >= 30 min (session_window intervals are [start, end) — an
    event landing exactly on the previous session's end starts a new one),
    number sessions with a running sum of the flags, aggregate per island.
    session_end = last event + gap, matching Spark's definition. The
    testdata's timestamps are whole microseconds, so the nanos→micros read
    conversion is lossless and the boundary values hash-match exactly.
    Previously a rows-only check; the oracle also pins the sessionization
    against the hand-computed fixture tests."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
