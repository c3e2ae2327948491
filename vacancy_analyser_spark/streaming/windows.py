"""ST2-ST4: windowed aggregation builders (SURVEY.md §2.8).

Each builder returns a transformation that works on BOTH batch and streaming
DataFrames — the registered batch queries (plans/streaming_batch.py) and the
streaming tests share these, so the semantics the DuckDB oracle verified are
the semantics the stream runs.

Watermark policy: the reference *hard-fails* on out-of-order data
(feeder_postgres.py:156-159). For a 100 TB stream that is unusable — we
instead bound lateness with a watermark (late rows beyond it are dropped by
the engine) and surface the drop count via ``late_drop_count`` (the
engine's numRowsDroppedByWatermark, readable per micro-batch the same way
FreshnessListener exports freshness gauges — metrics_exporter.py:113-151).
The drop-late-with-a-metric contract is pinned end-to-end in
tests/test_streaming.py::test_watermark_drops_late_rows_with_metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum

DEFAULT_WATERMARK = "7 days"


def with_watermark(df: DataFrame, time_col: str = "ts", delay: str = DEFAULT_WATERMARK) -> DataFrame:
    """Apply a watermark on streaming frames; no-op on batch frames."""
    return df.withWatermark(time_col, delay) if df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    window: str = "1 day",
    time_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """ST2: tumbling-window count+sum per key (epoch-aligned, UTC)."""
    return (
        with_watermark(df, time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), dsum(value_col).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding_counts(
    df: DataFrame,
    window: str = "7 days",
    slide: str = "1 day",
    time_col: str = "ts",
    value_col: str = "value",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """ST3: sliding-window count+sum (overlapping windows, epoch-aligned)."""
    return (
        with_watermark(df, time_col, watermark)
        .groupBy(F.window(time_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(value_col).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    time_col: str = "ts",
    key: str = "user_id",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """ST4: session windows — activity bursts separated by ≥gap silence."""
    return (
        with_watermark(df, time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def deduplicate(
    df: DataFrame,
    keys: list[str] | None = None,
    time_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """ST5: streaming dedup by key within the watermark horizon — the
    distributed form of the reference's in-memory `used` id-set
    (get_vacancies.py:67-72). State size is bounded by the watermark."""
    keys = keys or ["event_id"]
    out = with_watermark(df, time_col, watermark)
    if df.isStreaming:
        return out.dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    gap: str = "4 hours",
    time_col: str = "ts",
    key: str = "user_id",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """ST7: stream-stream interval join — attribute each `clicks` row to the
    `views` rows by the same key that precede it within `gap`.

    Works on both batch and streaming inputs (the stream-vs-batch test and
    the DuckDB-oracled batch query share this builder). In streaming, both
    sides carry watermarks and the join condition bounds event time on both
    ends — exactly what Spark needs to age out join state: a buffered view
    can be dropped once the watermark passes view_ts + gap. Without the
    range bound the state grows forever.

    Batch/scale shape: an equi-join on the key with the time range as a
    join residual — shuffles once on `key`, never enumerates a time cross
    product. The gap is returned in whole microseconds via
    timestampdiff(MICROSECOND, ...), exact on TIMESTAMP_NTZ and TIMESTAMP
    alike with no session-timezone dependence — an exact integer on Spark
    and DuckDB, no float round-trip in the hash compare."""
    v = with_watermark(
        views.select(
            F.col("event_id").alias("view_id"),
            F.col(key).alias("v_user"),
            F.col(time_col).alias("v_ts"),
        ),
        "v_ts",
        watermark,
    )
    c = with_watermark(
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col(key).alias("c_user"),
            F.col(time_col).alias("c_ts"),
        ),
        "c_ts",
        watermark,
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") < F.col("v_ts") + F.expr(f"INTERVAL {gap}")),
    ).select(
        F.col("v_user").alias(key),
        "view_id",
        "click_id",
        # wall-clock arithmetic that is exact on TIMESTAMP_NTZ as well as
        # TIMESTAMP: timestampdiff never routes through a session-timezone
        # cast (which would skew per-value across a DST transition under a
        # non-UTC session zone) and matches the oracle's date_diff.
        F.expr("timestampdiff(MICROSECOND, v_ts, c_ts)").alias("gap_us"),
    )


def late_drop_count(query) -> int:
    """ST1 metric: rows the engine dropped as later-than-watermark, summed
    over ``query``'s RETAINED progress (every state operator, every
    retained micro-batch). This is Spark's own
    ``numRowsDroppedByWatermark`` — the authoritative count, measured
    where the drop happens, no second scan.

    Window bound: ``recentProgress`` keeps only the last
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100)
    batches and clears on restart — exact for tests and short jobs, an
    undercount past that horizon. A long-running stream must accumulate
    per-event instead: ``listeners.WatermarkDropListener`` receives each
    progress exactly once and keeps the monotone lifetime total (pinned
    side-by-side with this function in
    tests/test_streaming.py::test_watermark_drops_late_rows_with_metric)."""
    return sum(batch_drop_count(prog) for prog in query.recentProgress)


def batch_drop_count(progress) -> int:
    """numRowsDroppedByWatermark summed over one progress record's state
    operators. Accepts a dict or a StreamingQueryProgress (parsed via its
    version-stable JSON form). The ONE place this field is walked —
    late_drop_count and listeners.WatermarkDropListener both call it, so
    the two metric paths cannot drift."""
    if not isinstance(progress, dict):
        import json

        progress = json.loads(progress.json)
    return sum(
        int(op.get("numRowsDroppedByWatermark") or 0)
        for op in progress.get("stateOperators", []) or []
    )


def observe_freshness(df: DataFrame, time_col: str = "ts") -> DataFrame:
    """ST6: attach observed metrics (max event time, row count) to any
    frame; a StreamingQueryListener reads them per micro-batch — the
    engine-side replacement for metrics_exporter.py's poll loops."""
    return df.observe(
        "freshness",
        F.max(F.col(time_col)).alias("max_event_time"),
        F.count(F.lit(1)).alias("rows"),
    )
