"""Streaming JDBC upsert sink — the reference's feeder loop as a stream.

The reference runs a 60 s poll loop that scrapes a snapshot and folds it
into Postgres row by row (feeder_postgres.py:147-177 conditional
INSERT/UPDATE, :251-259 the loop). Structured Streaming replaces both
halves: the file source discovers new changeset files with checkpointed
offsets (each file processed exactly once), and ``foreachBatch`` hands
every micro-batch to the set-based MERGE upsert (io.upsert_jdbc) — one
database-side statement per batch, no per-row round trips.

Delivery semantics: the file source is exactly-once per FILE (offsets in
the checkpoint), and the MERGE is idempotent per BATCH (replaying the
same changeset converges to the same table — tested), so a batch retried
after a mid-upsert crash lands correctly. That is the strongest contract
a non-transactional two-system sink can give, and it is the same one the
reference's rerun-the-scraper recovery story relies on.

At 100 TB: each micro-batch's staging write is the parallel batched JDBC
writer (bounded connection count), and the MERGE cost is database-side —
the stream's state is only the source offsets, so the driver stays
O(files), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..io import upsert_jdbc


def start_jdbc_upsert_stream(
    changesets: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    checkpoint: str,
    properties: dict[str, str] | None = None,
    available_now: bool = True,
    order_col: str | None = None,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Fold a streaming DataFrame of changesets into a JDBC table.

    ``changesets`` is any streaming frame (typically ``readStream`` over a
    snapshot/changeset directory). ``available_now=True`` drains what is
    currently available and stops — the batch-job shape the reference's
    cron-style feeder has; pass ``available_now=False`` with
    ``processing_time`` (e.g. ``"60 seconds"`` — the reference's poll
    interval, feeder_postgres.py:251-259) for a resident stream.

    In-batch key duplicates are collapsed last-wins inside ``upsert_jdbc``
    (a cold-start availableNow run folds ALL existing files into batch 0);
    ``order_col`` names the version/timestamp column that picks the winner.

    The two trigger knobs are mutually exclusive by mode and validated
    here: ``available_now=True`` with a ``processing_time`` would silently
    ignore the interval, and ``available_now=False`` without one would
    start an UNTHROTTLED micro-batch loop (Spark's default trigger) —
    both are silent surprises, so both raise instead.
    """
    if available_now and processing_time is not None:
        raise ValueError(
            "available_now=True drains and stops — processing_time would be "
            "silently ignored; pass available_now=False for a resident stream"
        )
    if not available_now and processing_time is None:
        raise ValueError(
            "available_now=False requires processing_time (e.g. '60 seconds', "
            "the reference feeder's poll interval) — omitting it would run an "
            "unthrottled micro-batch loop"
        )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_jdbc(
            batch_df.sparkSession, batch_df, url, table, key_cols, properties,
            order_col=order_col,
        )

    writer = changesets.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
