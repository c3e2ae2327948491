"""Streaming embedding ingest into the materialized IVF index — the D2
high-water-mark pattern (streaming/snapshot_stream.py, reference
feeder_postgres.py:224-259) composed with the incremental index add
(plans/similarity.py ivf_index_incremental_add): embeddings arrive as a
stream, each micro-batch assigns against the STORED frozen centroids and
appends to the touched centroid partitions only. No retraining, no
full-corpus stage per batch — the 100 TB ingest shape for the vector
surface, mirroring what the JDBC upsert stream does for the relational one.

Exactly-once story: foreachBatch re-runs a failed batch, and a plain
parquet append would double-insert on the retry — so every fold runs the
add with ``skip_existing=True`` (already-indexed vec_ids anti-joined out
against ONLY the touched partitions). With unique vec_ids the fold is
idempotent, so checkpoint replay and at-least-once delivery are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_ann_ingest_stream(
    batches: DataFrame,
    index_path: str,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Fold a streaming (vec_id, embedding) frame into the IVF index at
    ``index_path`` (built by ivf_build_index / ivf_build_index_frame — the
    stored ``centroids/`` table must exist; the trainer never runs here).

    Trigger contract mirrors start_jdbc_upsert_stream: ``available_now=True``
    drains what exists and stops (the cron-shaped ingest job);
    ``available_now=False`` requires ``processing_time`` for a resident
    stream — both misuse combinations raise."""
    if available_now and processing_time is not None:
        raise ValueError(
            "available_now=True drains and stops — processing_time would be "
            "silently ignored; pass available_now=False for a resident stream"
        )
    if not available_now and processing_time is None:
        raise ValueError(
            "available_now=False requires processing_time — omitting it would "
            "run an unthrottled micro-batch loop"
        )

    from ..plans.similarity import ivf_index_incremental_add

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_index_incremental_add(
            batch_df.sparkSession, index_path, batch_df, skip_existing=True
        )

    writer = batches.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_ann_delete_stream(
    deletions: DataFrame,
    index_path: str,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """The takedown twin of start_ann_ingest_stream: a stream of vec_ids
    to remove (right-to-be-forgotten requests arrive as a queue, not a
    batch job) folds into the materialized index via
    plans.similarity.ivf_index_delete — per micro-batch one column-pruned
    locate scan, partition-scoped rewrite of the touched cells, frozen
    centroids throughout.

    Deletion is idempotent BY CONSTRUCTION (re-deleting an absent id
    finds no victims and writes nothing), so foreachBatch retries and
    at-least-once delivery are safe without any skip_existing machinery.
    Same trigger contract as the ingest stream."""
    if available_now and processing_time is not None:
        raise ValueError(
            "available_now=True drains and stops — processing_time would be "
            "silently ignored; pass available_now=False for a resident stream"
        )
    if not available_now and processing_time is None:
        raise ValueError(
            "available_now=False requires processing_time — omitting it would "
            "run an unthrottled micro-batch loop"
        )

    from ..plans.similarity import ivf_index_delete

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_index_delete(
            batch_df.sparkSession, index_path, batch_df.select("vec_id")
        )

    writer = deletions.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
