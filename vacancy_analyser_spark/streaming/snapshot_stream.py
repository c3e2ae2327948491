"""D2 as Structured Streaming: the snapshot-directory feed
(data/YYYY-MM-DD/result.csv, periodic_run.py:43-61 → feeder_postgres.py
:224-259) becomes a file-source stream + foreachBatch merge.

What the reference hand-rolls and what replaces it:
- 60 s poll loop (feeder_postgres.py:251-259)  → Trigger.ProcessingTime /
  Trigger.AvailableNow for catch-up runs.
- high-water-mark date check (:224-231)        → the checkpoint's processed-
  file log (exactly-once file tracking) plus merge idempotence as a second
  line of defense on replay.
- per-dir commit (:244)                        → per-micro-batch atomic
  state swap (write next state to a temp dir, rename over current).

Layout: snapshots land as ``<snapshot_root>/snapshot_date=YYYY-MM-DD/*.parquet``
— the partition column carries the date, so one micro-batch may contain
several snapshot dates and folds them oldest-first (exactly what
feeder_postgres.py:226-231 does with sorted dirs).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.merge import merge_snapshots, state_max_date


class ParquetStateStore:
    """Versioned batch-state storage with atomic swap.

    Spark cannot overwrite a parquet dir it is reading, so each merge writes
    ``<root>/.next-<uuid>`` and renames it over ``<root>/current`` — the same
    tempfile+rename atomicity the reference uses for CSV buckets
    (get_hist_vacancies.py:191-216), at directory granularity.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def current_path(self) -> str:
        return os.path.join(self.root, "current")

    def exists(self) -> bool:
        return os.path.isdir(self.current_path)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return spark.read.parquet(self.current_path) if self.exists() else None

    def write(self, state: DataFrame) -> None:
        tmp = os.path.join(self.root, f".next-{uuid.uuid4().hex}")
        state.write.mode("overwrite").parquet(tmp)
        old = os.path.join(self.root, f".old-{uuid.uuid4().hex}")
        if self.exists():
            os.rename(self.current_path, old)
        os.rename(tmp, self.current_path)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)


class BucketedStateStore:
    """State storage as a versioned *bucketed* managed table.

    Motivation (operators/merge.py scale note): the merge's full-outer join
    must co-partition both sides on the key. Plain parquet state shuffles
    the ENTIRE state every merge — at 100 TB that shuffle dwarfs the
    (weekly-snapshot-sized) real work. Stored ``bucketBy(key)``, the state
    scan already satisfies the join's hashpartitioning requirement, so the
    repeat merge exchanges only the snapshot side — verified by plan
    assertion in tests/test_streaming.py (state side: zero exchanges).

    Versioning replaces the rename dance of ParquetStateStore: Spark cannot
    overwrite a table it is reading, so each merge writes ``<name>_v{n+1}``
    and drops older versions after the new one is committed. Deployment
    note: bucketing metadata lives in the session catalog — a real lake
    needs a persistent metastore (or a table format that carries layout
    metadata in the table itself) for the bucket spec to survive restarts.
    """

    def __init__(self, spark: SparkSession, name: str, key: str = "id", n_buckets: int = 8):
        self.spark = spark
        self.name = name
        self.key = key
        self.n_buckets = n_buckets

    def _versions(self) -> list[int]:
        prefix = f"{self.name}_v"
        return sorted(
            int(t.name[len(prefix):])
            for t in self.spark.catalog.listTables()
            if t.name.startswith(prefix) and t.name[len(prefix):].isdigit()
        )

    def read(self) -> DataFrame | None:
        vs = self._versions()
        return self.spark.table(f"{self.name}_v{vs[-1]}") if vs else None

    def write(self, state: DataFrame) -> None:
        vs = self._versions()
        nxt = (vs[-1] + 1) if vs else 1
        (
            state.write.bucketBy(self.n_buckets, self.key)
            .sortBy(self.key)
            .mode("overwrite")
            .saveAsTable(f"{self.name}_v{nxt}")
        )
        for v in vs:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.name}_v{v}")


def snapshot_schema_with_date(snapshot_schema: T.StructType) -> T.StructType:
    return T.StructType(list(snapshot_schema.fields) + [T.StructField("snapshot_date", T.DateType())])


def start_snapshot_merge_stream(
    spark: SparkSession,
    snapshot_root: str,
    state_store: ParquetStateStore,
    checkpoint_dir: str,
    snapshot_schema: T.StructType,
    key: str = "id",
    archived_col: str | None = "archived",
    available_now: bool = True,
    processing_time: str = "60 seconds",
):
    """Start the merge stream; returns the StreamingQuery.

    ``available_now=True`` processes every pending snapshot then stops (the
    batch-style catch-up); False polls like the reference's 60 s loop."""

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        dates = [r["snapshot_date"] for r in batch_df.select("snapshot_date").distinct().collect()]
        state = state_store.read(spark)
        hwm = state_max_date(state) if state is not None else None
        snaps: list[tuple[dt.date, DataFrame]] = [
            (d, batch_df.filter(F.col("snapshot_date") == F.lit(d)).drop("snapshot_date"))
            for d in sorted(dates)
        ]
        new_state = merge_snapshots(
            state, snaps, key=key, archived_col=archived_col, high_water_mark=hwm
        )
        # write() fully materializes into a temp dir before the atomic swap,
        # so reading `current` and replacing it never overlap.
        state_store.write(new_state)

    reader = (
        spark.readStream.schema(snapshot_schema_with_date(snapshot_schema))
        .option("basePath", snapshot_root)
        .parquet(os.path.join(snapshot_root, "snapshot_date=*"))
    )
    writer = reader.writeStream.foreachBatch(fold_batch).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
