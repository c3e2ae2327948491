"""Partition-scoped incremental state rewrite — the write-side half of D1.

The reference's feeder keeps one flat Postgres table and UPDATEs it row by
row (feeder_postgres.py:147-177); its historical scraper already shards work
into id buckets of 10k and rewrites one bucket file at a time
(get_hist_vacancies.py:15-16,191-216). At 100 TB the engine's state store
needs the same sharding made first-class: state lives partitioned by a
STABLE hash bucket of the key, and folding a changeset in rewrites ONLY the
partitions that contain changed keys — Delta's ``replaceWhere`` shape, built
here from two stock Spark features:

- a partition-pruned scan of the touched buckets (the merge never reads
  untouched state), and
- dynamic partition overwrite (``partitionOverwriteMode=dynamic``), which
  replaces exactly the partitions present in the written frame and leaves
  every other partition's files physically untouched (byte-identical —
  tested in tests/test_partitioned_state.py).

Cost model: a changeset touching k of N buckets reads and writes k/N of the
state regardless of state size — repeat ingests scale with the CHANGESET,
the same property incremental_dedup_bucketed proves for the dedup corpus.

The bucket function is ``pmod(xxhash64(key), n_buckets)`` — stable across
runs and engines' row order, never derived from data values that can change
(a bucket move would be a delete+insert across partitions, which dynamic
overwrite cannot express)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fsutil

BUCKET_COL = "id_bucket"
N_STATE_BUCKETS = 32


def bucket_of(key: str | Column, n_buckets: int = N_STATE_BUCKETS) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def write_state(df: DataFrame, path: str, key: str, n_buckets: int = N_STATE_BUCKETS) -> None:
    """Initial (full) state write, partitioned by the stable key bucket."""
    (
        df.withColumn(BUCKET_COL, bucket_of(key, n_buckets))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def touched_buckets(changeset: DataFrame, key: str, n_buckets: int = N_STATE_BUCKETS) -> list[int]:
    """The ≤ n_buckets partition ids the changeset's keys hash into — an
    aggregate-sized control scalar (the same driver-side pattern as the
    dedup regime probe), which is what makes the scan below PRUNABLE at
    plan time: the partition filter is a literal IN list."""
    rows = changeset.select(bucket_of(key, n_buckets).alias("b")).distinct().collect()
    return sorted(r["b"] for r in rows)


def read_buckets(spark: SparkSession, path: str, buckets: list[int]) -> DataFrame:
    """Partition-pruned scan of the touched state buckets only."""
    df = spark.read.parquet(path)
    return df.filter(F.col(BUCKET_COL).isin(buckets))


def overwrite_buckets(merged: DataFrame, path: str) -> None:
    """Replace exactly the partitions present in ``merged`` (which must
    carry BUCKET_COL); every other partition's files are not rewritten."""
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def merge_changeset_partitioned(
    spark: SparkSession,
    state_path: str,
    changeset: DataFrame,
    merge_fn,
    key: str,
    n_buckets: int = N_STATE_BUCKETS,
) -> list[int]:
    """Fold ``changeset`` into the partitioned state at ``state_path``.

    ``merge_fn(old: DataFrame, changeset: DataFrame) -> DataFrame`` computes
    the new content of the touched buckets from the (pruned) old state and
    the changeset — upsert classification, SCD2 lifecycle, whatever the
    table's semantics are; this operator owns only the partition scoping.
    Returns the touched bucket ids (empty changeset → no write at all).

    Recovery contract for DELETE-semantics merges: the overwrite commits
    first, then the emptied-bucket sweep runs — the two are NOT one atomic
    step (stock parquet has no multi-partition transaction; Delta/Iceberg
    buy exactly this). A crash in the window between them leaves the
    emptied buckets' OLD files behind, so deleted rows reappear on the
    next read; the merge itself is idempotent, so the documented recovery
    is to re-run it (the re-run recomputes the same merged content against
    the resurrected rows and sweeps again). A failed sweep raises rather
    than returning success with ghost rows still on disk."""
    buckets = touched_buckets(changeset, key, n_buckets)
    if not buckets:
        return []
    # localCheckpoint severs the merged plan's lineage from state_path:
    # Spark (correctly) refuses to overwrite a path its input plan still
    # reads from, and the checkpoint is only the k/N touched fraction —
    # the bounded slice this operator exists to isolate. Checkpointing
    # MERGED (not just old) also lets the emptied-bucket sweep below read
    # the written partition set without recomputing the merge.
    old = read_buckets(spark, state_path, buckets).drop(BUCKET_COL)
    merged = (
        merge_fn(old, changeset)
        .withColumn(BUCKET_COL, bucket_of(key, n_buckets))
        .localCheckpoint(eager=True)
    )
    overwrite_buckets(merged, state_path)
    # Dynamic partition overwrite replaces only partitions PRESENT in the
    # written frame — a merge_fn with delete semantics that empties a
    # touched bucket leaves the bucket's old files behind and the deleted
    # rows would reappear. Sweep those buckets' directories explicitly.
    present = {
        r["b"] for r in merged.select(F.col(BUCKET_COL).alias("b")).distinct().collect()
    }
    emptied = [b for b in buckets if b not in present]
    if emptied:
        _delete_bucket_dirs(spark, state_path, emptied)
        if not _bucket_dirs_remain(spark, state_path):
            # A merge that empties EVERY bucket would leave a directory
            # with no parquet footers — the next read fails with "unable
            # to infer schema". Keep the path readable: one empty,
            # schema-bearing file under a bucket-0 partition dir (reads
            # as the correct schema with zero rows; a later merge that
            # repopulates bucket 0 dynamic-overwrites it away).
            (
                merged.limit(0)
                .drop(BUCKET_COL)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{state_path}/{BUCKET_COL}=0")
            )
    return buckets


def compact_state(spark: SparkSession, path: str) -> list[dict]:
    """Consolidate small files repeated bucket-scoped merges accumulate
    in the state store (each merge dynamic-overwrites its touched buckets
    with however many tasks held rows). Shared compaction op, keyed on
    the state bucket column."""
    from .compaction import compact_partitions

    return compact_partitions(spark, path, (BUCKET_COL,))


def _bucket_dirs_remain(spark: SparkSession, path: str) -> bool:
    return any(
        name.startswith(f"{BUCKET_COL}=") for name in fsutil.child_names(spark, path)
    )


def _delete_bucket_dirs(spark: SparkSession, path: str, buckets: list[int]) -> None:
    """Remove ``<path>/id_bucket=<b>`` for each emptied bucket via the
    shared Hadoop FileSystem sweep (operators/fsutil.py — works for local
    paths and object stores alike, raises rather than silently keeping
    files whose rows would resurrect on the next read)."""
    for b in buckets:
        fsutil.delete_dir(spark, f"{path}/{BUCKET_COL}={b}")
