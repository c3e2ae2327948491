"""Partition-scoped small-file compaction — the maintenance op the
streaming-ingest story needs to not degrade monotonically.

Every incremental add appends ≥1 file per touched partition per batch
(plans/similarity.py ivf_index_incremental_add), and the add's
byte-identity contract GUARANTEES files accumulate: untouched partitions
are never rewritten, touched ones only gain. Deletes rewrite touched
partitions but never consolidate neighbors. After thousands of streaming
triggers a hot centroid partition holds thousands of tiny parquet files —
the classic streaming-lake failure mode (every probe pays per-file open
cost; the NameNode/object-store listing pays per-file metadata). This
module closes the lifecycle: build → add/delete → COMPACT.

Shape (all through stock Spark + the shared Hadoop FS helpers, so it runs
wherever the table lives — HDFS/S3A/file:):

- CENSUS: one recursive file listing groups data files by partition key.
  Driver-side, but metadata-sized — (path, length) per file, the same
  listing any query planner over this table performs.
- SELECT: a partition is fragmented when its file count exceeds what its
  bytes justify (``ceil(bytes / target_file_bytes)``) — a partition
  already at one right-sized file is never touched, so compaction is
  idempotent and untouched partitions stay byte-identical (tested).
- REWRITE: read ONLY the fragmented partitions (OR-of-AND literal
  partition filter → planning-time pruning), cluster each key into one
  task via ``repartition(partition_cols)``, and dynamic-partition-
  overwrite them with ``maxRecordsPerFile`` bounding file size — the
  reference feeder's own output discipline (feeder_hadoop.py:20
  ``ROWS_PER_FILE = 50000``) applied as maintenance instead of only at
  first write. The localCheckpoint breaks lineage to the files being
  replaced (same trick as the add's read-then-append).

Cost tracks the FRAGMENTED fraction, not the table: a changeset-shaped
nightly compact after a day of streaming ingest reads and writes only the
partitions the day's batches touched. Skew note: one giant fragmented
partition becomes one write task emitting ``rows/max_records`` files
sequentially — acceptable for maintenance; the selection threshold keeps
healthy partitions out of the job entirely.

Serves every partitioned layout in the repo: flat IVF / IVFPQ vectors
(``centroid_id``), the two-level layout (``coarse_id, centroid_id``), the
id→centroid lookup (``bucket``) and the partitioned state store
(``id_bucket``) — see the thin wrappers beside each owner.
"""

from __future__ import annotations

import functools as ft
import math
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fsutil

#: Reference-parity file-size bound (feeder_hadoop.py:20): rewritten
#: partitions never exceed this many rows per output file.
MAX_RECORDS_PER_FILE = 50_000

#: A partition whose bytes fit in fewer files than it has is fragmented.
#: 128 MB is the classic HDFS-block / spark.sql.files.maxPartitionBytes
#: sweet spot — one file ≈ one scan split.
TARGET_FILE_BYTES = 128 * 1024 * 1024


def _parse_val(raw: str):
    """Partition-directory value → Python literal (int where possible —
    every layout here keys on ints; Hive-escaped strings otherwise)."""
    raw = unquote(raw)
    try:
        return int(raw)
    except ValueError:
        return raw


def partition_file_census(
    spark: SparkSession, table_dir: str, partition_cols: tuple[str, ...]
) -> dict[tuple, tuple[int, int]]:
    """{partition key tuple: (n_files, n_bytes)} for every data file that
    sits under a complete ``col=val`` chain matching ``partition_cols``.
    Metadata files (``_SUCCESS``, dotfiles) and stray root files are
    skipped. One recursive listing — the op's only whole-table touch, and
    it reads directory metadata, not data."""
    fs, root = fsutil._fs_path(spark, table_dir)
    if not fs.exists(root):
        return {}
    out: dict[tuple, list[int]] = {}
    root_str = root.toString()
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith("_") or name.startswith("."):
            continue
        rel = p.toString()[len(root_str) :].strip("/")
        dirs = rel.split("/")[:-1]
        key = []
        for col, seg in zip(partition_cols, dirs):
            if not seg.startswith(f"{col}="):
                break
            key.append(_parse_val(seg[len(col) + 1 :]))
        if len(key) != len(partition_cols) or len(dirs) != len(partition_cols):
            continue
        slot = out.setdefault(tuple(key), [0, 0])
        slot[0] += 1
        slot[1] += int(st.getLen())
    return {k: (v[0], v[1]) for k, v in out.items()}


def fragmented_keys(
    census: dict[tuple, tuple[int, int]],
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> list[tuple]:
    """Partition keys holding more files than their bytes justify."""
    return sorted(
        k
        for k, (n_files, n_bytes) in census.items()
        if n_files > max(1, math.ceil(n_bytes / target_file_bytes))
    )


def keys_filter(partition_cols: tuple[str, ...], keys) -> F.Column:
    """OR-of-AND literals over the partition columns — the planning-time
    partition-pruning shape shared with ivf_index_delete."""
    return ft.reduce(
        lambda a, b: a | b,
        [
            ft.reduce(
                lambda x, y: x & y,
                [F.col(c) == F.lit(v) for c, v in zip(partition_cols, key)],
            )
            for key in keys
        ],
    )


def compact_partitions(
    spark: SparkSession,
    table_dir: str,
    partition_cols: tuple[str, ...] = ("centroid_id",),
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> list[dict]:
    """Rewrite every fragmented partition of a partitioned parquet table
    into right-sized files; leave healthy partitions byte-untouched.
    Returns one report row per compacted partition:
    ``{key, files_before, files_after, bytes}`` (empty list → nothing was
    fragmented, nothing was written — idempotence)."""
    census = partition_file_census(spark, table_dir, partition_cols)
    victims = fragmented_keys(census, target_file_bytes)
    if not victims:
        return []
    rows = (
        spark.read.parquet(table_dir)
        .filter(keys_filter(partition_cols, victims))
        .localCheckpoint(eager=True)
    )
    (
        rows.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(table_dir)
    )
    after = partition_file_census(spark, table_dir, partition_cols)
    return [
        {
            "key": k,
            "files_before": census[k][0],
            "files_after": after.get(k, (0, 0))[0],
            "bytes": census[k][1],
        }
        for k in victims
    ]
