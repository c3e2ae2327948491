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
- SELECT: a partition is fragmented when its file count exceeds what the
  REWRITE could produce for it — beyond ``max(ceil(bytes /
  target_file_bytes), ceil(rows / max_records_per_file))``, with 2×
  slack for multi-file expectations (the salted rewrite's reachable
  worst case — see ``fragmented_keys``). Both bounds matter: selecting on
  bytes alone re-flags every partition whose rows exceed the per-file
  record bound but whose bytes fit one file (typical embedding rows are
  well under 2.5 KB, so 50k rows is far below 128 MB), rewriting it into
  the same ≥2 files on EVERY call — perpetual churn under a resident
  ``compact_every`` loop. Folding the record bound in makes selection
  exactly the rewrite's fixed point: a freshly compacted partition can
  never be re-selected, so compaction is idempotent (tested, including
  the >max_records <target_bytes churn case) and untouched partitions
  stay byte-identical. Row counts come from one zero-data-column count
  grouped on the partition key — parquet answers it from footers.
- REWRITE: read ONLY the fragmented partitions (OR-of-AND literal
  partition filter → planning-time pruning), cluster by partition key —
  salted into ``ceil(rows / max_records_per_file)`` sub-tasks when a hot
  key holds more rows than one right-sized file, so one giant partition
  compacts in parallel instead of one task emitting its files
  sequentially — and dynamic-partition-overwrite them with
  ``maxRecordsPerFile`` bounding file size: the reference feeder's own
  output discipline (feeder_hadoop.py:20 ``ROWS_PER_FILE = 50000``)
  applied as maintenance instead of only at first write. The salt is a
  deterministic hash of the row (xxhash64 over all columns), never
  rand()/monotonic ids — a nondeterministic repartition key corrupts
  data under task retry. The localCheckpoint breaks lineage to the
  files being replaced (same trick as the add's read-then-append).

Cost tracks the FRAGMENTED fraction, not the table: a changeset-shaped
nightly compact after a day of streaming ingest reads and writes only the
partitions the day's batches touched.

Concurrency contract: compaction is read-then-overwrite, NOT transactional
against concurrent writers — rows appended to a victim partition between
the localCheckpoint read and the overwrite commit would be dropped. One
writer per table at a time: either run compaction from inside the same
foreachBatch loop that owns the table (``compact_every=`` in the ingest
streams does exactly this) or take the table's maintenance lease
(operators/ixlock.py) around any out-of-band compact.

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


def partition_row_counts(
    spark: SparkSession, table_dir: str, partition_cols: tuple[str, ...]
) -> dict[tuple, int]:
    """{partition key tuple: row count}. The projection is the partition
    columns only (directory-derived), so parquet serves the counts from
    file footers — metadata-sized like the census, collect bounded by the
    partition count."""
    return {
        tuple(r[c] for c in partition_cols): r["__n"]
        for r in spark.read.parquet(table_dir)
        .groupBy(*partition_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }


def expected_files(
    n_bytes: int,
    n_rows: int,
    target_file_bytes: int = TARGET_FILE_BYTES,
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
) -> int:
    """File count the rewrite would produce for a partition — the
    selection threshold MUST be this (not bytes alone) or partitions the
    record bound forces into ≥2 files are re-rewritten forever."""
    return max(
        1,
        math.ceil(n_bytes / target_file_bytes),
        math.ceil(n_rows / max_records_per_file),
    )


def fragmented_keys(
    census: dict[tuple, tuple[int, int]],
    target_file_bytes: int = TARGET_FILE_BYTES,
    row_counts: dict[tuple, int] | None = None,
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
) -> list[tuple]:
    """Partition keys holding more files than the rewrite could produce.
    Without ``row_counts`` the record bound is skipped (bytes-only — the
    quick census-side preview); ``compact_partitions`` always passes
    counts so its selection is the rewrite's exact fixed point."""
    rc = row_counts or {}
    out = []
    for k, (n_files, n_bytes) in census.items():
        e = expected_files(
            n_bytes, rc.get(k, 0), target_file_bytes, max_records_per_file
        )
        # Multi-file expectations trigger at 2× the right-sized count:
        # the salted rewrite hashes rows into e buckets, and when the
        # partition sits at an exact multiple of the record bound roughly
        # half the buckets overfill by one file — outputs up to ~2e are
        # reachable, and any reachable output must NOT be re-selected
        # (it would be deterministically re-produced forever). 2e is the
        # rewrite's hard ceiling short of a pathologically skewed hash
        # (a bucket >2× the bound), so the fixed point holds and a
        # stream must double a partition's file count past right-size
        # before compaction touches it again — the standard trigger
        # laziness for maintenance sweeps. Single-file expectations stay
        # exact: anything beyond 1 file is fragmentation there.
        if n_files > (2 * e if e > 1 else 1):
            out.append(k)
    return sorted(out)


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
    if not census:
        return []
    counts = partition_row_counts(spark, table_dir, partition_cols)
    victims = fragmented_keys(
        census, target_file_bytes, counts, max_records_per_file
    )
    if not victims:
        return []
    rows = (
        spark.read.parquet(table_dir)
        .filter(keys_filter(partition_cols, victims))
        .localCheckpoint(eager=True)
    )
    # One task per key is right while a victim fits one output file; a
    # hot key holding many right-sized files' worth of rows is salted
    # across exactly that many buckets (per-key modulus — a global salt
    # would shred small victims' single files) so the biggest partition
    # no longer serializes the whole rewrite. The salt is a deterministic
    # row hash — retry-safe where rand() is not.
    per_key_expected = {
        k: expected_files(
            census[k][1], counts.get(k, 0), target_file_bytes,
            max_records_per_file,
        )
        for k in victims
    }
    key_cols = [F.col(c) for c in partition_cols]
    if max(per_key_expected.values()) > 1:
        modulus = F.lit(1)
        for k, e in per_key_expected.items():
            if e > 1:
                cond = ft.reduce(
                    lambda x, y: x & y,
                    [F.col(c) == F.lit(v) for c, v in zip(partition_cols, k)],
                )
                modulus = F.when(cond, F.lit(e)).otherwise(modulus)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in rows.columns]), modulus
        )
        shaped = rows.repartition(*key_cols, salt)
    else:
        shaped = rows.repartition(*key_cols)
    (
        shaped.write.mode("overwrite")
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
