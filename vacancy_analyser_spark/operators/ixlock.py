"""Single-writer maintenance lease for partitioned tables.

Every maintenance op over a materialized index/state layout here —
``compact_partitions``, ``ivf_index_delete``, the lookup-bucket refresh,
``merge_changeset_partitioned`` — is read-then-dynamic-overwrite: it
localCheckpoints the rows it will rewrite, then commits an overwrite of
the victim partitions. That sequence is NOT transactional against a
concurrent writer: rows appended to a victim partition between the read
and the commit are silently dropped — data loss, not just churn. The
repo's streams were designed around a single-owner loop (``compact_every=``
runs compaction from inside the same foreachBatch that owns the ingest),
but nothing previously *enforced* the requirement when a takedown stream
and an ingest stream (or an out-of-band nightly compact) were pointed at
the same table.

This module is that enforcement: a lease marker file beside the table,
acquired through the Hadoop FileSystem's atomic ``create(path,
overwrite=false)``. Semantics and limits, stated plainly:

- On HDFS (and any FS with atomic create-exclusive) acquisition is a
  true mutex. On S3A, create-no-overwrite is check-then-put and two
  near-simultaneous acquirers can both succeed — the lease is then a
  strong advisory guard (it still serializes every well-behaved writer
  and catches the overwhelmingly common operational mistake of two
  resident loops on one index), not a distributed lock. Deployments
  needing hard mutual exclusion on object stores should point the lease
  at an HDFS/ZK path — the API takes any scheme.
- A crashed holder leaves its marker behind; ``break_after`` seconds of
  staleness lets the next acquirer reclaim it (the holder's heartbeat is
  the marker's mtime, rewritten on acquire).

The streaming loops in streaming/ann_ingest.py take this lease around
every fold by default, so an ingest stream, a takedown stream and an
external compact on the same index serialize instead of corrupting.
Batch ops stay lease-free by themselves (a lease per call would double
every op's FS round-trips inside an already-held lease) and document the
single-writer requirement; wrap out-of-band maintenance in
``maintenance_lease(...)`` explicitly.
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from . import fsutil

#: Marker file name, placed directly under the table/index root.
LEASE_NAME = "_MAINTENANCE_LEASE"

#: Default seconds of marker staleness after which a lease is presumed
#: abandoned by a crashed holder and may be reclaimed. Generous on
#: purpose: reclaiming a *live* holder's lease reintroduces the lost-
#: update race the lease exists to prevent.
DEFAULT_BREAK_AFTER = 30 * 60


class LeaseHeld(RuntimeError):
    """Another writer holds the table's maintenance lease."""


def _lease_path(table_path: str) -> str:
    return os.path.join(table_path, LEASE_NAME)


def try_acquire(
    spark: SparkSession,
    table_path: str,
    owner: str,
    break_after: float = DEFAULT_BREAK_AFTER,
) -> bool:
    """Attempt to take the lease; True on success. Reclaims a marker
    whose mtime is older than ``break_after`` seconds (crashed holder)."""
    fs, p = fsutil._fs_path(spark, _lease_path(table_path))
    root = p.getParent()
    if not fs.exists(root):
        fs.mkdirs(root)
    if fs.exists(p):
        age = time.time() - fs.getFileStatus(p).getModificationTime() / 1000.0
        if age <= break_after:
            return False
        # stale marker from a crashed holder — sweep and fall through to
        # the atomic create (a racing reclaimer loses there, not here)
        fs.delete(p, False)
    try:
        out = fs.create(p, False)  # overwrite=false → atomic exclusive
        try:
            out.write(bytearray(f"{owner}\n".encode()))
        finally:
            out.close()
        return True
    except Exception:
        return False


def release(spark: SparkSession, table_path: str) -> None:
    fsutil.delete_dir(spark, _lease_path(table_path), if_exists=True)


@contextmanager
def maintenance_lease(
    spark: SparkSession,
    table_path: str,
    owner: str | None = None,
    timeout: float = 0.0,
    poll: float = 1.0,
    break_after: float = DEFAULT_BREAK_AFTER,
):
    """Hold the table's single-writer lease for the duration of the block.

    ``timeout=0`` fails fast with :class:`LeaseHeld` when the lease is
    taken (the right default inside a foreachBatch fold — backpressure
    belongs to the stream's trigger, not a hidden sleep); a positive
    timeout polls every ``poll`` seconds before giving up."""
    who = owner or f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
    deadline = time.monotonic() + timeout
    while not try_acquire(spark, table_path, who, break_after):
        if time.monotonic() >= deadline:
            raise LeaseHeld(
                f"maintenance lease on {table_path} is held by another "
                "writer; concurrent read-then-overwrite maintenance loses "
                "updates — serialize writers or raise the timeout"
            )
        time.sleep(poll)
    try:
        yield
    finally:
        release(spark, table_path)
