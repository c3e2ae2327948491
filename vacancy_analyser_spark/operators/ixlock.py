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
acquired through an atomic create-exclusive — ``create(path,
overwrite=false)`` on HDFS, ``java.io.File.createNewFile`` (O_EXCL) on
the local scheme, where Hadoop's LocalFileSystem create is only
check-then-create and two racing acquirers could otherwise both
"succeed" with a torn marker. Semantics and limits, stated plainly:

- On HDFS and file:// acquisition is a
  true mutex. On S3A, create-no-overwrite is check-then-put and two
  near-simultaneous acquirers can both succeed — the lease is then a
  strong advisory guard (it still serializes every well-behaved writer
  and catches the overwhelmingly common operational mistake of two
  resident loops on one index), not a distributed lock. Deployments
  needing hard mutual exclusion on object stores should point the lease
  at an HDFS/ZK path — the API takes any scheme.
- The marker carries the holder's unique OWNER TOKEN, and release is
  conditional on it: a holder whose lease was reclaimed (its marker
  replaced by another writer's) raises :class:`LeaseLost` instead of
  silently deleting the new holder's marker — the r11 advisory's
  lost-lease cascade (A's stale release deletes B's lease, admitting C
  mid-write) cannot happen.
- A live holder HEARTBEATS: ``maintenance_lease`` refreshes the marker
  mtime from a daemon thread every ``break_after/4`` seconds, so a hold
  longer than ``break_after`` (global retrain is deliberately
  corpus-scale) is never mistaken for a crash. Only a holder that
  actually stopped heartbeating (crashed process, hung JVM) goes stale.
- A crashed holder's marker is reclaimed after ``break_after`` seconds
  of mtime staleness — and the reclaim is CONDITIONAL: the stale marker
  is renamed aside (atomic) and its token re-verified before the sweep,
  so a fresh lease created between the staleness check and the reclaim
  is never deleted (the unconditional stat-then-delete race of r11).

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
import threading
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from . import fsutil

#: Marker file name, placed directly under the table/index root.
LEASE_NAME = "_MAINTENANCE_LEASE"

#: Default seconds of marker staleness after which a lease is presumed
#: abandoned by a crashed holder and may be reclaimed. A LIVE holder
#: refreshes the marker mtime every ``break_after/4`` seconds from the
#: heartbeat thread, so staleness really does mean "holder stopped".
DEFAULT_BREAK_AFTER = 30 * 60


class LeaseHeld(RuntimeError):
    """Another writer holds the table's maintenance lease."""


class LeaseLost(RuntimeError):
    """The caller's lease marker is gone or owned by another writer —
    the hold was reclaimed mid-write. The work committed under it may
    have raced the new holder; surfacing that beats silently deleting
    the new holder's marker and admitting a third writer."""


def _lease_path(table_path: str) -> str:
    return os.path.join(table_path, LEASE_NAME)


def _read_token(spark: SparkSession, fs, p) -> str | None:
    """First line of the marker (the holder's token); None if unreadable
    (vanished between stat and open — treated as 'not ours')."""
    jvm = spark.sparkContext._jvm
    try:
        stream = fs.open(p)
    except Exception:
        return None
    try:
        reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream))
        line = reader.readLine()
        return None if line is None else str(line)
    except Exception:
        return None
    finally:
        try:
            stream.close()
        except Exception:
            pass


def try_acquire(
    spark: SparkSession,
    table_path: str,
    owner: str,
    break_after: float = DEFAULT_BREAK_AFTER,
) -> bool:
    """Attempt to take the lease; True on success. ``owner`` must be a
    UNIQUE token (``maintenance_lease`` generates one) — it is written
    into the marker and verified by :func:`release` and the reclaim path.

    Reclaim protocol for a marker whose mtime is older than
    ``break_after`` seconds: rename it aside (atomic — exactly one
    reclaimer wins, and a fresh marker created by a racing acquirer has
    a different identity), re-read the token from the renamed file, and
    only if it still matches the stale token observed is the reclaim
    committed. A mismatch means the rename grabbed a FRESH lease created
    in the race window — it is renamed back into place and the acquire
    fails. (If the rename-back itself loses a race, the aside file is
    left for the displaced holder's release to detect via
    :class:`LeaseLost` — surfaced, never silent.)"""
    fs, p = fsutil._fs_path(spark, _lease_path(table_path))
    root = p.getParent()
    if not fs.exists(root):
        fs.mkdirs(root)
    if fs.exists(p):
        try:
            age = time.time() - fs.getFileStatus(p).getModificationTime() / 1000.0
        except Exception:
            return False  # vanished mid-check: its holder is active
        if age <= break_after:
            return False
        stale_tok = _read_token(spark, fs, p)
        jvm = spark.sparkContext._jvm
        aside = jvm.org.apache.hadoop.fs.Path(
            str(p) + f".reclaim-{uuid.uuid4().hex[:8]}"
        )
        try:
            if not fs.rename(p, aside):
                return False  # marker replaced/removed concurrently
        except Exception:
            return False
        if _read_token(spark, fs, aside) != stale_tok:
            # grabbed a fresh lease created in the race window — restore
            try:
                fs.rename(aside, p)
            except Exception:
                pass  # displaced holder's release raises LeaseLost
            return False
        fs.delete(aside, False)
    jvm = spark.sparkContext._jvm
    if (p.toUri().getScheme() or "file") == "file":
        # LocalFileSystem.create(p, overwrite=false) is check-THEN-create:
        # two acquirers racing the same empty slot can both pass the check,
        # and the second create truncates the first holder's marker (and
        # its .crc), so the first holder's release reads a torn token and
        # raises LeaseLost — the dual-acquire the lease exists to prevent.
        # java.io.File.createNewFile is O_CREAT|O_EXCL — a true mutex on
        # the local scheme. The token write happens after the exclusive
        # create; no .crc is written, so checksum readers skip verification.
        f = jvm.java.io.File(p.toUri().getPath())
        try:
            if not f.createNewFile():
                return False
        except Exception:
            return False
        try:
            out = jvm.java.io.FileOutputStream(f)
            try:
                out.write(bytearray(f"{owner}\n".encode()))
            finally:
                out.close()
            return True
        except Exception:
            return False
    try:
        out = fs.create(p, False)  # overwrite=false → atomic on HDFS
        try:
            out.write(bytearray(f"{owner}\n".encode()))
        finally:
            out.close()
        return True
    except Exception:
        return False


def heartbeat(spark: SparkSession, table_path: str, owner: str) -> None:
    """Refresh the held marker's mtime (the holder's liveness signal).
    Raises :class:`LeaseLost` if the marker is gone or carries another
    owner's token — the hold was reclaimed and the op should stop
    instead of racing the new holder."""
    fs, p = fsutil._fs_path(spark, _lease_path(table_path))
    if not fs.exists(p) or _read_token(spark, fs, p) != owner:
        raise LeaseLost(
            f"maintenance lease on {table_path} no longer belongs to "
            f"{owner!r} — reclaimed by another writer mid-hold"
        )
    now = int(time.time() * 1000)
    fs.setTimes(p, now, now)


def release(spark: SparkSession, table_path: str, owner: str | None = None) -> None:
    """Drop the lease. With ``owner`` (always passed by
    ``maintenance_lease``) the delete is conditional on the marker still
    carrying that token; a mismatch raises :class:`LeaseLost` WITHOUT
    deleting — the marker belongs to the writer that reclaimed the
    hold, and removing it would admit a third writer mid-write.
    ``owner=None`` is the unconditional administrative sweep (breaking a
    known-dead lease by hand) and should not appear in op code."""
    fs, p = fsutil._fs_path(spark, _lease_path(table_path))
    if owner is not None:
        if not fs.exists(p):
            raise LeaseLost(
                f"maintenance lease marker on {table_path} vanished during "
                f"{owner!r}'s hold — reclaimed (and released) by another writer"
            )
        tok = _read_token(spark, fs, p)
        if tok != owner:
            raise LeaseLost(
                f"maintenance lease on {table_path} is now held by {tok!r}, "
                f"not {owner!r} — the hold was reclaimed mid-write; leaving "
                "the new holder's marker in place"
            )
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
    timeout polls every ``poll`` seconds before giving up.

    While held, a daemon thread refreshes the marker mtime every
    ``break_after/4`` seconds so a long hold (global retrain, full
    compaction) is never reclaimed as stale. On exit the release
    verifies the marker still carries this hold's token and raises
    :class:`LeaseLost` if not — unless the block itself raised, in
    which case the original error propagates and the lost lease is
    swallowed (it is a consequence, not the cause)."""
    base = owner or f"{os.getpid()}"
    who = f"{base}-{uuid.uuid4().hex[:12]}"
    deadline = time.monotonic() + timeout
    while not try_acquire(spark, table_path, who, break_after):
        if time.monotonic() >= deadline:
            raise LeaseHeld(
                f"maintenance lease on {table_path} is held by another "
                "writer; concurrent read-then-overwrite maintenance loses "
                "updates — serialize writers or raise the timeout"
            )
        time.sleep(poll)
    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(max(1.0, break_after / 4.0)):
            try:
                heartbeat(spark, table_path, who)
            except LeaseLost:
                return  # release() will surface it with full context
            except Exception:
                continue  # transient FS error: retry at the next tick

    t = threading.Thread(target=_beat, name=f"lease-heartbeat-{base}", daemon=True)
    t.start()
    try:
        yield
    except BaseException:
        stop.set()
        t.join(timeout=5.0)
        try:
            release(spark, table_path, owner=who)
        except LeaseLost:
            pass  # the body's error is the story; the lost lease is fallout
        raise
    else:
        stop.set()
        t.join(timeout=5.0)
        release(spark, table_path, owner=who)
