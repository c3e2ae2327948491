"""Hadoop FileSystem helpers shared by every partition-sweeping operator.

Dynamic partition overwrite cannot express "this partition is now empty":
a rewrite that produces zero rows for a directory simply never touches it,
so the old files keep serving dead rows. Each maintenance op therefore
sweeps fully-emptied partition directories explicitly — and the sweep MUST
go through the Hadoop FileSystem API. The tables these ops maintain (IVF
vectors/, the id→centroid lookup, the partitioned state store) live
wherever their path string points — HDFS, s3a://, file: — and
``shutil``/``os.path`` either raise on a scheme-qualified URI or, worse,
resolve it against the local filesystem and silently misread. One
implementation here; ``partitioned_state``, ``ivf_index_delete`` and the
lookup refresh all route through it.

Failure discipline (inherited from the original partitioned_state sweep):
a delete that returns False with the path still present RAISES — silently
keeping the files means deleted rows resurrect on the next read, which is
corruption, not a warning.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, qualified Path) for a path string of ANY scheme —
    the filesystem is resolved per-path, so one sweep call can serve a
    local checkout and an object-store deployment unchanged."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, fs.makeQualified(p)


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def child_names(spark: SparkSession, path: str) -> list[str]:
    """Names of the direct children of ``path`` ([] if it doesn't exist)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def delete_dir(spark: SparkSession, path: str, if_exists: bool = False) -> bool:
    """Recursively delete ``path``; raise if the delete fails with the
    path still present. ``if_exists=True`` makes a missing path a no-op
    (returns False) instead of delegating to the filesystem's
    delete-of-missing semantics, which differ between HDFS and local."""
    fs, p = _fs_path(spark, path)
    if if_exists and not fs.exists(p):
        return False
    if not fs.delete(p, True) and fs.exists(p):
        raise IOError(
            f"partition sweep failed to delete {path}; "
            "deleted rows would resurrect on the next read"
        )
    return True


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Rename ``src`` to ``dst`` — the atomic-publish primitive behind the
    global-retrain swap (directory rename is atomic on HDFS; on object
    stores it degrades to copy+delete, which is why the swap sequence is
    designed so every intermediate crash state is recoverable rather than
    assuming atomicity). Raises on failure: a half-published index is
    corruption, not a warning."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    if not fs.rename(s, d):
        raise IOError(f"rename {src} -> {dst} failed; index swap aborted")


def recover_swap(spark: SparkSession, live: str, staging: str, retired: str) -> bool:
    """Heal an interrupted staged-rename swap (build ``staging`` → rename
    ``live``→``retired`` → rename ``staging``→``live`` → delete
    ``retired``) before a new attempt sweeps its directories. Crash
    states, by what survives:

    - ``live`` present: any leftover staging/retired is stale residue of
      a completed or abandoned attempt — the caller may sweep it freely.
    - ``live`` missing, ``staging`` present: the crash hit between the
      two renames. The staging build is complete (it finished before the
      retire rename started), so finish the interrupted publish.
    - ``live`` missing, only ``retired`` present: restore the retired
      copy — the pre-swap index is complete and is the only survivor.

    Sweeping staging/retired *without* this check in the live-missing
    states would delete the only complete copies on disk — total index
    loss on what the swap sequence documents as a recoverable state.
    Returns True iff a recovery rename ran."""
    fs, live_p = _fs_path(spark, live)
    if fs.exists(live_p):
        return False
    if exists(spark, staging):
        rename(spark, staging, live)
        return True
    if exists(spark, retired):
        rename(spark, retired, live)
        return True
    raise IOError(
        f"no live index at {live} and neither {staging} nor {retired} "
        "survives — nothing to recover from"
    )


def prune_empty_parents(spark: SparkSession, start: str, root: str) -> None:
    """Remove empty ancestor directories of ``start`` (exclusive) up to
    ``root`` (exclusive) — a nested partition layout can leave a hollow
    parent tree behind a swept leaf, and listings should never show it.
    Stops at the first non-empty ancestor."""
    fs, root_p = _fs_path(spark, root)
    _, start_p = _fs_path(spark, start)
    parent = start_p.getParent()
    while parent is not None and not parent.equals(root_p):
        if not fs.exists(parent) or len(fs.listStatus(parent)) > 0:
            break
        # non-recursive delete: anything that raced a row in loses nothing
        if not fs.delete(parent, False) and fs.exists(parent):
            raise IOError(f"failed to prune emptied parent directory {parent}")
        parent = parent.getParent()
