"""Single-writer maintenance lease (operators/ixlock.py): the guard that
serializes read-then-overwrite maintenance on one index. Exclusion,
release-on-exit (including on error), stale-holder reclaim, scheme-
qualified paths, and the streaming folds' acquire/release behavior."""

from __future__ import annotations

import os
import time

import pytest

from vacancy_analyser_spark.operators import ixlock
from vacancy_analyser_spark.operators.ixlock import (
    LeaseHeld,
    maintenance_lease,
    release,
    try_acquire,
)


def test_acquire_is_exclusive_until_released(spark, tmp_path):
    path = str(tmp_path / "idx")
    assert try_acquire(spark, path, "a")
    assert not try_acquire(spark, path, "b")
    release(spark, path)
    assert try_acquire(spark, path, "b")
    release(spark, path)


def test_contextmanager_releases_on_success_and_error(spark, tmp_path):
    path = str(tmp_path / "idx2")
    with maintenance_lease(spark, path, "a"):
        assert not try_acquire(spark, path, "b")
        assert os.path.exists(os.path.join(path, ixlock.LEASE_NAME))
    assert try_acquire(spark, path, "b")
    release(spark, path)

    with pytest.raises(RuntimeError, match="boom"):
        with maintenance_lease(spark, path, "a"):
            raise RuntimeError("boom")
    assert try_acquire(spark, path, "c")
    release(spark, path)


def test_fails_fast_then_waits_with_timeout(spark, tmp_path):
    path = str(tmp_path / "idx3")
    assert try_acquire(spark, path, "holder")
    with pytest.raises(LeaseHeld):
        with maintenance_lease(spark, path, "b", timeout=0.0):
            pass
    t0 = time.monotonic()
    with pytest.raises(LeaseHeld):
        with maintenance_lease(spark, path, "b", timeout=1.5, poll=0.3):
            pass
    assert time.monotonic() - t0 >= 1.4
    release(spark, path)


def test_stale_holder_is_reclaimed(spark, tmp_path):
    path = str(tmp_path / "idx4")
    assert try_acquire(spark, path, "crashed")
    marker = os.path.join(path, ixlock.LEASE_NAME)
    old = time.time() - 3600
    os.utime(marker, (old, old))
    assert not try_acquire(spark, path, "b", break_after=2 * 3600)
    assert try_acquire(spark, path, "b", break_after=60)
    release(spark, path)


def test_scheme_qualified_path(spark, tmp_path):
    path = f"file:{tmp_path / 'idx5'}"
    with maintenance_lease(spark, path, "a"):
        assert not try_acquire(spark, path, "b")
    assert try_acquire(spark, path, "b")
    release(spark, path)


def test_leased_fold_serializes_and_cleans_up(spark, tmp_path):
    """The fold wrapper: runs under the lease (a held lease fails the
    batch), releases afterward, and skips empty batches without ever
    touching the lease."""
    from vacancy_analyser_spark.streaming.ann_ingest import _leased

    path = str(tmp_path / "idx6")
    calls = []

    def fold(df, bid):
        calls.append(bid)
        assert not try_acquire(df.sparkSession, path, "intruder")

    wrapped = _leased(path, "test", fold, lease_timeout=0.0)
    batch = spark.createDataFrame([(1,)], "vec_id long")
    wrapped(batch, 0)
    assert calls == [0]
    assert try_acquire(spark, path, "after")  # fold released it
    # fold refuses to run while another writer holds the lease
    with pytest.raises(LeaseHeld):
        wrapped(batch, 1)
    assert calls == [0]
    release(spark, path)

    empty = spark.createDataFrame([], "vec_id long")
    assert try_acquire(spark, path, "holder")
    wrapped(empty, 2)  # empty batch: no lease contention, no fold call
    assert calls == [0]
    release(spark, path)
