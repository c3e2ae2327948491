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


def test_leases_are_per_index_writers_do_not_serialize(spark, tmp_path):
    """r12: the lease is scoped to ONE index path — two maintenance
    loops on DIFFERENT indexes hold their leases simultaneously (a
    command-log applier per index must not serialize against its
    siblings). Proven nested: while A's fold holds A's lease, taking
    B's lease succeeds, and vice versa."""
    from vacancy_analyser_spark.streaming.ann_ingest import _leased

    a, b = str(tmp_path / "ixA"), str(tmp_path / "ixB")
    order = []

    def fold_b(df, bid):
        order.append(("b", bid))

    wrapped_b = _leased(b, "owner-b", fold_b, lease_timeout=0.0)

    def fold_a(df, bid):
        order.append(("a", bid))
        # A's lease is held right now; B's applier must still run
        wrapped_b(df, bid)
        assert not try_acquire(df.sparkSession, a, "x")  # A still held
        assert try_acquire(df.sparkSession, b, "x")  # B released by its fold
        release(df.sparkSession, b)

    batch = spark.createDataFrame([(1,)], "vec_id long")
    _leased(a, "owner-a", fold_a, lease_timeout=0.0)(batch, 7)
    assert order == [("a", 7), ("b", 7)]
    assert try_acquire(spark, a, "after") and try_acquire(spark, b, "after")
    release(spark, a)
    release(spark, b)


def test_second_owner_same_index_fails_fast_mid_fold(spark, tmp_path):
    """r12: a second owner pointed at the SAME index fails with
    LeaseHeld while the first is mid-fold — no deadlock, no silent
    interleave. (timeout=0 is the fold default's fail-fast bound; the
    production DEFAULT_LEASE_TIMEOUT turns this into bounded waiting,
    never an unbounded block.)"""
    from vacancy_analyser_spark.streaming.ann_ingest import _leased

    path = str(tmp_path / "ixSame")
    batch = spark.createDataFrame([(1,)], "vec_id long")
    second = _leased(path, "late-writer", lambda df, bid: None, lease_timeout=0.0)

    def fold(df, bid):
        with pytest.raises(LeaseHeld):
            second(df, bid)  # fails fast INSIDE the first owner's hold

    _leased(path, "first-writer", fold, lease_timeout=0.0)(batch, 0)
    assert try_acquire(spark, path, "after")
    release(spark, path)


def test_heartbeat_keeps_long_hold_alive(spark, tmp_path):
    """r12 (advisor item): a hold LONGER than break_after must not be
    reclaimed — the daemon heartbeat refreshes the marker mtime, so
    staleness means 'holder stopped', never 'holder is slow'. A 5 s hold
    under break_after=2 s stays exclusive throughout."""
    path = str(tmp_path / "ixBeat")
    deadline = time.monotonic() + 5.0
    with maintenance_lease(spark, path, "slow-retrain", break_after=2.0):
        while time.monotonic() < deadline:
            # an aggressive reclaimer polling the whole time never wins
            assert not try_acquire(spark, path, "usurper", break_after=2.0)
            time.sleep(0.5)
    assert try_acquire(spark, path, "usurper", break_after=2.0)
    release(spark, path)


def test_release_after_reclaim_raises_and_preserves_new_marker(spark, tmp_path):
    """r12 (advisor item): a holder whose lease was reclaimed must NOT
    delete the new holder's marker on release — it raises LeaseLost and
    leaves the marker in place, so no third writer gets admitted."""
    from vacancy_analyser_spark.operators.ixlock import LeaseLost, heartbeat

    path = str(tmp_path / "ixLost")
    assert try_acquire(spark, path, "a-token")
    marker = os.path.join(path, ixlock.LEASE_NAME)
    old = time.time() - 3600
    os.utime(marker, (old, old))
    assert try_acquire(spark, path, "b-token", break_after=60)  # reclaim

    with pytest.raises(LeaseLost):
        heartbeat(spark, path, "a-token")  # displaced holder notices
    with pytest.raises(LeaseLost):
        release(spark, path, owner="a-token")
    # b's lease survived a's release attempt: still exclusive...
    assert not try_acquire(spark, path, "c-token", break_after=60)
    # ...and b's own conditional release works
    release(spark, path, owner="b-token")
    assert try_acquire(spark, path, "c-token")
    release(spark, path)


def test_crashed_holder_replay_reclaims_and_folds(spark, tmp_path):
    """r12: the crash-replay story end-to-end at the fold wrapper — a
    crashed prior owner's stale marker (hours-old mtime, no process
    behind it) must not wedge the restarted applier: the next fold
    reclaims the lease, applies the batch, and releases."""
    from vacancy_analyser_spark.streaming.ann_ingest import _leased

    path = str(tmp_path / "ixCrash")
    assert try_acquire(spark, path, "crashed-owner")
    marker = os.path.join(path, ixlock.LEASE_NAME)
    old = time.time() - 7200  # well past DEFAULT_BREAK_AFTER
    os.utime(marker, (old, old))

    calls = []
    batch = spark.createDataFrame([(1,)], "vec_id long")
    _leased(path, "restarted", lambda df, bid: calls.append(bid), 0.0)(batch, 3)
    assert calls == [3]
    assert try_acquire(spark, path, "after")  # released cleanly
    release(spark, path)


def test_concurrent_acquire_admits_exactly_one_winner(spark, tmp_path):
    """The dual-acquire race on the local scheme: LocalFileSystem.create
    (overwrite=false) is check-then-create, so two acquirers racing one
    empty slot could both pass the exists check — the second create then
    truncates the first holder's marker and the first holder's release
    reads a torn token (LeaseLost mid-hold with no actual reclaim).
    Acquisition must be a true mutex on file://: many threads racing one
    slot admit exactly one winner, and the marker carries that winner's
    token intact."""
    import threading

    path = str(tmp_path / "idx")
    for _ in range(20):
        winners: list[str] = []
        barrier = threading.Barrier(8)

        def worker(tok: str) -> None:
            barrier.wait()
            if try_acquire(spark, path, tok):
                winners.append(tok)

        threads = [
            threading.Thread(target=worker, args=(f"t{i}",)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(winners) == 1
        marker = tmp_path / "idx" / ixlock.LEASE_NAME
        assert marker.read_text().strip() == winners[0]
        release(spark, path, owner=winners[0])
