"""Property-based merge tests (SURVEY §5.4): idempotence, key conservation,
and lifecycle invariants over randomized snapshot sequences.

Each hypothesis example spins Spark jobs, so examples are few and tiny —
the value is in the randomized *shapes* (overlaps, re-inserts, archived
rows, empty snapshots), not volume.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vacancy_analyser_spark.operators.merge import (
    bootstrap_state,
    merge_snapshot,
    merge_snapshots,
)

SNAP_DDL = "id long, payload long, archived boolean"

ids = st.integers(min_value=0, max_value=7)
row = st.tuples(ids, st.integers(min_value=0, max_value=3), st.booleans())
snapshot = st.lists(row, max_size=8, unique_by=lambda r: r[0])
D1, D2, D3 = dt.date(2024, 1, 1), dt.date(2024, 1, 8), dt.date(2024, 1, 15)


def _df(spark, rows):
    return spark.createDataFrame([(int(i), int(p), bool(a)) for i, p, a in rows], SNAP_DDL)


def _collect(state):
    return sorted(tuple(r) for r in state.collect())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(s1=snapshot, s2=snapshot)
def test_merge_idempotent(spark, s1, s2):
    """Replaying the same snapshot at the same date must be a no-op."""
    state = bootstrap_state(_df(spark, s1), D1)
    once = merge_snapshot(state, _df(spark, s2), D2)
    twice = merge_snapshot(once, _df(spark, s2), D2)
    assert _collect(twice) == _collect(once)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(s1=snapshot, s2=snapshot)
def test_merge_conserves_keys_and_lifecycle(spark, s1, s2):
    state = merge_snapshot(bootstrap_state(_df(spark, s1), D1), _df(spark, s2), D2)
    rows = {r["id"]: r for r in state.collect()}

    live1 = {i for i, _, a in s1 if not a}
    live2 = {i for i, _, a in s2 if not a}
    # key conservation: every key ever seen live is in the state, nothing else
    assert set(rows) == live1 | live2

    for r in rows.values():
        # lifecycle ordering invariants
        assert r["added_at"] <= r["updated_at"]
        if r["removed_at"] is not None:
            assert r["removed_at"] >= r["added_at"]
    # removed_at set exactly for keys that disappeared
    for i in live1 - live2:
        assert rows[i]["removed_at"] == D2
    for i in live2:
        assert rows[i]["removed_at"] is None


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(s1=snapshot, s2=snapshot, s3=snapshot)
def test_sequential_equals_batch_fold(spark, s1, s2, s3):
    """merge_snapshots([...]) must equal folding the merges by hand."""
    manual = merge_snapshot(
        merge_snapshot(bootstrap_state(_df(spark, s1), D1), _df(spark, s2), D2),
        _df(spark, s3),
        D3,
    )
    batch = merge_snapshots(
        None, [(D1, _df(spark, s1)), (D2, _df(spark, s2)), (D3, _df(spark, s3))]
    )
    assert _collect(batch) == _collect(manual)
