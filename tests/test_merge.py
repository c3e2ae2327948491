"""D1/D2 merge-operator tests — FIXTURES.md §2 scenario coverage, each case
cited to the reference behavior it encodes (feeder_postgres.py:111-194)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vacancy_analyser_spark.operators.merge import (
    MergeOrderError,
    bootstrap_state,
    merge_snapshot,
    merge_snapshots,
    state_max_date,
)

D1 = dt.date(2024, 1, 1)
D2 = dt.date(2024, 1, 8)
D3 = dt.date(2024, 1, 15)

SNAP_SCHEMA = "id long, name string, salary long, archived boolean"


def snap(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


def by_id(state):
    return {r["id"]: r.asDict() for r in state.collect()}


@pytest.fixture()
def base_state(spark):
    return bootstrap_state(
        snap(
            spark,
            [
                (1, "dev", 100, False),
                (2, "ops", 200, False),
                (3, "qa", 300, False),
            ],
        ),
        D1,
    )


def test_bootstrap_lifecycle(base_state):
    rows = by_id(base_state)
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["added_at"] == D1 and r["updated_at"] == D1 and r["removed_at"] is None


def test_insert_new_id(spark, base_state):
    """New id → added_at = updated_at = snapshot date (:144-150)."""
    s2 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False),
                      (3, "qa", 300, False), (4, "pm", 400, False)])
    rows = by_id(merge_snapshot(base_state, s2, D2))
    assert rows[4]["added_at"] == D2 and rows[4]["updated_at"] == D2
    assert rows[4]["removed_at"] is None


def test_unchanged_keeps_updated_at(spark, base_state):
    """Identical row → no updated_at bump (:162-177, no diff → no update)."""
    s2 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False), (3, "qa", 300, False)])
    rows = by_id(merge_snapshot(base_state, s2, D2))
    assert all(r["updated_at"] == D1 for r in rows.values())


def test_field_update_bumps_updated_at(spark, base_state):
    """Changed column → new value, updated_at = snapshot date, added_at
    keeps the original (:154, :173-177)."""
    s2 = snap(spark, [(1, "dev", 150, False), (2, "ops", 200, False), (3, "qa", 300, False)])
    rows = by_id(merge_snapshot(base_state, s2, D2))
    assert rows[1]["salary"] == 150
    assert rows[1]["updated_at"] == D2 and rows[1]["added_at"] == D1
    assert rows[2]["updated_at"] == D1


def test_null_transition_detected(spark, base_state):
    """value → NULL is a change (str(None) sentinel compare, :162)."""
    s2 = snap(spark, [(1, "dev", None, False), (2, "ops", 200, False), (3, "qa", 300, False)])
    rows = by_id(merge_snapshot(base_state, s2, D2))
    assert rows[1]["salary"] is None and rows[1]["updated_at"] == D2


def test_removal(spark, base_state):
    """Absent id with added_at < snapshot date → removed_at set (:181-192);
    data columns keep their last values."""
    s2 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False)])
    rows = by_id(merge_snapshot(base_state, s2, D2))
    assert rows[3]["removed_at"] == D2
    assert rows[3]["name"] == "qa" and rows[3]["salary"] == 300
    assert rows[1]["removed_at"] is None


def test_same_day_insert_not_removed(spark, base_state):
    """added_at == snapshot date rows are exempt from removal (:181 uses
    strict '<')."""
    s2 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False),
                      (3, "qa", 300, False), (4, "pm", 400, False)])
    state2 = merge_snapshot(base_state, s2, D2)
    # replay the SAME date without id 4 — rows added at D2 must not be removed at D2
    s2b = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False), (3, "qa", 300, False)])
    rows = by_id(merge_snapshot(state2, s2b, D2))
    assert rows[4]["removed_at"] is None


def test_archived_treated_as_absent(spark, base_state):
    """archived=true snapshot row is skipped (:131-134) → triggers removal."""
    s2 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False), (3, "qa", 300, True)])
    rows = by_id(merge_snapshot(base_state, s2, D2))
    assert rows[3]["removed_at"] == D2


def test_out_of_order_rejected(spark, base_state):
    """Snapshot older than state → MergeOrderError (:156-159)."""
    s2 = snap(spark, [(1, "dev", 150, False)])
    state2 = merge_snapshot(base_state, s2, D2)
    with pytest.raises(MergeOrderError):
        merge_snapshot(state2, snap(spark, [(1, "dev", 100, False)]), D1)


def test_removed_then_reappears_keeps_removed_at(spark, base_state):
    """Reference quirk: the update path never clears removed_at (:162 — the
    CSV has no lifecycle columns)."""
    s2 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False)])
    state2 = merge_snapshot(base_state, s2, D2)  # id 3 removed
    s3 = snap(spark, [(1, "dev", 100, False), (2, "ops", 200, False), (3, "qa", 999, False)])
    rows = by_id(merge_snapshot(state2, s3, D3))
    assert rows[3]["removed_at"] == D2  # preserved, faithful to reference
    assert rows[3]["updated_at"] == D3 and rows[3]["salary"] == 999
    # opt-in sane behavior:
    rows2 = by_id(merge_snapshot(state2, s3, D3, clear_removed_on_reappear=True))
    assert rows2[3]["removed_at"] is None


def test_idempotence(spark, base_state):
    """merge(merge(s, d), d) == merge(s, d) — rerun safety the reference
    gets from bucket-skip idempotency (get_hist_vacancies.py:193-216)."""
    s2 = snap(spark, [(1, "dev", 150, False), (2, "ops", 200, False)])
    once = merge_snapshot(base_state, s2, D2)
    twice = merge_snapshot(once, s2, D2)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_snapshots_with_high_water_mark(spark):
    snaps = [
        (D1, snap(spark, [(1, "dev", 100, False)])),
        (D2, snap(spark, [(1, "dev", 150, False), (2, "ops", 200, False)])),
        (D3, snap(spark, [(2, "ops", 200, False)])),
    ]
    state = merge_snapshots(None, snaps)
    rows = by_id(state)
    assert rows[1]["removed_at"] == D3 and rows[1]["updated_at"] == D2
    assert rows[2]["added_at"] == D2
    assert state_max_date(state) == D3
    # high-water mark skips already-applied snapshots (feeder_postgres.py:224-231)
    replay = merge_snapshots(state, snaps, high_water_mark=state_max_date(state))
    assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, state.collect()))
