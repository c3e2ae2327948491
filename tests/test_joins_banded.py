"""The interval-join dispatch (plans/joins.py range_join): the few-band
regime broadcasts a nested loop, the many-band regime rewrites to the
floor(value/width) band-key equi-join. Both regimes must be
result-identical (the grid is physical topology only), and the grid plan
must contain NO BroadcastNestedLoopJoin — the O(n·m) shape it exists to
replace."""

from __future__ import annotations

import pytest

import vacancy_analyser_spark.plans.joins as J


def _rows(df):
    return sorted(
        (r["band_id"], r["n_events"], r["sum_value"]) for r in df.collect()
    )


def test_grid_regime_matches_bnlj_and_drops_nlj(spark, sf_dir, monkeypatch):
    """Force BOTH regimes over the same bands (range_join_salary's ~30
    distinct p_size bands) and compare exactly; assert the physical shape
    of each."""
    want = _rows(J.range_join_salary(spark, sf_dir))
    assert J.LAST_RANGE_DISPATCH["plan"] == "broadcast_nlj"

    monkeypatch.setattr(J, "RANGE_BNLJ_MAX_BANDS", 0)
    got_df = J.range_join_salary(spark, sf_dir)
    got = _rows(got_df)
    assert J.LAST_RANGE_DISPATCH["plan"] == "grid_equi"
    assert J.LAST_RANGE_DISPATCH["width"] == pytest.approx(10.0)

    assert got == want  # planner rule, not a semantic switch

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the grid side broadcasts


def test_banded_key_selects_grid_at_driver_scale(spark, sf01_dir):
    """At the driver's check scale (sf0.01, |part| = 2000 bands) the probe
    must pick the grid plan on its own — no forcing."""
    df = J.range_join_banded(spark, sf01_dir)
    assert J.LAST_RANGE_DISPATCH["plan"] == "grid_equi"
    assert J.LAST_RANGE_DISPATCH["n_bands"] == 2000
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_handles_overlapping_bands_without_dedup(spark, sf_dir, monkeypatch):
    """Overlapping intervals: each matching (row, band) pair appears
    exactly once — the fact row maps to ONE cell, so the equi-join cannot
    double-count a pair even when bands overlap many cells."""
    monkeypatch.setattr(J, "RANGE_BNLJ_MAX_BANDS", 0)
    grid = _rows(J.range_join_banded(spark, sf_dir))
    monkeypatch.setattr(J, "RANGE_BNLJ_MAX_BANDS", 10**9)
    bnlj = _rows(J.range_join_banded(spark, sf_dir))
    assert grid == bnlj
