"""Driver-compare rehearsal: every registered query with an oracle must be
value-hash identical to its DuckDB SQL at sf0.001 (the driver runs the same
comparison at sf0.01 — tools/parity.py covers that interactively)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from parity import compare_query, duck_connection  # noqa: E402

from vacancy_analyser_spark.plans import all_specs  # noqa: E402

SPECS = all_specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = SPECS[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only contract: runs and has a schema
        assert len(df.columns) > 0
        return
    r = compare_query(spark, duck, name, spec.fn, spec.oracle, sf_dir)
    assert r["ok"], r


def test_driver_contract_keys():
    """oracle_sql() keys must be a subset of queries() keys."""
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 50


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
