"""Workspace binding: the interactive switch-over surface for reference
users (SQL views over testdata + registry access by name)."""

from __future__ import annotations

import pytest

from vacancy_analyser_spark.workspace import TESTDATA_TABLES, bind, catalog, run


def test_bind_exposes_all_tables_as_sql_views(spark, sf_dir):
    bind(spark, sf_dir)
    assert {"documents", "lineitem", "events"} <= set(TESTDATA_TABLES)
    n_langs = spark.sql("SELECT count(DISTINCT lang) AS n FROM documents").first()["n"]
    assert n_langs >= 1
    # views are scans, not snapshots: pushdown still reaches parquet
    plan = (
        spark.sql("SELECT doc_id FROM documents WHERE lang = 'en'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_run_resolves_registry_and_rejects_unknown(spark, sf_dir):
    assert run(spark, sf_dir, "explode_count").count() > 0
    with pytest.raises(KeyError, match="unknown query"):
        run(spark, sf_dir, "not_a_query")


def test_catalog_covers_every_registered_query():
    c = catalog()
    assert len(c) >= 96
    assert all(isinstance(v, str) for v in c.values())
    assert c["pricing_summary"]  # non-empty description


def test_cli_list_and_run(spark):
    """The __main__ CLI must list the registry and run a query through the
    same code path (driven in-process: main() returns 0 and show() output
    lands on stdout)."""
    import contextlib
    import io

    from vacancy_analyser_spark.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["list", "--tag", "ext-dedup"]) == 0
    out = buf.getvalue()
    assert "exact_dedup" in out and "minhash_lsh_dedup" in out

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["run", "max_dates", "/root/testdata/sf0.001"]) == 0
    assert "max" in buf.getvalue().lower()
