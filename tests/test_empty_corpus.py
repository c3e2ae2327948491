"""Empty-relation robustness: every registered query must PLAN AND RUN on
a corpus with the real schemas and zero rows — returning an empty (or
degenerate-aggregate) frame, never raising.

This is the guard for the None-deref class of bugs (a .head()/.first()
scalar probe on an empty relation): the BPE merge loop, the ntile boundary
pick, the stratified-sample target, and the IVF query-vector lookup each
had one before this sweep existed. An empty micro-batch, a fully-filtered
partition, or a fresh ingest directory produces exactly this shape in
production."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from vacancy_analyser_spark.plans.registry import queries
from vacancy_analyser_spark.schemas import TESTDATA_TABLES


@pytest.fixture(scope="module")
def empty_dir(sf_dir, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("empty_corpus")
    for t in TESTDATA_TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


def test_every_registered_query_survives_empty_corpus(spark, empty_dir):
    failures = []
    for name, fn in queries().items():
        try:
            fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(e).__name__}: {(str(e).splitlines() or [''])[0]}")
    assert not failures, "\n".join(failures)
