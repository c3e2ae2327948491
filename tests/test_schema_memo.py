"""The single-owner schema memo (plans/similarity._memo_read): a fold loop
that owns an index (maintenance lease / fresh-tmpdir key scope) infers each
interior table's parquet schema ONCE and reuses it for every later read —
removing the per-trigger footer-inference job — without changing a single
result row."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.readwriter import DataFrameReader
from vacancy_analyser_spark.plans.similarity import (
    _memo_read,
    _ranked_against,
    _vectors,
    auto_centroids,
    ivf_build_index_frame,
    ivf_index_delete,
    ivf_index_incremental_add,
)


def _split(spark, sf_dir):
    vecs = _vectors(spark, sf_dir).select("vec_id", "embedding")
    part = F.pmod(F.col("vec_id"), F.lit(4))
    return vecs, vecs.filter(part < 2), vecs.filter(part == 2), vecs.filter(part == 3)


def _assignment(spark, path):
    return {
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(os.path.join(path, "vectors"))
        .select("vec_id", "centroid_id")
        .collect()
    }


def _counting_reader(monkeypatch):
    """Patch DataFrameReader so each .parquet() call records whether the
    caller provided a schema (memoized) or left it to inference."""
    calls: list[bool] = []
    orig_parquet = DataFrameReader.parquet
    orig_schema = DataFrameReader.schema

    def patched_schema(self, s):
        self._memo_test_has_schema = True
        return orig_schema(self, s)

    def patched_parquet(self, *paths, **kw):
        calls.append(getattr(self, "_memo_test_has_schema", False))
        return orig_parquet(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "schema", patched_schema)
    monkeypatch.setattr(DataFrameReader, "parquet", patched_parquet)
    return calls


def test_memo_infers_once_then_reuses(spark, sf_dir, tmp_path, monkeypatch):
    vecs, base, b1, b2 = _split(spark, sf_dir)
    path = str(tmp_path / "ix_memo")
    memo: dict = {}
    ivf_build_index_frame(base, path, auto_centroids(base.count()), schema_memo=memo)
    cent_path = os.path.join(path, "centroids")
    assert cent_path in memo  # the build's read-back seeded it

    calls = _counting_reader(monkeypatch)
    ivf_index_incremental_add(spark, path, b1, skip_existing=True, schema_memo=memo)
    ivf_index_incremental_add(spark, path, b2, skip_existing=True, schema_memo=memo)
    # centroids reads ride the memo from the build; the vectors read infers
    # exactly once (first fold), then reuses — so across two folds the only
    # schema-less read is that single vectors inference
    assert calls, "the folds must read interior tables"
    assert sum(1 for has_schema in calls if not has_schema) == 1
    assert os.path.join(path, "vectors") in memo


def test_fold_with_memo_matches_without(spark, sf_dir, tmp_path):
    vecs, base, b1, b2 = _split(spark, sf_dir)
    k = auto_centroids(base.count())
    plain, memoed = str(tmp_path / "ix_a"), str(tmp_path / "ix_b")
    memo: dict = {}
    ivf_build_index_frame(base, plain, k)
    ivf_build_index_frame(base, memoed, k, schema_memo=memo)
    for batch in (b1, b2):
        ivf_index_incremental_add(spark, plain, batch, skip_existing=True)
        ivf_index_incremental_add(
            spark, memoed, batch, skip_existing=True, schema_memo=memo
        )
    assert _assignment(spark, memoed) == _assignment(spark, plain)
    # and both equal the frozen-centroid assignment of the full corpus
    cent_r = spark.read.parquet(os.path.join(plain, "centroids"))
    want = {
        (r["vec_id"], r["centroid_id"])
        for r in _ranked_against(vecs, cent_r)
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
        .collect()
    }
    assert _assignment(spark, memoed) == want


def test_delete_with_memo_matches_without(spark, sf_dir, tmp_path):
    vecs, base, b1, _ = _split(spark, sf_dir)
    k = auto_centroids(base.count())
    plain, memoed = str(tmp_path / "dx_a"), str(tmp_path / "dx_b")
    memo: dict = {}
    ivf_build_index_frame(base, plain, k)
    ivf_build_index_frame(base, memoed, k, schema_memo=memo)
    # deterministic victim set: both arms must delete the same ids
    dels = base.filter(F.pmod(F.col("vec_id"), F.lit(7)) == 0).select("vec_id")
    t1 = ivf_index_delete(spark, plain, dels)
    t2 = ivf_index_delete(spark, memoed, dels, schema_memo=memo)
    assert t1 == t2
    assert _assignment(spark, memoed) == _assignment(spark, plain)
    # idempotent re-delete through the memoized schema writes nothing new
    assert ivf_index_delete(spark, memoed, dels, schema_memo=memo) == []


def test_memo_read_plain_fallback(spark, sf_dir, tmp_path):
    """No memo → per-call inference, byte-identical behavior."""
    vecs, base, _, _ = _split(spark, sf_dir)
    path = str(tmp_path / "ix_plain")
    ivf_build_index_frame(base, path, auto_centroids(base.count()))
    a = _memo_read(spark, os.path.join(path, "vectors"), None)
    memo: dict = {}
    b = _memo_read(spark, os.path.join(path, "vectors"), memo)
    c = _memo_read(spark, os.path.join(path, "vectors"), memo)
    assert a.schema == b.schema == c.schema
    assert a.count() == b.count() == c.count()
