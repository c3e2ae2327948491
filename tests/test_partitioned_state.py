"""Partition-scoped state rewrite (operators/partitioned_state.py): a merge
must rewrite ONLY the buckets holding changed keys — untouched partitions'
files stay byte-identical — while producing exactly the full-merge result."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from vacancy_analyser_spark.operators.partitioned_state import (
    BUCKET_COL,
    bucket_of,
    merge_changeset_partitioned,
    read_buckets,
    touched_buckets,
    write_state,
)

N_BUCKETS = 8


def _state_df(spark):
    rows = [(i, i * 10) for i in range(100)]
    return spark.createDataFrame(rows, "id long, v long")


def _file_census(path: str) -> dict[str, tuple[int, str]]:
    """relative file path → (mtime_ns, md5) for every data file."""
    census = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            census[os.path.relpath(p, path)] = (
                os.stat(p).st_mtime_ns,
                hashlib.md5(open(p, "rb").read()).hexdigest(),
            )
    return census


def _upsert(old, ch):
    o, c = old.alias("o"), ch.alias("c")
    return o.join(c, F.col("o.id") == F.col("c.id"), "full_outer").select(
        F.coalesce(F.col("o.id"), F.col("c.id")).alias("id"),
        F.coalesce(F.col("c.v"), F.col("o.v")).alias("v"),
    )


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "state")
    write_state(_state_df(spark), path, key="id", n_buckets=N_BUCKETS)
    before = _file_census(path)

    # 3 updates + 2 inserts
    ch = spark.createDataFrame([(7, 999), (13, 999), (21, 999), (1000, 1), (1001, 2)], "id long, v long")
    touched = merge_changeset_partitioned(spark, path, ch, _upsert, key="id", n_buckets=N_BUCKETS)
    assert touched == touched_buckets(ch, "id", N_BUCKETS)
    assert 0 < len(touched) < N_BUCKETS  # the changeset is genuinely sparse

    after = _file_census(path)
    touched_dirs = {f"{BUCKET_COL}={b}" for b in touched}
    for rel, sig in before.items():
        bucket_dir = rel.split(os.sep)[0]
        if bucket_dir not in touched_dirs:
            assert after[rel] == sig  # untouched partitions: same files, same bytes, same mtime
    # every touched partition got fresh files (old ones replaced)
    for rel in before:
        if rel.split(os.sep)[0] in touched_dirs:
            assert rel not in after or after[rel] != before[rel]

    # content equals the plain full merge
    merged = spark.read.parquet(path).select("id", "v")
    expected = _upsert(_state_df(spark), ch)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, expected.collect()))


def test_empty_changeset_writes_nothing(spark, tmp_path):
    path = str(tmp_path / "state")
    write_state(_state_df(spark), path, key="id", n_buckets=N_BUCKETS)
    before = _file_census(path)
    ch = spark.createDataFrame([], "id long, v long")
    assert merge_changeset_partitioned(spark, path, ch, _upsert, key="id", n_buckets=N_BUCKETS) == []
    assert _file_census(path) == before


def test_read_buckets_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "state")
    write_state(_state_df(spark), path, key="id", n_buckets=N_BUCKETS)
    df = read_buckets(spark, path, [2, 5])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and BUCKET_COL in plan.split("PartitionFilters")[1][:200]
    # the pruned scan returns exactly the rows whose keys hash to those buckets
    expected = (
        _state_df(spark)
        .withColumn("b", bucket_of("id", N_BUCKETS))
        .filter(F.col("b").isin([2, 5]))
        .count()
    )
    assert df.count() == expected


def test_bucket_function_is_stable(spark):
    a = touched_buckets(spark.createDataFrame([(i,) for i in range(50)], "id long"), "id")
    b = touched_buckets(spark.createDataFrame([(i,) for i in range(50)], "id long"), "id")
    assert a == b


def test_store_path_encodes_build_recipe(monkeypatch):
    """The store directory name must change when any build-recipe constant
    changes (bucket count, snapshot window, changeset predicate) — the
    _ivf_index_path identity rule: a mod-16 probe against a mod-32 layout
    would silently merge against the wrong partitions."""
    import vacancy_analyser_spark.operators.partitioned_state as ps
    import vacancy_analyser_spark.plans.snapshot as snap

    base_a, base_m = snap._partstate_paths("/root/testdata/sf0.001")
    assert f"b{ps.N_STATE_BUCKETS}" in base_a

    monkeypatch.setattr(ps, "N_STATE_BUCKETS", ps.N_STATE_BUCKETS // 2)
    alt_a, _ = snap._partstate_paths("/root/testdata/sf0.001")
    assert alt_a != base_a

    monkeypatch.setattr(snap, "_CS_MOD", 7)
    alt2_a, _ = snap._partstate_paths("/root/testdata/sf0.001")
    assert alt2_a != alt_a


def test_merge_with_delete_semantics_empties_bucket(spark, tmp_path):
    """A merge_fn that returns ZERO rows for a touched bucket (delete
    semantics) must actually empty it: dynamic partition overwrite only
    replaces partitions present in the written frame, so the operator
    sweeps emptied buckets' directories explicitly — deleted rows must
    not reappear on the next full read."""
    path = str(tmp_path / "delstate")
    # one small state: ids 0..19
    df = spark.createDataFrame([(i, i * 10) for i in range(20)], "id long, v long")
    write_state(df, path, key="id", n_buckets=N_BUCKETS)

    # delete EVERY key in id 0..19 that shares a bucket with id=7, plus
    # upsert one key in a different bucket — so one touched bucket ends
    # empty and another stays populated
    b7 = spark.range(1).select(bucket_of(F.lit(7), N_BUCKETS).alias("b")).collect()[0]["b"]
    doomed = [
        r["id"]
        for r in df.select("id")
        .withColumn("b", bucket_of("id", N_BUCKETS))
        .filter(F.col("b") == b7)
        .collect()
    ]
    other = next(
        r["id"]
        for r in df.select("id")
        .withColumn("b", bucket_of("id", N_BUCKETS))
        .filter(F.col("b") != b7)
        .collect()
    )
    ch = spark.createDataFrame([(i, -1) for i in doomed] + [(other, 777)], "id long, v long")

    def _delete_or_update(old, changeset):
        # v == -1 → delete; else upsert
        upd = changeset.filter(F.col("v") != -1)
        dels = changeset.filter(F.col("v") == -1).select("id")
        merged = _upsert(old, upd)
        return merged.join(dels, "id", "left_anti")

    merge_changeset_partitioned(spark, path, ch, _delete_or_update, key="id", n_buckets=N_BUCKETS)

    got = spark.read.parquet(path)
    ids = sorted(r["id"] for r in got.collect())
    assert all(i not in ids for i in doomed), "deleted rows reappeared"
    assert (
        got.filter(F.col("id") == other).collect()[0]["v"] == 777
    ), "upsert in sibling bucket lost"
    # the emptied bucket's directory is gone
    assert not os.path.exists(os.path.join(path, f"{BUCKET_COL}={b7}"))


def test_merge_that_empties_every_bucket_keeps_state_readable(spark, tmp_path):
    """A merge_fn that deletes the ENTIRE state used to sweep every bucket
    directory away, leaving a parquet path with no footers — the next
    read died with 'unable to infer schema'. The fully-emptied guard
    leaves one empty schema-bearing partition, so the state reads back as
    the correct schema with zero rows, and a later merge repopulates it."""
    path = str(tmp_path / "allgone")
    df = spark.createDataFrame([(i, i * 10) for i in range(20)], "id long, v long")
    write_state(df, path, key="id", n_buckets=N_BUCKETS)
    ch = df.select("id", "v")

    def _delete_all(old, changeset):
        return old.join(changeset.select("id"), "id", "left_anti")

    merge_changeset_partitioned(spark, path, ch, _delete_all, key="id", n_buckets=N_BUCKETS)

    got = spark.read.parquet(path)
    assert got.count() == 0
    assert set(got.columns) == {"id", "v", BUCKET_COL}

    # the emptied state accepts a repopulating merge
    ch2 = spark.createDataFrame([(5, 55)], "id long, v long")
    merge_changeset_partitioned(spark, path, ch2, _upsert, key="id", n_buckets=N_BUCKETS)
    assert [(r["id"], r["v"]) for r in spark.read.parquet(path).collect()] == [(5, 55)]
