"""spread_small_path's input-size gate (io.py).

The r12 verdict's latent-trap finding: the one-level size probe reads a
PARTITIONED directory (subdirectories) as ~0 bytes, so the gate would
repartition a frame of any size — the extra exchange on a large scan it
exists to prevent. The r13 fix treats a directory containing
subdirectories as over-threshold and returns the frame unchanged.
"""

from __future__ import annotations

import os

from vacancy_analyser_spark.io import _OPEN_COST_BYTES, spread_small_path


def test_small_flat_dir_is_spread(spark, tmp_path):
    p = str(tmp_path / "flat")
    spark.range(10).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_small_path(df, spark, p)
    assert out is not df
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_partitioned_dir_is_never_spread(spark, tmp_path):
    # tiny files under partition subdirectories: the old probe summed the
    # (empty) top level and misfired; the fix must return df unchanged
    p = str(tmp_path / "parts")
    spark.range(10).selectExpr("id", "id % 2 AS k").write.partitionBy("k").parquet(p)
    df = spark.read.parquet(p)
    assert spread_small_path(df, spark, p) is df


def test_large_flat_dir_is_not_spread(spark, tmp_path):
    # a flat dir whose top-level bytes exceed cores x openCost stays
    # unchanged (sparse file: st_size is what the probe reads)
    p = str(tmp_path / "big")
    os.makedirs(p)
    big = os.path.join(p, "data.parquet")
    with open(big, "wb") as fh:
        fh.truncate(spark.sparkContext.defaultParallelism * _OPEN_COST_BYTES + 1)
    df = spark.range(10)
    assert spread_small_path(df, spark, p) is df


def test_missing_path_is_untouched(spark, tmp_path):
    df = spark.range(10)
    assert spread_small_path(df, spark, str(tmp_path / "absent")) is df
