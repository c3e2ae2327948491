"""id→centroid lookup table beside a materialized IVF index.

ivf_index_delete's LOCATE step is the one whole-index read in the deletion
path: given takedown vec_ids, it scans the index (two columns) to find
which centroid partitions hold victims. At true scale even that
column-pruned scan is avoidable — the assignment IS a lookup table, so
materializing it keyed BY VEC ID makes locate a partition-pruned point
read. This module maintains that table:

- ``build_lookup``: one column-pruned scan of ``vectors/`` writes
  ``lookup/`` as (vec_id, centroid_id) partitioned by
  ``pmod(xxhash64(vec_id), N_LOOKUP_BUCKETS)`` — the partitioned_state
  bucket recipe, so a locate for a batch of ids prunes to the buckets the
  ids hash into.
- ``locate``: ids → their centroid partitions, reading ONLY the ids'
  hash buckets (planning-time pruning on the bucket column; asserted in
  tests/test_ann_lookup.py).
- ``refresh_lookup_buckets``: after an add/delete touched the index,
  re-derive ONLY the buckets the changed ids hash into — maintenance
  cost tracks the changeset like every other partition-scoped op here.

Deliberately layered BESIDE ivf_index_delete rather than into it: the
delete's correctness contract (and its driver-checked keys) stay
scan-based and self-contained; a deployment that maintains the lookup
passes ``locate()``'s result as the touched-partition list. Cited parity:
the reference has no vector surface (SURVEY §2.11 is additive scope).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fsutil

#: Bucket count for the lookup layout: enough that a batch of takedown ids
#: touches a small fraction of buckets, few enough that tiny corpora don't
#: fragment into empty directories.
N_LOOKUP_BUCKETS = 32

def _bucket_col():
    # built lazily: constructing a Column at import time requires an
    # active SparkContext, which test collection does not have
    return F.pmod(F.xxhash64(F.col("vec_id")), F.lit(N_LOOKUP_BUCKETS)).alias("bucket")


def build_lookup(spark: SparkSession, index_path: str) -> str:
    """Derive ``lookup/`` from the index's vectors table (one column-pruned
    scan — vec_id + the centroid_id partition column, never embeddings)."""
    lookup_dir = os.path.join(index_path, "lookup")
    (
        spark.read.parquet(os.path.join(index_path, "vectors"))
        .select("vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id"))
        .withColumn("bucket", _bucket_col())
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(lookup_dir)
    )
    return lookup_dir


def locate(spark: SparkSession, index_path: str, ids: DataFrame) -> DataFrame:
    """(vec_id, centroid_id) for the given ids — reads only the ids' hash
    buckets. ``ids`` must be driver-small-ish only in the sense that its
    distinct buckets are collected (≤ N_LOOKUP_BUCKETS values, bounded by
    design); the ids themselves join distributed."""
    buckets = sorted(
        r["b"]
        for r in ids.select(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(N_LOOKUP_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    )
    if not buckets:
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    lk = spark.read.parquet(os.path.join(index_path, "lookup")).filter(
        F.col("bucket").isin(buckets)
    )
    return lk.join(F.broadcast(ids.select("vec_id")), "vec_id", "left_semi").select(
        "vec_id", "centroid_id"
    )


def compact_lookup(spark: SparkSession, index_path: str) -> list[dict]:
    """Consolidate small files the bucket refreshes accumulate — the
    lookup is rewritten bucket-wise on every add/delete, so a streaming
    deployment fragments it exactly like the vectors table. Same shared
    compaction op, keyed on the lookup's bucket column."""
    from .compaction import compact_partitions

    return compact_partitions(
        spark, os.path.join(index_path, "lookup"), ("bucket",)
    )


def refresh_lookup_buckets(
    spark: SparkSession, index_path: str, changed_ids: DataFrame
) -> list[int]:
    """Re-derive ONLY the lookup buckets the changed ids hash into, from
    the current vectors table (dynamic partition overwrite — untouched
    buckets stay byte-identical, tested). Correct for adds, deletes, and
    re-assignments alike because each bucket is rebuilt wholesale from
    the index's current truth. Returns the refreshed bucket ids."""
    buckets = sorted(
        r["b"]
        for r in changed_ids.select(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(N_LOOKUP_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    )
    if not buckets:
        return []
    fresh = (
        spark.read.parquet(os.path.join(index_path, "vectors"))
        .select("vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id"))
        .withColumn("bucket", _bucket_col())
        .filter(F.col("bucket").isin(buckets))
        .localCheckpoint(eager=True)
    )
    lookup_dir = os.path.join(index_path, "lookup")
    fresh_buckets = {
        r["bucket"] for r in fresh.select("bucket").distinct().collect()
    }
    fresh.filter(F.col("bucket").isin(sorted(fresh_buckets))).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy("bucket").parquet(
        lookup_dir
    )
    for b in buckets:
        if b in fresh_buckets:
            continue
        # every id in this bucket left the index — sweep the dead directory
        # through the Hadoop FS API (the lookup lives beside the index,
        # wherever index_path points: HDFS/S3A/file:)
        fsutil.delete_dir(spark, f"{lookup_dir}/bucket={b}", if_exists=True)
    return buckets
