"""SparkSession factory with scale-oriented defaults.

The reference runs Spark 3.0.0 in bare ``local`` mode with 4g heaps
(reference: feeder_hadoop.py:69, docker-compose.yml.template:148). We instead
ship a builder whose defaults are chosen for a real cluster and only
down-scale via parameters in tests:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — replaces every hand-tuned knob the
  reference lacks.
- Arrow on — all pandas_udf / mapInPandas paths use Arrow batches.
- UTC session timezone — parquet timestamps compare bit-for-bit against
  external engines (the DuckDB oracle harness relies on this).
- maxRecordsPerFile default for writers matches the reference's 50,000
  rows/file parity point (feeder_hadoop.py:19-20,87).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Parity with the reference's parquet sizing (feeder_hadoop.py:20).
MAX_RECORDS_PER_FILE = 50_000

#: Defaults applied to every session we build. Values are strings because
#: that is what SparkConf stores.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Big enough to never split tiny test files, small enough that a 100 TB
    # scan still yields ~800k tasks, not 8M.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "snappy",
    # Small dims (taxonomy ≤ 430 rows, region/nation) must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Scale-dependent, so parameterised rather than constant (r12): the
    # default matches the local core count ($SPARK_GRAFT_CPUS world), and
    # AQE coalescing re-sizes small shuffles downward at runtime. On a
    # cluster set $SPARK_GRAFT_SHUFFLE_PARTITIONS from the data, not the
    # default: total shuffle bytes / ~200 MB per partition (guide §2.2 —
    # e.g. a 10 TB shuffle wants ~50k initial partitions, which AQE then
    # coalesces per-stage), never the executor count alone.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.filterPushdown": "true",
    # Harness testdata stores events.ts as TIMESTAMP(NANOS), which the Spark
    # parquet reader rejects; read as long and convert in io.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "vacancy-analyser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``$SPARK_GRAFT_MASTER`` or ``local[N]`` where N is
    ``$SPARK_GRAFT_CPUS`` (fallback: all cores). On a cluster, leave master
    unset and let spark-submit provide it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
        if master is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if master and master.startswith("local"):
        # local mode: the driver JVM is the executor — the 1g default heap
        # dies on sf0.1 shuffles. Overridable via SPARK_GRAFT_DRIVER_MEM.
        conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
