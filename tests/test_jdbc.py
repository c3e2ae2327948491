"""S8 JDBC source e2e — no external DB needed: Spark ships embedded Derby
(for the Hive metastore), which gives a real JDBC endpoint inside the test
JVM. This closes the one source that was env-gated through r3 ("no DB in
the sandbox") — the sandbox had one all along."""

from __future__ import annotations

from vacancy_analyser_spark.io import read_jdbc

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/derby_db;create=true"


def test_jdbc_roundtrip(spark, tmp_path):
    url = _url(tmp_path)
    src = spark.range(100).selectExpr("id", "id * 2 AS val")
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t")
        .option("driver", DRIVER["driver"])
        .mode("overwrite")
        .save()
    )
    got = read_jdbc(spark, url, "t", properties=DRIVER)
    assert sorted((r["id"], r["val"]) for r in got.collect()) == [
        (i, 2 * i) for i in range(100)
    ]


def test_jdbc_partitioned_read_parallelizes(spark, tmp_path):
    """The scale path: (partitionColumn, bounds, numPartitions) must split
    the read into range queries — 4 partitions, same rows, no dupes (the
    reference reads through ONE connection; feeder_hadoop.py:79-86)."""
    url = _url(tmp_path)
    src = spark.range(100).selectExpr("id", "id * 2 AS val")
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t2")
        .option("driver", DRIVER["driver"])
        .mode("overwrite")
        .save()
    )
    part = read_jdbc(
        spark,
        url,
        "t2",
        properties=DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in part.collect()) == list(range(100))
