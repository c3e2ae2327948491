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


def test_write_jdbc_roundtrip(spark, tmp_path):
    """The write half of S8: parallel batched INSERT through write_jdbc,
    read back through read_jdbc."""
    from vacancy_analyser_spark.io import write_jdbc

    url = _url(tmp_path)
    src = spark.range(50).selectExpr("id", "id * 3 AS val")
    write_jdbc(src, url, "w1", mode="overwrite", properties=DRIVER, num_partitions=2)
    got = read_jdbc(spark, url, "w1", properties=DRIVER)
    assert sorted((r["id"], r["val"]) for r in got.collect()) == [
        (i, 3 * i) for i in range(50)
    ]


def test_upsert_jdbc_updates_and_inserts(spark, tmp_path):
    """The reference's conditional INSERT/UPDATE loop as one set-based
    MERGE (feeder_postgres.py:147-177): existing keys update, new keys
    insert, untouched keys survive."""
    from vacancy_analyser_spark.io import upsert_jdbc, write_jdbc

    url = _url(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, score long"
    )
    write_jdbc(base, url, "state", mode="overwrite", properties=DRIVER)

    changeset = spark.createDataFrame(
        [(2, "b2", 99), (4, "d", 40)], "id long, name string, score long"
    )
    upsert_jdbc(spark, changeset, url, "state", key_cols=["id"], properties=DRIVER)

    got = read_jdbc(spark, url, "state", properties=DRIVER)
    assert sorted((r["id"], r["name"], r["score"]) for r in got.collect()) == [
        (1, "a", 10),    # untouched
        (2, "b2", 99),   # updated
        (3, "c", 30),    # untouched
        (4, "d", 40),    # inserted
    ]


def test_upsert_jdbc_is_idempotent(spark, tmp_path):
    """Replaying the same changeset must not duplicate rows — the property
    that makes the sink safe under task retries of the calling pipeline."""
    from vacancy_analyser_spark.io import upsert_jdbc, write_jdbc

    url = _url(tmp_path)
    base = spark.createDataFrame([(1, 10)], "id long, score long")
    write_jdbc(base, url, "state2", mode="overwrite", properties=DRIVER)
    changeset = spark.createDataFrame([(1, 11), (2, 20)], "id long, score long")
    for _ in range(2):
        upsert_jdbc(spark, changeset, url, "state2", key_cols=["id"], properties=DRIVER)
    got = read_jdbc(spark, url, "state2", properties=DRIVER)
    assert sorted((r["id"], r["score"]) for r in got.collect()) == [(1, 11), (2, 20)]


def test_jdbc_upsert_stream_folds_changesets(spark, tmp_path):
    """The feeder loop end-to-end: a file stream of changesets folded into
    Derby via foreachBatch -> set-based MERGE. Two rounds (like the
    reference's periodic scrape), then a no-new-files rerun proving the
    checkpoint makes file delivery exactly-once."""
    import os

    from pyspark.sql import types as T

    from vacancy_analyser_spark.streaming.jdbc_sink import start_jdbc_upsert_stream

    url = _url(tmp_path)
    src = str(tmp_path / "changesets")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = T.StructType.fromDDL("id long, score long")

    def _round(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))
        q = start_jdbc_upsert_stream(
            spark.readStream.schema(schema).option("recursiveFileLookup", True).parquet(src),
            url,
            "fed",
            key_cols=["id"],
            checkpoint=ckpt,
            properties=DRIVER,
        )
        q.awaitTermination(120)

    _round([(1, 10), (2, 20)], "r1")          # batch 0 bootstraps the table
    got1 = read_jdbc(spark, url, "fed", properties=DRIVER)
    assert sorted((r["id"], r["score"]) for r in got1.collect()) == [(1, 10), (2, 20)]

    _round([(2, 99), (3, 30)], "r2")          # update + insert
    got2 = read_jdbc(spark, url, "fed", properties=DRIVER)
    assert sorted((r["id"], r["score"]) for r in got2.collect()) == [
        (1, 10), (2, 99), (3, 30),
    ]

    # no new files: the checkpointed source emits nothing, table unchanged
    q = start_jdbc_upsert_stream(
        spark.readStream.schema(schema).option("recursiveFileLookup", True).parquet(src),
        url, "fed", key_cols=["id"], checkpoint=ckpt, properties=DRIVER,
    )
    q.awaitTermination(120)
    got3 = read_jdbc(spark, url, "fed", properties=DRIVER)
    assert sorted((r["id"], r["score"]) for r in got3.collect()) == [
        (1, 10), (2, 99), (3, 30),
    ]


def test_upsert_jdbc_dedups_batch_keys(spark, tmp_path):
    """A batch with duplicate keys (the cold-start availableNow shape: all
    existing changeset files folded into batch 0) must collapse last-wins
    BEFORE the database sees it — on both paths: the bootstrap append (no
    target yet — duplicates would land permanently) and the ANSI MERGE
    (which raises 'multiple source rows match' on Derby/Postgres)."""
    from vacancy_analyser_spark.io import upsert_jdbc

    url = _url(tmp_path)
    # bootstrap path: table does not exist, batch has key 1 twice
    dup = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 200), (2, 20, 100)], "id long, score long, ver long"
    )
    upsert_jdbc(spark, dup, url, "dd", key_cols=["id"], properties=DRIVER, order_col="ver")
    got = read_jdbc(spark, url, "dd", properties=DRIVER)
    assert sorted((r["id"], r["score"]) for r in got.collect()) == [(1, 11), (2, 20)]

    # MERGE path: duplicates again, later version wins, no MERGE error
    dup2 = spark.createDataFrame(
        [(2, 98, 300), (2, 99, 400), (3, 30, 100)], "id long, score long, ver long"
    )
    upsert_jdbc(spark, dup2, url, "dd", key_cols=["id"], properties=DRIVER, order_col="ver")
    got2 = read_jdbc(spark, url, "dd", properties=DRIVER)
    assert sorted((r["id"], r["score"]) for r in got2.collect()) == [
        (1, 11), (2, 99), (3, 30),
    ]


def test_last_wins_without_order_col_is_deterministic(spark):
    """No version column: the fallback orders by all non-key columns, so
    the winner is data-determined (and exact-duplicate rows are one row)."""
    from vacancy_analyser_spark.io import last_wins_per_key

    df = spark.createDataFrame(
        [(1, 5), (1, 9), (1, 9), (2, 3)], "id long, score long"
    )
    got = last_wins_per_key(df, ["id"])
    assert sorted((r["id"], r["score"]) for r in got.collect()) == [(1, 9), (2, 3)]


def test_jdbc_upsert_stream_processing_time_trigger(spark, tmp_path):
    """The reference's resident 60 s poll loop (feeder_postgres.py:251-259)
    as a ProcessingTime-trigger stream: multiple micro-batches against
    Derby, each folded through the same exactly-once MERGE — the one
    trigger mode the availableNow tests don't cover."""
    import os
    import time

    from pyspark.sql import types as T

    from vacancy_analyser_spark.streaming.jdbc_sink import start_jdbc_upsert_stream

    url = _url(tmp_path)
    src = str(tmp_path / "pt_changesets")
    ckpt = str(tmp_path / "pt_ckpt")
    os.makedirs(src)
    schema = T.StructType.fromDDL("id long, score long")

    def _drop(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    def _wait_for(expected, timeout=60):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            try:
                from vacancy_analyser_spark.io import jdbc_table_exists

                if jdbc_table_exists(spark, url, "ptfed", DRIVER):
                    got = read_jdbc(spark, url, "ptfed", properties=DRIVER)
                    if sorted((r["id"], r["score"]) for r in got.collect()) == expected:
                        return True
            except Exception:
                pass
            time.sleep(0.5)
        return False

    _drop([(1, 10), (2, 20)], "r1")
    q = start_jdbc_upsert_stream(
        spark.readStream.schema(schema).option("recursiveFileLookup", True).parquet(src),
        url,
        "ptfed",
        key_cols=["id"],
        checkpoint=ckpt,
        properties=DRIVER,
        available_now=False,
        processing_time="1 second",
    )
    try:
        assert _wait_for([(1, 10), (2, 20)]), "batch 0 did not fold"
        _drop([(2, 99), (3, 30)], "r2")          # later micro-batch: update + insert
        assert _wait_for([(1, 10), (2, 99), (3, 30)]), "batch 1 did not fold"
    finally:
        q.stop()


def test_last_wins_order_col_ties_break_deterministically(spark):
    """Tied order_col with different payloads: the winner must be a pure
    function of the data (trailing non-key tiebreakers), not of partition
    layout — a foreachBatch retry of the same batch must upsert the same
    row. Assert the same winner across different input orders/layouts."""
    from vacancy_analyser_spark.io import last_wins_per_key

    rows = [(1, 100, "b"), (1, 100, "a"), (1, 99, "z"), (2, 5, "x")]
    want = [(1, 100, "b"), (2, 5, "x")]  # ver desc, then payload desc
    for perm in (rows, rows[::-1]):
        for parts in (1, 4):
            df = spark.createDataFrame(perm, "id long, ver long, payload string").repartition(parts)
            got = sorted(
                (r["id"], r["ver"], r["payload"])
                for r in last_wins_per_key(df, ["id"], order_col="ver").collect()
            )
            assert got == want


def test_upsert_stream_trigger_knobs_validated(spark, tmp_path):
    """available_now=True + processing_time would silently ignore the
    interval; available_now=False without one runs unthrottled — both
    must raise before any stream starts."""
    import pytest

    from pyspark.sql import types as T

    from vacancy_analyser_spark.streaming.jdbc_sink import start_jdbc_upsert_stream

    schema = T.StructType.fromDDL("id long, score long")
    src = str(tmp_path / "vsrc")
    import os

    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="silently ignored"):
        start_jdbc_upsert_stream(
            stream, _url(tmp_path), "t", ["id"], str(tmp_path / "c1"),
            properties=DRIVER, available_now=True, processing_time="1 second",
        )
    with pytest.raises(ValueError, match="unthrottled"):
        start_jdbc_upsert_stream(
            stream, _url(tmp_path), "t", ["id"], str(tmp_path / "c2"),
            properties=DRIVER, available_now=False,
        )
