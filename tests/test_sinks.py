"""Sink coverage (SURVEY §2.1 S5/S9): size-bounded parquet files, partitioned
layout with pruning on read-back, CSV round-trip with embedded newlines.

The reference's sinks are a DictWriter CSV (get_vacancies.py:224-236) and a
maxRecordsPerFile parquet write (feeder_hadoop.py:19-20,87); atomicity came
from a tempfile+rename dance that Spark's task-commit protocol subsumes.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vacancy_analyser_spark.io import read_snapshot_csv, write_csv, write_parquet


def test_parquet_sink_bounds_file_size(spark, tmp_path):
    # feeder_hadoop.py:19-20 writes 50,000-row files; same option, smaller N
    out = str(tmp_path / "bounded")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    write_parquet(df, out, max_records_per_file=100)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) >= 10  # no file may exceed 100 rows
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 999 * 1000


def test_parquet_sink_partitioned_layout_prunes_on_read(spark, tmp_path):
    # a date/partition-keyed lake layout: the partition filter must show up
    # as PartitionFilters (directory pruning), not a post-scan Filter —
    # at 100 TB this is the difference between listing one directory and
    # scanning the lake
    out = str(tmp_path / "by_year")
    df = spark.createDataFrame(
        [(y, i, float(i)) for y in (1996, 1997, 1998) for i in range(50)],
        "year int, k int, v double",
    )
    write_parquet(df, out, partition_by=["year"])
    assert sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "year=*"))) == [
        "year=1996",
        "year=1997",
        "year=1998",
    ]
    back = spark.read.parquet(out).filter(F.col("year") == 1997)
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(year" in plan
    assert "(year" in plan.split("PartitionFilters: ")[1].split("]")[0]


def test_dynamic_partition_pruning_through_dim_join(spark, tmp_path):
    # the star-join-on-a-partitioned-lake shape: the fact's partition column
    # is constrained only THROUGH the dim join (no literal year filter), so
    # static pruning can't fire — Spark must inject a dynamicpruning
    # subquery from the broadcast dim side so only the matching year
    # directories are scanned. At 100 TB this is what makes
    # "revenue for the 1997 campaign" read 1 year, not the whole lake.
    out = str(tmp_path / "fact_by_year")
    fact = spark.createDataFrame(
        [(y, i, float(i)) for y in (1996, 1997, 1998) for i in range(200)],
        "year int, k int, v double",
    )
    write_parquet(fact, out, partition_by=["year"])
    dim = spark.createDataFrame(
        [(1996, "old"), (1997, "campaign"), (1998, "old")], "year int, label string"
    )
    joined = (
        spark.read.parquet(out)
        .join(F.broadcast(dim).filter(F.col("label") == "campaign"), "year")
        .agg(F.sum("v").alias("s"))
    )
    assert joined.first()["s"] == sum(range(200))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_csv_sink_roundtrip_embedded_newlines(spark, tmp_path):
    # get_vacancies.py:169 stores newline-joined skills inside one quoted
    # cell; the sink must quote/escape so the typed reader recovers rows
    out = str(tmp_path / "snap")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("archived", T.BooleanType()),
        ]
    )
    rows = [
        Row(id=1, text='line1\nline2 with "quotes"', archived=False),
        Row(id=2, text=None, archived=True),
        Row(id=3, text="plain", archived=None),
    ]
    write_csv(spark.createDataFrame(rows, schema), out)
    back = read_snapshot_csv(spark, out, schema).orderBy("id").collect()
    assert [r.id for r in back] == [1, 2, 3]
    assert back[0].text == 'line1\nline2 with "quotes"'
    assert back[1].text is None
    assert back[2].archived is None


def test_json_lines_roundtrip_with_schema(spark, tmp_path):
    """JSON-lines sink/source: values round-trip under an explicit schema,
    including nulls and unicode text; a malformed line degrades to nulls
    (PERMISSIVE) instead of failing the read."""
    from pyspark.sql import types as T

    from vacancy_analyser_spark.io import read_json_lines, write_json_lines

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "plain", 0.5), (2, 'quote " and … unicode', None), (3, None, -1.25)],
        schema,
    )
    path = str(tmp_path / "jl")
    write_json_lines(df, path)
    back = read_json_lines(spark, path, schema)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    # corrupt line tolerance: append a malformed file into the directory
    (tmp_path / "jl" / "part-junk.json").write_text('{"id": broken\n')
    degraded = read_json_lines(spark, path, schema)
    assert degraded.count() == 4  # 3 good + 1 all-null row, not an exception
    assert degraded.filter("id IS NULL AND text IS NULL AND score IS NULL").count() >= 1


def test_orc_roundtrip_pushdown_and_pruning(spark, tmp_path):
    """ORC sink/source round-trips exactly, and the read plan shows the
    same filter pushdown + column pruning contract as parquet."""
    from vacancy_analyser_spark.io import read_orc, write_orc

    src = spark.range(1000).selectExpr(
        "id", "id % 7 AS k", "CAST(id AS DOUBLE) / 3 AS v", "repeat('x', 10) AS pad"
    )
    path = str(tmp_path / "orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}
    pushed = back.filter("k = 3").select("id", "v")
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan
    assert "pad" not in plan.split("ReadSchema")[1].splitlines()[0]
