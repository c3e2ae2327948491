"""S7/S5: the multiLine CSV snapshot path — SURVEY §7 watch item 2.

The reference's scraper embeds literal newlines INSIDE quoted cells by
design (key_skills/contacts are newline-joined arrays, get_vacancies.py:169)
and the data is Russian-heavy. These are the cases naive CSV reading breaks
on; the reader must reproduce feeder_postgres.py:119-131's semantics
(id→int, empty→NULL, 'True'/'False'→bool, ISO timestamps with offset).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from vacancy_analyser_spark.io import read_snapshot_csv, write_csv

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("key_skills", T.StringType()),
        T.StructField("premium", T.BooleanType()),
        T.StructField("published_at", T.TimestampType()),
    ]
)

#: Byte-for-byte what the scraper's DictWriter would emit: quoted cells with
#: embedded newlines, doubled quotes, Russian text, offset timestamps,
#: empty cells for NULL.
SCRAPER_CSV = (
    "id,name,key_skills,premium,published_at\n"
    '1,"Разработчик ""Java""","Java\nSpring\nМногопоточность",True,2020-01-01T12:00:00+03:00\n'
    "2,QA инженер,,False,2020-06-15T09:30:00+05:00\n"
    "3,,,,\n"
)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "result.csv"
    p.write_text(SCRAPER_CSV, encoding="utf-8")
    return str(p)


def test_scraper_csv_typed_read(spark, csv_path):
    rows = {r["id"]: r for r in read_snapshot_csv(spark, csv_path, SCHEMA).collect()}
    assert set(rows) == {1, 2, 3}

    r1 = rows[1]
    assert r1["name"] == 'Разработчик "Java"'
    assert r1["key_skills"] == "Java\nSpring\nМногопоточность"  # newlines intact
    assert r1["premium"] is True
    # offsets normalize to the session zone (UTC): 12:00+03:00 == 09:00Z
    assert r1["published_at"] == dt.datetime(2020, 1, 1, 9, 0)

    r2 = rows[2]
    assert r2["premium"] is False
    assert r2["key_skills"] is None  # empty cell → NULL, like '' → None
    assert r2["published_at"] == dt.datetime(2020, 6, 15, 4, 30)

    r3 = rows[3]
    assert r3["name"] is None and r3["premium"] is None and r3["published_at"] is None


def test_csv_roundtrip_preserves_embedded_newlines(spark, tmp_path, csv_path):
    df = read_snapshot_csv(spark, csv_path, SCHEMA)
    out = str(tmp_path / "rt")
    write_csv(df.drop("published_at"), out)
    back = read_snapshot_csv(
        spark, out, T.StructType([f for f in SCHEMA.fields if f.name != "published_at"])
    )
    orig = sorted(map(tuple, df.drop("published_at").collect()))
    assert sorted(map(tuple, back.collect())) == orig
