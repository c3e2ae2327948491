"""M3 vacancy domain tests — RU-heavy fixtures (the reference's data is
Russian: blocks.txt/synonims.txt), notebook-parity golden expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vacancy_analyser_spark.operators.taxonomy import load_taxonomy
from vacancy_analyser_spark.vacancy.domain import (
    derive_analysis_columns,
    flat_from_typed,
    it_specializations_only,
    skill_freq_by_year,
    skill_trend,
    typed_from_flat,
)

FLAT_DDL = "id long, name string, description string, key_skills string, specializations string"


def test_typed_roundtrip(spark):
    rows = [
        (
            1,
            "Программист Python",
            "ищем разработчика",
            "python\nsql\ngit",
            "1.221 Программирование 1 Информационные технологии\n1.10 Тестирование 1 Информационные технологии",
        ),
        (2, "Бухгалтер", "учет и отчетность", None, "4.5 Бухгалтерия 4 Финансы"),
    ]
    flat = spark.createDataFrame(rows, FLAT_DDL)
    typed = typed_from_flat(flat)
    r1 = typed.filter("id = 1").collect()[0]
    assert r1["key_skills"] == ["python", "sql", "git"]
    assert r1["specializations"][0]["id"] == "1.221"
    assert r1["specializations"][0]["profarea_name"] == "Информационные"
    r2 = typed.filter("id = 2").collect()[0]
    assert r2["key_skills"] is None

    back = flat_from_typed(typed)
    orig = {r["id"]: r for r in flat.collect()}
    rt = {r["id"]: r for r in back.collect()}
    assert rt[1]["key_skills"] == orig[1]["key_skills"]
    # struct roundtrip keeps the space-joined 4-field form
    assert rt[1]["specializations"].startswith("1.221 Программирование 1 Информационные")


def test_it_specializations_filter(spark):
    flat = spark.createDataFrame(
        [
            (1, "dev", "", "", "1.221 Программирование 1 ИТ"),
            (2, "бухгалтер", "", "", "4.5 Бухгалтерия 4 Финансы"),
            (3, "qa", "", "", "4.5 Бухгалтерия 4 Финансы\n1.117 Тестирование 1 ИТ"),
        ],
        FLAT_DDL,
    )
    kept = sorted(r["id"] for r in it_specializations_only(typed_from_flat(flat)).collect())
    assert kept == [1, 3]


@pytest.fixture()
def taxonomy_files(tmp_path):
    """RU taxonomy files in the reference's slash-separated format
    (blocks.txt line = group/member/..., synonims.txt = canonical/variant/...),
    with punctuated members (c++, 1c, .net) per FIXTURES.md §3."""
    blocks = tmp_path / "blocks.txt"
    blocks.write_text(
        "Языки программирования/python/c++/1c/.net/java\n"
        "Инструменты/git/docker/linux\n",
        encoding="utf-8",
    )
    syn = tmp_path / "synonims.txt"
    syn.write_text(
        "python/питон/python3\n"
        "git/гит\n"
        "1c/1с\n",  # RU 'с' variant of 1c
        encoding="utf-8",
    )
    return str(blocks), str(syn)


def test_load_taxonomy(spark, taxonomy_files):
    blocks, syn = taxonomy_files
    tax = load_taxonomy(spark, blocks, syn)
    rows = {r["member"]: r for r in tax.collect()}
    assert rows["питон"]["canonical"] == "python"
    assert rows["питон"]["group_name"] is None  # variant not in blocks
    assert rows["python"]["group_name"] == "Языки программирования"
    assert rows["c++"]["canonical"] == "c++"  # identity for non-synonym members
    assert rows["1с"]["canonical"] == "1c"


def test_derive_analysis_columns(spark):
    vac = spark.createDataFrame(
        [
            (1, "Программист Python", "нужны python git linux опыт"),
            (2, "Тестировщик ПО", "選考 python тест"),
            (3, "Бухгалтер", "учет 1с отчетность"),
        ],
        "id long, name string, description string",
    )
    prof_dim = spark.createDataFrame(
        [("программист", "programmer"), ("тестировщик", "tester")], "pattern string, prof_class string"
    )
    term_dim = spark.createDataFrame(
        [("python",), ("git",), ("linux",), ("1с",)], "term string"
    )
    out = {r["id"]: r for r in derive_analysis_columns(vac, prof_dim, term_dim).collect()}
    assert out[1]["prof_classes_found"] == "programmer"
    assert out[1]["terms_found"] == "python git linux"  # description order
    assert out[2]["prof_classes_found"] == "tester"
    assert out[3]["prof_classes_found"] == ""
    assert out[3]["terms_found"] == "1с"


def test_skill_freq_and_trend(spark, taxonomy_files):
    blocks, syn = taxonomy_files
    tax = load_taxonomy(spark, blocks, syn)
    rows = [
        (2019, "programmer", "python питон git"),
        (2019, "programmer", "python docker"),
        (2019, "tester", "java"),  # filtered out (wrong prof)
        (2020, "programmer", "питон неизвестныйтермин"),
        (2020, "programmer", "git гит"),
    ]
    df = spark.createDataFrame(rows, "year int, prof_classes_found string, terms_found string")
    freq = skill_freq_by_year(df, tax, "programmer")
    counts = {(r["year"], r["canonical"]): r["cnt"] for r in freq.collect()}
    # 2019: python×3 (python, питон, python), git×1, docker×1; unknown dropped
    assert counts[(2019, "python")] == 3
    assert counts[(2019, "git")] == 1
    assert counts[(2020, "git")] == 2
    assert counts[(2020, "python")] == 1
    assert (2019, "java") not in counts  # tester row excluded

    trend = skill_trend(freq, top_n=2).collect()
    by_key = {(r["year"], r["canonical"]): r for r in trend}
    # top-2 overall = python(4), git(3); docker excluded
    assert set(k[1] for k in by_key) == {"python", "git"}
    assert by_key[(2019, "python")]["pct"] == pytest.approx(60.0)
    assert by_key[(2019, "python")]["rank_in_year"] == 1
    assert by_key[(2020, "git")]["pct"] == pytest.approx(2 * 100.0 / 3)
