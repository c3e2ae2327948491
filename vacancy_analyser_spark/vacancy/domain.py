"""Vacancy analytics domain layer (SURVEY.md §7 M3): reference parity for
the notebook workload (example_notebook/001_Анализ_данных_о_вакансиях.ipynb).

Pipeline replicated, cell-by-cell:
- the IEEE dataset's derived columns `prof_classes_found` / `terms_found`
  (cell 12) — computed here instead of assumed (derive_analysis_columns);
- per-profession skill frequencies (cells 26-27: make_synonims /
  search_synonim / count_freq_skill_by_year) — explode → broadcast taxonomy
  join → count (skill_freq_by_year);
- year pivot + %-normalization + top-N (cells 16-17, 28-32) — skill_trend.

The notebook rescans every yearly CSV for each of its three analyses; the
engine computes the exploded+joined intermediate once (cache()) and derives
all views from it — the single biggest win over the reference's lifecycle.

Typed-variant conversions (P6/P7): the reference serializes arrays as
newline-joined CSV cells (get_vacancies.py:154-182); typed_from_flat /
flat_from_typed are the lossless bridges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: Multi-valued columns stored newline-joined in the flat layout
#: (get_vacancies.py:169,177,182,145).
ARRAY_COLUMNS = ("key_skills", "driver_license_types", "employer_industries")

#: specializations cells are "id name profarea_id profarea_name" rows joined
#: by newline (get_vacancies.py:154-155) — parsed to array<struct>.
SPECIALIZATION_COLUMNS = ("id", "name", "profarea_id", "profarea_name")


def typed_from_flat(df: DataFrame) -> DataFrame:
    """P7 inverse: newline-joined cells → array columns; specializations →
    array<struct>. Pure projection, no shuffle."""
    out = df
    for c in ARRAY_COLUMNS:
        if c in df.columns:
            out = out.withColumn(
                c, F.when(F.col(c).isNull(), None).otherwise(F.split(F.col(c), "\n"))
            )
    if "specializations" in df.columns:
        line = F.split(F.col("specializations"), "\n")
        parse = F.transform(
            line,
            lambda s: F.struct(
                *[
                    F.split(s, " ").getItem(i).alias(name)
                    for i, name in enumerate(SPECIALIZATION_COLUMNS)
                ]
            ),
        )
        out = out.withColumn(
            "specializations",
            F.when(F.col("specializations").isNull(), None).otherwise(parse),
        )
    return out


def flat_from_typed(df: DataFrame) -> DataFrame:
    """P7: array columns → newline-joined strings (CSV/Postgres layout)."""
    out = df
    for c in ARRAY_COLUMNS:
        if c in df.columns:
            out = out.withColumn(c, F.array_join(F.col(c), "\n"))
    if "specializations" in df.columns:
        out = out.withColumn(
            "specializations",
            F.array_join(
                F.transform(
                    F.col("specializations"),
                    lambda s: F.concat_ws(" ", *[s.getField(n) for n in SPECIALIZATION_COLUMNS]),
                ),
                "\n",
            ),
        )
    return out


def it_specializations_only(df: DataFrame) -> DataFrame:
    """P3 (get_hist_vacancies.py:109-112): keep vacancies where any
    specialization id has major group '1' (IT). Higher-order `exists` on the
    typed column — no explode, no shuffle."""
    return df.filter(
        F.exists(
            F.col("specializations"),
            lambda s: F.split(s.getField("id"), r"\.").getItem(0) == "1",
        )
    )


def derive_analysis_columns(
    df: DataFrame,
    prof_dim: DataFrame,
    term_dim: DataFrame,
    id_col: str = "id",
    title_col: str = "name",
    text_col: str = "description",
) -> DataFrame:
    """Compute the IEEE dataset's text-mining columns (notebook cell 12):

    - prof_classes_found: space-joined profession classes whose pattern
      appears as a substring of the lowercased title;
    - terms_found: space-joined description tokens present in the term dim.

    prof_dim: (pattern, prof_class); term_dim: (term). Both tiny →
    broadcast; the description side is explode→join→collect_list, one
    shuffle on the vacancy id.
    """
    lower_title = F.lower(F.col(title_col))
    profs = (
        df.select(id_col, title_col)
        .join(F.broadcast(prof_dim), lower_title.contains(F.col("pattern")), "left")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("prof_class")).alias("_profs"))
    )
    toks = df.select(id_col, F.posexplode(tokens(text_col)).alias("pos", "token"))
    terms = (
        toks.join(F.broadcast(term_dim), toks.token == term_dim.term, "inner")
        .groupBy(id_col)
        # keep first-occurrence order like the notebook's linear scan
        .agg(F.array_agg(F.struct("pos", "token")).alias("_t"))
        .select(
            id_col,
            F.transform(F.array_sort("_t"), lambda s: s.getField("token")).alias("_terms"),
        )
    )
    return (
        df.join(profs, id_col, "left")
        .join(terms, id_col, "left")
        .withColumn("prof_classes_found", F.array_join(F.coalesce("_profs", F.array()), " "))
        .withColumn("terms_found", F.array_join(F.coalesce("_terms", F.array()), " "))
        .drop("_profs", "_terms")
    )


def skill_freq_by_year(
    df: DataFrame,
    taxonomy: DataFrame,
    use_prof: str,
    year_col: str = "year",
) -> DataFrame:
    """Cells 27-28 (`count_freq_skill_by_year` over a year loop) as one
    distributed pass over all years:

    filter(title-class contains use_prof) → explode(terms_found) →
    broadcast taxonomy join (inner = drop unknowns, the cell-27
    `filter(lambda x: x != 0)`) → count per (year, canonical).
    """
    base = df.filter(F.col("prof_classes_found").contains(use_prof)).filter(
        F.col("terms_found").isNotNull() & (F.length("terms_found") > 0)
    )
    exploded = base.select(year_col, F.explode(F.split("terms_found", " ")).alias("term"))
    return (
        exploded.join(F.broadcast(taxonomy), exploded.term == taxonomy.member, "inner")
        .groupBy(year_col, "canonical")
        .agg(F.count("*").alias("cnt"))
    )


def skill_trend(
    freq: DataFrame,
    top_n: int = 10,
    year_col: str = "year",
) -> DataFrame:
    """Cells 16 + 30-32: normalize counts to % of year total, rank, keep the
    overall top-N skills — returned long-format (skill, year, cnt, pct,
    rank); pivot only at display time (toPandas().pivot), because a
    [skill × year] matrix is a visualization, not a 100 TB dataflow."""
    from pyspark.sql import Window

    year_w = Window.partitionBy(year_col)
    pct = (F.col("cnt") * 100.0 / F.sum("cnt").over(year_w)).alias("pct")
    with_pct = freq.select(year_col, "canonical", "cnt", pct)
    totals = freq.groupBy("canonical").agg(F.sum("cnt").alias("total_cnt"))
    top = totals.orderBy(F.col("total_cnt").desc(), F.col("canonical")).limit(top_n)
    rank_w = Window.partitionBy(year_col).orderBy(F.col("pct").desc(), F.col("canonical"))
    return (
        with_pct.join(F.broadcast(top), "canonical", "left_semi")
        .withColumn("rank_in_year", F.row_number().over(rank_w))
    )
