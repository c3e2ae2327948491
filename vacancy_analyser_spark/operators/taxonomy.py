"""Skill-taxonomy dimension (SURVEY.md §1.1 item 4, FIXTURES.md §3).

The reference ships two expert files — blocks.txt (61 `group/member/...`
lines) and synonims.txt (430 `canonical/variant/...` lines) — loaded by the
notebook (cells 24/26) into dicts and probed with a linear scan per term
(`search_synonim`). Here the same data becomes a small dimension DataFrame
`(member, canonical, group_name)` that gets *broadcast* into the term join:
a ≤500-row dim never justifies a shuffle at any scale.

For harness queries (testdata has no RU skill data) we use a fixed taxonomy
over the synthetic `documents` vocabulary; `load_taxonomy` parses real
blocks/synonims files for the vacancy domain layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SKILL_TAXONOMY_SCHEMA

#: (member, canonical, group_name) over the synthetic documents vocabulary.
#: Deliberately not covering every token — the inner join drops unknowns,
#: mirroring notebook cell 27's `filter(lambda x: x != 0)`.
DOC_TAXONOMY_ROWS: list[tuple[str, str, str]] = [
    ("scan", "read", "io"),
    ("query", "read", "io"),
    ("filter", "compute", "exec"),
    ("sort", "compute", "exec"),
    ("hash", "compute", "exec"),
    ("merge", "compute", "exec"),
    ("join", "compute", "exec"),
    ("agg", "compute", "exec"),
    ("row", "storage", "layout"),
    ("column", "storage", "layout"),
    ("table", "storage", "layout"),
    ("batch", "pipeline", "exec"),
    ("stream", "pipeline", "exec"),
    ("window", "pipeline", "exec"),
    ("spark", "engine", "engine"),
]

#: DuckDB-side mirror of DOC_TAXONOMY_ROWS, usable as a CTE body.
DOC_TAXONOMY_VALUES_SQL = "(VALUES " + ", ".join(
    f"('{m}', '{c}', '{g}')" for m, c, g in DOC_TAXONOMY_ROWS
) + ") AS syn(member, canonical, group_name)"


def doc_taxonomy(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DOC_TAXONOMY_ROWS, SKILL_TAXONOMY_SCHEMA)


def load_taxonomy(spark: SparkSession, blocks_path: str, synonyms_path: str) -> DataFrame:
    """Parse blocks.txt + synonims.txt into the normalized dimension.

    File format (reference example_notebook, notebook cells 24/26):
    blocks.txt line  = ``group/member/member/...``
    synonims.txt line = ``canonical/variant/variant/...`` (canonical is also
    its own variant).

    Parsed distributively — each file is one text read, split/explode'd
    JVM-side — so a million-line taxonomy would work unchanged.
    """
    def parse(path: str, first_col: str, lower_first: bool) -> DataFrame:
        lines = spark.read.text(path)
        parts = F.split(F.col("value"), "/")
        first = F.trim(parts.getItem(0))
        if lower_first:
            first = F.lower(first)
        return lines.select(
            first.alias(first_col),
            F.transform(F.slice(parts, 2, 100_000), lambda x: F.trim(F.lower(x))).alias("members"),
        ).filter(F.length(first_col) > 0)

    blocks = (
        parse(blocks_path, "group_name", lower_first=False)
        .select("group_name", F.explode("members").alias("member"))
        .filter(F.length("member") > 0)
    )
    syn = parse(synonyms_path, "canonical", lower_first=True)
    variants = (
        syn.select(
            "canonical",
            F.explode(F.array_union(F.array(F.col("canonical")), F.col("members"))).alias("member"),
        )
        .filter(F.length("member") > 0)
        .dropDuplicates(["member"])
    )
    # Member universe = blocks members ∪ synonym variants. canonical comes
    # from the synonyms table (identity when absent); group from blocks
    # (NULL for variants not listed there) — notebook cells 24/26-27.
    members = blocks.select("member").union(variants.select("member")).distinct()
    with_canonical = members.join(variants, "member", "left").withColumn(
        "canonical", F.coalesce("canonical", "member")
    )
    return with_canonical.join(blocks, "member", "left").select("member", "canonical", "group_name")
