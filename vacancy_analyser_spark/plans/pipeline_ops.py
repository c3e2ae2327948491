"""Registered training-data pipeline operators (SURVEY.md §2.11) that wrap
tested API surface staged in r2: the Misra-Gries heavy-hitter sketch
(operators/sketches.py), the PII scrub (functions/text.py), and the
per-group deterministic sampler (corpus.py).

Each entry keeps the registry contract: the Spark plan and the DuckDB
oracle compute bit-identical results (exact counts, shared regexes, shared
md5-rank recipe), so "sketch-accelerated" never means "approximate output".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import sample_per_group
from ..functions.text import _PII_RULES, redact_pii, tokens
from ..io import load_table
from ..operators.sketches import heavy_hitters
from .registry import register
from .textops import _TOKS_SQL

#: Frequency threshold for the registered heavy-hitter query: tokens with
#: > 1% of all token occurrences. The synthetic corpus has a small engine
#: vocabulary, so the survivor set is a few dozen rows — big enough to be
#: a real check, small enough to hash instantly.
HH_PHI = 0.01


@register(
    "heavy_hitters",
    oracle=f"""
        WITH toks AS (
            SELECT unnest({_TOKS_SQL}) AS tok FROM documents
        )
        SELECT tok, COUNT(*) AS freq
        FROM toks
        GROUP BY tok
        HAVING COUNT(*) > {HH_PHI} * (SELECT COUNT(*) FROM toks)
    """,
    tags=("ext-sketch",),
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens covering > φ of all token occurrences, via the Misra-Gries
    candidate pass + exact verify (operators/sketches.py). The output is
    EXACT — the sketch only bounds the candidate set, which is why a plain
    GROUP BY ... HAVING oracle can hash-match it. At 100 TB the first pass
    is a scan with ≤ k counters per partition (nothing vocabulary-sized
    shuffles); only the ≤ k·partitions candidates reach the exact pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return heavy_hitters(toks, "tok", HH_PHI)


def _redact_sql(expr: str) -> str:
    """Nest the same _PII_RULES chain as DuckDB regexp_replace calls —
    generated from the shared rule table so the two engines cannot drift."""
    out = expr
    for pattern, token in _PII_RULES:
        sql_pattern = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pattern}', '{token}', 'g')"
    return out


#: The synthetic corpus carries no real PII, so the registered query plants
#: a deterministic contact block per doc (email + IPv4 + phone, derived
#: from doc_id) and redacts it — every row exercises every rule, and the
#: oracle rebuilds the identical input.
@register(
    "redact_pii",
    oracle=f"""
        SELECT doc_id,
               {_redact_sql(
                   "text || ' contact user' || CAST(doc_id AS VARCHAR)"
                   " || '@mail.example or 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
                   " || '.7, tel +7 912 345-67-89'"
               )} AS redacted
        FROM documents
    """,
    tags=("ext-text", "ext-scrub"),
)
def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub before corpus publication: emails → [EMAIL], IPv4 → [IP],
    phone-shaped digit runs → [PHONE], longest-match-first (functions/
    text.py:_PII_RULES). Pure regexp_replace chain — scan-side, codegen'd,
    no UDF — so at 100 TB the scrub rides the scan for free. Both engines
    apply the chain in the same rule order; the POSIX-class patterns mean
    the same thing to Java regex and RE2."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7, tel +7 912 345-67-89"),
    )
    return docs.select("doc_id", redact_pii(planted).alias("redacted"))


SAMPLE_PER_GROUP_N = 20


@register(
    "sample_per_group",
    oracle=f"""
        WITH r AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, lang FROM r WHERE rn <= {SAMPLE_PER_GROUP_N}
    """,
    tags=("ext-sample",),
)
def sample_per_group_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per language (corpus.py:
    sample_per_group): rank by md5(doc_id) within each lang, keep the
    first N — the distributed stand-in for reservoir sampling.
    Reproducible row-local state (never rand()), so re-runs,
    repartitionings, and the SQL oracle agree exactly. One shuffle on the
    group key; at scale WindowGroupLimit prunes to N rows per group
    map-side before the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_per_group(docs, SAMPLE_PER_GROUP_N, key="doc_id", group="lang").select(
        "doc_id", "lang"
    )
