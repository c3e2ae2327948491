"""Explicit StructType schemas for every table the engine touches.

Schema inference is banned engine-wide: the reference's CSV snapshots embed
newlines inside quoted cells and RU text (reference: get_vacancies.py:169
newline-joined key_skills), which makes inference both slow (extra scan) and
wrong. The vacancy layout mirrors the reference's authoritative Postgres DDL
(feeder_postgres.py:36-96): 54 data columns + 3 lifecycle dates.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# vacancy — flat, reference-canonical (feeder_postgres.py:36-96; CSV header
# order get_vacancies.py:75-133)
# ---------------------------------------------------------------------------

def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_S = T.StringType()
_B = T.BooleanType()
_L = T.LongType()

VACANCY_SCHEMA = T.StructType(
    [
        _f("id", _L, nullable=False),
        _f("description", _S),
        _f("key_skills", _S),  # newline-joined list (get_vacancies.py:169)
        _f("schedule_id", _S),
        _f("schedule_name", _S),
        _f("accept_handicapped", _B),
        _f("accept_kids", _B),
        _f("experience_id", _S),
        _f("experience_name", _S),
        _f("specializations", _S),  # newline-joined structs (get_vacancies.py:154-155)
        _f("contacts", _S),  # newline-joined (get_vacancies.py:157-164)
        _f("billing_type_id", _S),
        _f("billing_type_name", _S),
        _f("allow_messages", _B),
        _f("premium", _B),
        _f("driver_license_types", _S),
        _f("accept_incomplete_resumes", _B),
        _f("employer_id", _L),
        _f("employer_name", _S),
        _f("employer_vacancies_url", _S),
        _f("employer_trusted", _B),
        _f("employer_alternate_url", _S),
        _f("employer_industries", _S),  # newline-joined (get_vacancies.py:145)
        _f("response_letter_required", _B),
        _f("type_id", _S),
        _f("type_name", _S),
        _f("has_test", _B),
        _f("response_url", _S),
        _f("test_required", _B),
        _f("salary_from", _L),
        _f("salary_to", _L),
        _f("salary_gross", _B),
        _f("salary_currency", _S),
        _f("archived", _B),
        _f("name", _S),
        _f("insider_interview", _S),
        _f("area_id", T.IntegerType()),
        _f("area_name", _S),
        _f("area_url", _S),
        _f("created_at", T.TimestampType()),
        _f("published_at", T.TimestampType()),
        _f("address_city", _S),
        _f("address_street", _S),
        _f("address_building", _S),
        _f("address_description", _S),
        _f("address_lat", T.DoubleType()),
        _f("address_lng", T.DoubleType()),
        _f("alternate_url", _S),
        _f("apply_alternate_url", _S),
        _f("code", _S),
        _f("department_id", _S),
        _f("department_name", _S),
        _f("employment_id", _S),
        _f("employment_name", _S),
        # merge-maintained lifecycle dates (feeder_postgres.py:92-94)
        _f("added_at", T.DateType()),
        _f("updated_at", T.DateType()),
        _f("removed_at", T.DateType()),
    ]
)

#: Columns that participate in change detection during the snapshot merge —
#: everything except the primary key and the lifecycle dates
#: (feeder_postgres.py:162-171 diffs every non-date data column).
VACANCY_DATA_COLUMNS = [
    f.name for f in VACANCY_SCHEMA.fields if f.name not in ("id", "added_at", "updated_at", "removed_at")
]

# ---------------------------------------------------------------------------
# vacancy_typed — same fact, with genuinely multi-valued columns promoted to
# first-class collection types (SURVEY.md §1.2). The newline-join in the
# reference is a lossy serialization of exactly these types.
# ---------------------------------------------------------------------------

SPECIALIZATION_STRUCT = T.StructType(
    [
        _f("id", _S),
        _f("name", _S),
        _f("profarea_id", _S),
        _f("profarea_name", _S),
    ]
)

CONTACT_STRUCT = T.StructType([_f("name", _S), _f("email", _S), _f("phone", _S)])

TYPED_OVERRIDES = {
    "key_skills": T.ArrayType(_S),
    "specializations": T.ArrayType(SPECIALIZATION_STRUCT),
    "contacts": T.ArrayType(CONTACT_STRUCT),
    "driver_license_types": T.ArrayType(_S),
    "employer_industries": T.ArrayType(_S),
}

VACANCY_TYPED_SCHEMA = T.StructType(
    [
        T.StructField(f.name, TYPED_OVERRIDES.get(f.name, f.dataType), f.nullable)
        for f in VACANCY_SCHEMA.fields
    ]
)

# ---------------------------------------------------------------------------
# skill taxonomy dimension (blocks.txt / synonims.txt → normalized rows)
# ---------------------------------------------------------------------------

SKILL_TAXONOMY_SCHEMA = T.StructType(
    [_f("member", _S, nullable=False), _f("canonical", _S, nullable=False), _f("group_name", _S)]
)

# ---------------------------------------------------------------------------
# habr_articles (get_habr.py:21) — generalized to `documents` by the harness
# ---------------------------------------------------------------------------

HABR_SCHEMA = T.StructType([_f("id", _L, nullable=False), _f("text", _S)])

# ---------------------------------------------------------------------------
# Harness testdata tables (TESTDATA.md) — explicit so reads never infer.
# ---------------------------------------------------------------------------

_I = T.IntegerType()
_D = T.DoubleType()
_TS = T.TimestampType()

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([_f("r_regionkey", _I), _f("r_name", _S)]),
    "nation": T.StructType([_f("n_nationkey", _I), _f("n_name", _S), _f("n_regionkey", _I)]),
    "customer": T.StructType(
        [_f("c_custkey", _L), _f("c_name", _S), _f("c_nationkey", _I), _f("c_acctbal", _D), _f("c_mktsegment", _S)]
    ),
    "supplier": T.StructType([_f("s_suppkey", _L), _f("s_name", _S), _f("s_nationkey", _I), _f("s_acctbal", _D)]),
    "part": T.StructType(
        [_f("p_partkey", _L), _f("p_name", _S), _f("p_brand", _S), _f("p_type", _S), _f("p_size", _I), _f("p_retailprice", _D)]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", _L),
            _f("o_custkey", _L),
            _f("o_orderstatus", _S),
            _f("o_totalprice", _D),
            _f("o_orderdate", _TS),
            _f("o_orderpriority", _S),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", _L),
            _f("l_partkey", _L),
            _f("l_suppkey", _L),
            _f("l_linenumber", _I),
            _f("l_quantity", _D),
            _f("l_extendedprice", _D),
            _f("l_discount", _D),
            _f("l_tax", _D),
            _f("l_returnflag", _S),
            _f("l_linestatus", _S),
            _f("l_shipdate", _TS),
        ]
    ),
    "events": T.StructType(
        [_f("event_id", _L), _f("ts", _TS), _f("user_id", _L), _f("event_type", _S), _f("value", _D), _f("props", _S)]
    ),
    "documents": T.StructType(
        [_f("doc_id", _L), _f("text", _S), _f("lang", _S), _f("source", _S), _f("n_chars", _L)]
    ),
    "embeddings": T.StructType(
        [_f("vec_id", _L), _f("embedding", T.ArrayType(T.FloatType())), _f("label", _I)]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
