"""P-ops: projection / filter / row-level transforms (SURVEY.md §2.2).

All pure Column expressions — Catalyst pushes the filters and the projection
into the parquet scan (verify with .explain: PushedFilters / ReadSchema), and
everything stays inside whole-stage codegen. No Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import cut_text
from ..io import load_table
from .registry import register


@register(
    "project_columns",
    oracle="SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    tags=("P1",),
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 column projection (notebook `usecols`, cells 11/17/22/28).

    Catalyst column pruning means the parquet scan reads exactly these three
    columns — the 100 TB equivalent of pandas usecols, for free.
    """
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "filter_not_archived",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders WHERE o_orderstatus <> 'F'
    """,
    tags=("P2",),
)
def filter_not_archived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 boolean filter: drop archived rows (feeder_postgres.py:131-134
    skips `archived == "true"`). Pushed down to the parquet row-group level.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") != "F").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


@register(
    "filter_it_specialization",
    oracle="""
        SELECT p_partkey, p_name
        FROM part
        WHERE list_contains(string_split(p_name, ' '), 'small')
    """,
    tags=("P3",),
)
def filter_it_specialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 set-membership predicate on a split string: the reference keeps a
    vacancy iff any specialization id has major group "1"
    (get_hist_vacancies.py:109-112). Same shape here: keep parts whose name
    has the token 'small'. `exists` is a higher-order function evaluated
    JVM-side — no explode, no shuffle.
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.exists(F.split(F.col("p_name"), " "), lambda t: t == F.lit("small"))
    ).select("p_partkey", "p_name")


@register(
    "filter_contains",
    oracle="SELECT p_partkey, p_name, p_brand FROM part WHERE p_name LIKE '%widget%'",
    tags=("P4",),
)
def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 substring-containment filter (notebook cell 27:
    `use_prof in prof_classes_found`)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").contains("widget")).select("p_partkey", "p_name", "p_brand")


@register(
    "null_handling",
    oracle="""
        SELECT event_id,
               COALESCE(NULLIF(event_type, ''), 'unknown') AS etype,
               COALESCE(value, 0.0) AS value_filled
        FROM events
        WHERE event_type IS NOT NULL
    """,
    tags=("P5",),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 null handling: fillna-before-use / dropna-after-filter
    (notebook cells 15/27; feeder_postgres.py:127-129 empty→NULL)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type").isNotNull())
        .select(
            "event_id",
            F.coalesce(F.nullif(F.col("event_type"), F.lit("")), F.lit("unknown")).alias("etype"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        )
    )


@register(
    "flatten_struct",
    oracle="""
        SELECT o_orderkey, s.status AS status, s.priority AS priority
        FROM (
            SELECT o_orderkey,
                   {'status': o_orderstatus, 'priority': o_orderpriority} AS s
            FROM orders
        )
    """,
    tags=("P6",),
)
def flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 struct flattening: nested JSON → prefixed flat columns
    (get_vacancies.py:166-221 does this with 56 lines of None-guarded Python;
    in Spark it is a pure projection the optimizer collapses)."""
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
        ).alias("s"),
    )
    return nested.select("o_orderkey", F.col("s.status").alias("status"), F.col("s.priority").alias("priority"))


@register(
    "array_join_split",
    oracle="""
        SELECT p_partkey,
               array_to_string(string_split(p_name, ' '), '|') AS joined,
               CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens
        FROM part
    """,
    tags=("P7",),
)
def array_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 array↔string serialization: the reference newline-joins arrays into
    CSV cells (get_vacancies.py:154-182); `array_join`/`split` are the
    lossless Spark equivalents."""
    part = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.array_join(toks, "|").alias("joined"),
        F.size(toks).cast("int").alias("n_tokens"),
    )


@register(
    "string_truncate",
    oracle="""
        SELECT doc_id,
               CASE WHEN length(text) > 128
                    THEN substr(text, 1, 128) || '...'
                    ELSE text END AS clipped
        FROM documents
    """,
    tags=("P8",),
)
def string_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 display truncation (`cut_text`, feeder_postgres.py:105-109)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", cut_text("text", 128).alias("clipped"))


@register(
    "regexp_extract_year",
    oracle="""
        SELECT o_orderkey,
               CAST(regexp_extract(CAST(o_orderdate AS VARCHAR), '[0-9]{4}') AS INT) AS year
        FROM orders
    """,
    tags=("P9",),
)
def regexp_extract_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 regex extraction: the notebook derives the year from file names
    (`vacancies_[0-9]{4}.csv.gz`, cell 4); same regex machinery over a value
    column here. At scale prefer `year()` — registered as date_functions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.regexp_extract(F.col("o_orderdate").cast("string"), r"[0-9]{4}", 0)
        .cast("int")
        .alias("year"),
    )


@register(
    "date_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
                   AS days_to_cutoff,
               date_trunc('day', o_orderdate) + INTERVAL 7 DAY AS plus_week
        FROM orders
    """,
    tags=("P10",),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 timestamp/date parsing & arithmetic (feeder_postgres.py:124-125
    ISO parse; metrics_exporter.py:123-127 day diff; periodic_run.py:35
    interval add)."""
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).cast("int").alias("order_year"),
        F.month(od).cast("int").alias("order_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), od.cast("date")).cast("bigint").alias("days_to_cutoff"),
        F.date_add(od.cast("date"), 7).cast("timestamp").alias("plus_week"),
    )


@register(
    "csv_typed_scan",
    oracle="""
        SELECT event_id,
               date_trunc('day', ts) AS event_date,
               COALESCE(NULLIF(event_type, ''), NULL) AS event_type,
               CAST(value AS DOUBLE) AS value,
               event_type = 'click' AS is_click
        FROM events
    """,
    tags=("S7",),
)
def csv_typed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 typed scan semantics (feeder_postgres.py:119-131: id→int, ISO
    timestamp parse, ""→NULL, "true"/"false"→bool). Parquet-backed in the
    harness; the real CSV path is io.read_snapshot_csv (multiLine + schema).
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("event_date"),
        F.nullif(F.col("event_type"), F.lit("")).alias("event_type"),
        F.col("value").cast("double").alias("value"),
        (F.col("event_type") == "click").alias("is_click"),
    )


#: S4 fixture rules, shared verbatim by the Spark builder and the DuckDB
#: oracle: every 13th doc (mod 7) renders with NO <article> element (the
#:   reference's non-200 page — it must be SKIPPED, get_habr.py:62-65),
#: and every 7th (mod 3) renders an EMPTY title (malformed markup the
#: parse must survive, not drop).
_HTML_NO_ARTICLE_MOD, _HTML_NO_ARTICLE_REM = 13, 7
_HTML_EMPTY_TITLE_MOD, _HTML_EMPTY_TITLE_REM = 7, 3


@register(
    "habr_html_parse",
    oracle=f"""
        WITH page AS (
            SELECT doc_id, n_chars,
                '<html><head><title>' || source || '</title></head><body>' ||
                CASE WHEN doc_id % {_HTML_NO_ARTICLE_MOD} = {_HTML_NO_ARTICLE_REM}
                     THEN '<div class="error">404</div>'
                     ELSE '<article id="post_' || CAST(doc_id AS VARCHAR) ||
                          '"><h1 class="tm-title">' ||
                          CASE WHEN doc_id % {_HTML_EMPTY_TITLE_MOD} = {_HTML_EMPTY_TITLE_REM}
                               THEN '' ELSE 'Post ' || CAST(doc_id AS VARCHAR) END ||
                          '</h1><time datetime="2024-' ||
                          lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
                          lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
                          'T10:00:00Z"></time><div class="article-body"><p>' ||
                          text || '</p></div></article>'
                END || '</body></html>' AS html
            FROM documents
        ),
        parsed AS (
            SELECT
                TRY_CAST(regexp_extract(html, 'id="post_([0-9]+)"', 1) AS BIGINT)
                    AS post_id,
                regexp_extract(html, '<h1 class="tm-title">([^<]*)</h1>', 1) AS title,
                regexp_extract(html, 'datetime="([^"]+)"', 1) AS published,
                regexp_extract(html, '<p>([^<]*)</p>', 1) AS body
            FROM page
        )
        SELECT post_id, title, published,
               CAST(length(body) AS BIGINT) AS body_chars,
               CAST(len(string_split(body, ' ')) AS BIGINT) AS body_words
        FROM parsed WHERE post_id IS NOT NULL
    """,
    tags=("S4",),
)
def habr_html_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 stored-HTML article parse (get_habr.py:21-43,58-68: the scraper
    stores the RAW page text per post id; analysis needs the fields back
    out). The fixture renders a deterministic habr-shaped page per
    ``documents`` row — including no-article pages (the reference's
    skipped non-200 fetches) and empty-title markup — then the parse
    extracts post id, title, publish datetime and body with native
    ``regexp_extract`` and drops pages with no article, exactly as the
    scraper skips failed posts.

    Everything is scan-side Column algebra (concat/lpad/regexp_extract —
    whole-stage codegen, no Python in the row path); at 100 TB this is
    the shape of a raw-HTML lake scan: one pass, no shuffle, parse cost
    linear in bytes."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    article = F.concat(
        F.lit('<article id="post_'), did.cast("string"),
        F.lit('"><h1 class="tm-title">'),
        F.when(
            did % _HTML_EMPTY_TITLE_MOD == _HTML_EMPTY_TITLE_REM, F.lit("")
        ).otherwise(F.concat(F.lit("Post "), did.cast("string"))),
        F.lit('</h1><time datetime="2024-'),
        F.lpad((did % 12 + 1).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((did % 28 + 1).cast("string"), 2, "0"),
        F.lit('T10:00:00Z"></time><div class="article-body"><p>'),
        F.col("text"), F.lit("</p></div></article>"),
    )
    html = F.concat(
        F.lit("<html><head><title>"), F.col("source"),
        F.lit("</title></head><body>"),
        F.when(
            did % _HTML_NO_ARTICLE_MOD == _HTML_NO_ARTICLE_REM,
            F.lit('<div class="error">404</div>'),
        ).otherwise(article),
        F.lit("</body></html>"),
    )
    body = F.regexp_extract(F.col("html"), r"<p>([^<]*)</p>", 1)
    return (
        docs.select(html.alias("html"))
        .select(
            F.regexp_extract(F.col("html"), r'id="post_([0-9]+)"', 1)
            .try_cast("bigint")
            .alias("post_id"),
            F.regexp_extract(
                F.col("html"), r'<h1 class="tm-title">([^<]*)</h1>', 1
            ).alias("title"),
            F.regexp_extract(F.col("html"), r'datetime="([^"]+)"', 1).alias(
                "published"
            ),
            body.alias("body"),
        )
        .filter(F.col("post_id").isNotNull())
        .select(
            "post_id", "title", "published",
            F.length("body").cast("bigint").alias("body_chars"),
            F.size(F.split(F.col("body"), " ")).cast("bigint").alias("body_words"),
        )
    )
