"""Text-analysis ops over `documents` (SURVEY.md §2.9 [ext], §2.11):
token counting, per-language stats, quality scoring, language-ID heuristic,
document fingerprinting, JSON access.

Everything is built-in-function Column algebra (split/regexp/md5/aggregate) —
no Python UDFs — so the text path is whole-stage-codegen'd and scales with
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    BOILER_MIN_DOCS,
    BOILER_NGRAM,
    normalize_ws,
    token_ngrams,
    tokens,
    quality_ok,
    quality_signals,
)
from ..io import load_table
from .registry import register

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"

#: tiny per-language marker-word dimension for the language-ID heuristic.
#: The synthetic corpus is English-vocabulary across all `lang` labels, so
#: markers are picked per engine-vocab token just to exercise the machinery;
#: a real deployment loads stopword lists per language.
LANG_MARKERS: list[tuple[str, str]] = [
    ("the", "en"), ("a", "en"), ("and", "en"),
    ("le", "fr"), ("la", "fr"), ("et", "fr"),
    ("der", "de"), ("und", "de"), ("die", "de"),
    ("el", "es"), ("los", "es"), ("y", "es"),
]
_LANG_MARKERS_SQL = "(VALUES " + ", ".join(f"('{w}', '{l}')" for w, l in LANG_MARKERS) + ") AS m(word, marker_lang)"


@register(
    "token_count",
    oracle=f"""
        SELECT doc_id, CAST(len({_TOKS_SQL}) AS INT) AS n_tokens
        FROM documents
    """,
    tags=("ext-text",),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document — the unit step of every
    token-budget computation in a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(tokens("text")).cast("int").alias("n_tokens"))


@register(
    "doc_lang_stats",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / COUNT(n_chars) AS DOUBLE)
                   AS avg_chars,
               CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY lang
    """,
    tags=("ext-text",),
)
def doc_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: per-language doc counts, average length, token
    totals — the first dashboard of any crawl snapshot."""
    from ..functions.numeric import davg

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        davg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("total_tokens"),
    )


@register(
    "json_extract_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_value
        FROM events
    """,
    tags=("ext-json",),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access on events.props (semi-structured sidecar columns).
    get_json_object is JVM-side; for repeated multi-field access prefer
    from_json with an explicit schema (single parse)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_value"),
    )


@register(
    "doc_quality_filter",
    oracle=f"""
        SELECT doc_id, lang, n_chars, n_tokens, alpha_ratio
        FROM (
            SELECT doc_id, lang, n_chars,
                   CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                       / length(text) AS alpha_ratio
            FROM documents
            WHERE length(text) > 0
        )
        WHERE n_chars BETWEEN 120 AND 400
          AND n_tokens >= 20
          AND alpha_ratio > 0.7
    """,
    tags=("ext-text",),
)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + filter: length bounds, token floor, alphabetic-char
    ratio — the C4/Gopher-style heuristic gate, as pushdown-friendly Column
    algebra."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens, alpha_ratio = quality_signals("text")
    return (
        docs.select(
            "doc_id", "lang", "n_chars",
            n_tokens.alias("n_tokens"), alpha_ratio.alias("alpha_ratio"),
        )
        .filter(quality_ok("n_chars", F.col("n_tokens"), F.col("alpha_ratio")))
    )


@register(
    "lang_id_ngram",
    oracle=f"""
        WITH markers AS (SELECT * FROM {_LANG_MARKERS_SQL}),
        hits AS (
            SELECT doc_id, marker_lang, COUNT(*) AS score
            FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents) t
            JOIN markers ON t.token = markers.word
            GROUP BY doc_id, marker_lang
        )
        SELECT doc_id, marker_lang AS lang_guess, score
        FROM (
            SELECT doc_id, marker_lang, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, marker_lang) AS rn
            FROM hits
        ) WHERE rn = 1
    """,
    tags=("ext-text",),
)
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: count marker-word hits per candidate language,
    argmax with deterministic tie-break. explode→broadcast-join→two-level
    agg; the marker dim stays broadcast at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    markers = F.broadcast(
        spark.createDataFrame(LANG_MARKERS, "word string, marker_lang string")
    )
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    hits = (
        toks.join(markers, toks.token == markers.word)
        .groupBy("doc_id", "marker_lang")
        .agg(F.count("*").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("marker_lang"))
    return (
        hits.select("doc_id", F.col("marker_lang").alias("lang_guess"), "score",
                    F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "lang_confusion_matrix",
    oracle=f"""
        WITH markers AS (SELECT * FROM {_LANG_MARKERS_SQL}),
        hits AS (
            SELECT doc_id, marker_lang, COUNT(*) AS score
            FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents) t
            JOIN markers ON t.token = markers.word
            GROUP BY doc_id, marker_lang
        ),
        guess AS (
            SELECT doc_id, marker_lang AS lang_guess
            FROM (
                SELECT doc_id, marker_lang,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, marker_lang) AS rn
                FROM hits
            ) WHERE rn = 1
        )
        SELECT d.lang AS label_lang,
               COALESCE(g.lang_guess, 'unknown') AS guess_lang,
               COUNT(*) AS n_docs
        FROM documents d LEFT JOIN guess g USING (doc_id)
        GROUP BY d.lang, COALESCE(g.lang_guess, 'unknown')
    """,
    tags=("ext-text", "pipeline"),
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-classifier confusion matrix: the corpus's declared `lang`
    column against lang_id_ngram's guess ('unknown' where no marker
    fires). The audit a pipeline runs before TRUSTING a metadata language
    tag for filtering or mixing — off-diagonal mass means either
    mislabeled feeds or a classifier blind spot, and the matrix says
    which language pairs to look at.

    Composes the registered classifier verbatim (same recipe, not a
    copy), left-joins the guess back to the labels, aggregates to a
    |langs|² matrix — dimension-sized output, one extra shuffle over the
    classifier itself."""
    docs = load_table(spark, sf_dir, "documents")
    guess = lang_id_ngram(spark, sf_dir).select("doc_id", "lang_guess")
    return (
        docs.select("doc_id", "lang")
        .join(guess, "doc_id", "left")
        .groupBy(
            F.col("lang").alias("label_lang"),
            F.coalesce("lang_guess", F.lit("unknown")).alias("guess_lang"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "doc_fingerprint",
    oracle=f"""
        SELECT doc_id, md5({_NORM_SQL}) AS fingerprint
        FROM documents
    """,
    tags=("ext-text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint over whitespace-normalized text —
    the join key for exact dedup across shards/snapshots. md5 is used (not
    xxhash64) because it is engine-portable; swap to xxhash64 for pure-Spark
    pipelines where speed matters more than portability."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(normalize_ws("text")).alias("fingerprint"))


#: BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
#: Plain character classes only — identical semantics in Java regex (Spark)
#: and RE2 (DuckDB); lookarounds like GPT-2's real pattern are not portable.
_SUBTOKEN_RE = r"[A-Za-zА-Яа-яЁё]+|[0-9]+|[^A-Za-zА-Яа-яЁё0-9\s]"


@register(
    "bpe_token_estimate",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{_SUBTOKEN_RE}')) AS INT) AS n_subtokens
        FROM documents
    """,
    tags=("ext-text",),
)
def bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation at two granularities: whitespace words and a
    BPE-ish pre-tokenization (letter runs / digit runs / punctuation marks
    — the split boundaries real BPE vocabularies refine, so its count is a
    stable upper-bound proxy for subword token budgets). Pure per-row
    column algebra: no shuffle at all, scales with the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens("text")).cast("int").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_SUBTOKEN_RE), 0)).cast("int").alias(
            "n_subtokens"
        ),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, term, score
        FROM (
            SELECT tf.doc_id, tf.term,
                   (CAST(tf.tf AS DOUBLE)
                    * (CAST(n.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5))
                   / (CAST(dfreq.df AS DOUBLE) + 0.5) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (CAST(tf.tf AS DOUBLE)
                                 * (CAST(n.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5))
                                / (CAST(dfreq.df AS DOUBLE) + 0.5) DESC,
                                tf.term
                   ) AS rn
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ) ranked
        WHERE rn <= 5
    """,
    tags=("ext-text",),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tf-idf keyword extraction: the 5 most characteristic terms per
    document (SURVEY §2.9's text-analysis pack names tf-idf; this is the
    engine-native form — no ml.feature stage, no Python).

    Scoring uses the BM25-style rational idf (N - df + 0.5)/(df + 0.5)
    instead of a logarithm: same ranking monotonicity, but pure integer
    arithmetic in doubles, so the score — and therefore the per-doc
    ranking and the hash compare — is bit-identical across engines
    (libm log implementations are not).

    Dataflow: tokenize→explode once; per-(doc,term) counts are the only
    pass over raw tokens; document frequency aggregates from THAT table,
    not a second token pass; the corpus size is a broadcast 1-row scalar.
    Shuffles: by (doc,term) for tf, by term for the df join, back to doc
    for the top-5 window — each stage's input is already aggregate-sized.
    At 100 TB the df side concentrates into a Zipf head; its join stays
    sort-merge (AQE handles the skewed head), and the window's per-doc
    partitions are bounded by vocabulary, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    # Materialize before branching: the df branch prunes to a distinct
    # aggregate, which breaks exchange reuse (verified on the executed
    # plan) — without the cache the tokenize+explode pass runs twice.
    tf.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = (
        F.col("tf").cast("double")
        * (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
    ) / (F.col("df").cast("double") + 0.5)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "score")
    )


#: Sparse tf-idf cosine: per-doc vector = its TFIDF_VEC_K top terms (the
#: truncation is what bounds the candidate join — full tf vectors would
#: put every stopword in every vector and pay Σ df² over the Zipf head).
TFIDF_VEC_K = 10
#: 0.7 keeps the real lexical near-dups (515 pairs at sf0.01) and drops
#: the long topical-similarity tail (0.3 admits ~half of ALL pairs on
#: this shared-vocabulary corpus — measured before choosing).
TFIDF_SIM_T = 0.7

#: The last decision the tfidf-cosine planner made, for observability —
#: the tfidf twin of dedup.LAST_SPARSE_DISPATCH (same caveats: a
#: last-writer-wins diagnostic record, never control flow). Keys:
#: cand_rows (Σ dt(dt−1)/2 over the top-K vector table), width
#: (explicit exchange width, None = stock), capped (the probe crossed
#: the exchange-width budget and the capped metric was dispatched).
LAST_TFIDF_DISPATCH: dict = {}


_TFIDF_VEC0_CTES = f"""toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        vec0 AS (
            SELECT doc_id, term, score FROM (
                SELECT tf.doc_id, tf.term,
                       (CAST(tf.tf AS DOUBLE)
                        * (CAST(n.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5))
                       / (CAST(dfreq.df AS DOUBLE) + 0.5) AS score,
                       ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY (CAST(tf.tf AS DOUBLE)
                                     * (CAST(n.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5))
                                    / (CAST(dfreq.df AS DOUBLE) + 0.5) DESC,
                                    tf.term
                       ) AS rn
                FROM tf JOIN dfreq USING (term) CROSS JOIN n
            ) WHERE rn <= {TFIDF_VEC_K}
        )"""

#: nrm/dot/select suffix over a CTE named `vec` — ONE definition of the
#: fixed-point cosine shared by the exact and capped oracles, so the
#: scoring arithmetic cannot drift between the variants.
_TFIDF_PAIRS_SQL = f"""nrm AS (
            SELECT doc_id,
                   sqrt(CAST(SUM(CAST(round(score * score * 1e9) AS BIGINT)) AS DOUBLE)
                        / 1e9) AS nrm
            FROM vec GROUP BY doc_id
        ),
        dot AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(SUM(CAST(round(a.score * b.score * 1e9) AS BIGINT)) AS DOUBLE)
                       / 1e9 AS dp
            FROM vec a JOIN vec b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT a_id, b_id, round(dp / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dot
        JOIN nrm na ON a_id = na.doc_id
        JOIN nrm nb ON b_id = nb.doc_id
        WHERE dp / (na.nrm * nb.nrm) >= {TFIDF_SIM_T}"""


def _tfidf_vec0(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, term, score): each document's TFIDF_VEC_K top tf-idf terms
    — the shared vector builder of both cosine variants (tf persisted:
    the df branch breaks exchange reuse, see tfidf_top_terms). Pass
    ``docs`` to share one table load with a caller that also reads it."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    tf.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = (
        F.col("tf").cast("double")
        * (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
    ) / (F.col("df").cast("double") + 0.5)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_VEC_K)
        .select("doc_id", "term", "score")
    )


def _cosine_pairs_from(vec: DataFrame, shuffle_width: int | None = None) -> DataFrame:
    """Pairs with cosine ≥ TFIDF_SIM_T over a (doc_id, term, score) vector
    table — the ONE implementation of the fixed-point dot/norm arithmetic
    (term-bucketed candidates; unhinted doc-scaled norm joins, AQE-sized;
    mirrors _TFIDF_PAIRS_SQL).

    ``shuffle_width`` is the corpus-mass knob, same mechanics as
    dedup._countjoin_pairs: both self-join aliases read ONE
    term-repartitioned cache so the join runs exchange-free at the chosen
    width, and the dot aggregate gets an explicit (a_id, b_id)
    repartition that REPLACES its default-width exchange. None = the
    stock plan, byte-identical to before."""
    if shuffle_width:
        vec = vec.repartition(shuffle_width, "term")
    vec = vec.persist()
    vec.count()  # norms + both candidate-join sides read it

    def fxsum(col):
        return (
            F.sum(F.round(col * F.lit(1e9)).cast("bigint")).cast("double") / F.lit(1e9)
        )

    nrm = vec.groupBy("doc_id").agg(F.sqrt(fxsum(F.col("score") * F.col("score"))).alias("nrm"))
    a, b = vec.alias("a"), vec.alias("b")
    cand = a.join(
        b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    if shuffle_width:
        cand = cand.repartition(
            shuffle_width, F.col("a.doc_id"), F.col("b.doc_id")
        )
    dot = (
        cand
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(fxsum(F.col("a.score") * F.col("b.score")).alias("dp"))
    )
    na = nrm.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("nb"))
    sim = F.col("dp") / (F.col("na") * F.col("nb"))
    return (
        dot.join(na, "a_id")
        .join(nb, "b_id")
        .filter(sim >= TFIDF_SIM_T)
        .select("a_id", "b_id", F.round(sim, 6).alias("cos_sim"))
    )


@register(
    "tfidf_cosine_pairs",
    oracle=f"""
        WITH {_TFIDF_VEC0_CTES},
        vec AS (SELECT * FROM vec0),
        {_TFIDF_PAIRS_SQL}
    """,
    tags=("ext-text", "ext-dedup"),
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector cosine near-dup: document pairs whose truncated
    tf-idf vectors (TFIDF_VEC_K top terms each, BM25-style rational idf —
    see tfidf_top_terms for why no logarithm) have cosine ≥ TFIDF_SIM_T.
    The lexical-overlap tier BETWEEN shingle Jaccard (surface n-grams)
    and embedding cosine (dense semantics): robust to reordering and
    length, cheap enough to run corpus-wide, no model required.

    Scale: the candidate join is a bucket equi-join on shared TOP terms
    only — truncation keeps the Zipf head out of the vectors, so
    candidate volume is Σ df_top², not Σ df² (same pruning idea as the
    PPJoin prefix). Dot products and norms go through the ADC
    fixed-point form (sum of round(x·1e9) longs) so the cosine — and the
    hash — is bit-identical across engines. One token pass feeds tf; df
    aggregates from tf; everything downstream is aggregate-sized. The
    vector builder and the pair arithmetic are shared with
    tfidf_cosine_capped (one definition each, Spark and SQL).

    r9: the candidate join sits behind the SAME measured-mass dispatch
    discipline as the shingle family (dedup._sparse_plan_for /
    _retier_capped): one aggregate over the cached vector table probes
    Σ dt(dt−1)/2 — the EXACT candidate row count the self-join will
    generate — before either plan runs. Inside the session's exchange
    budget → the stock plan (byte-identical, the driver-checked metric);
    crossing the session width → the same plan at an explicit mass-∝
    width; crossing MAX_CANDJOIN_WIDTH (~10B candidate rows — a merely-
    hot topical term at df_top ~1% of 10⁹ docs already generates 10¹⁰
    pairs) → the df_top-capped metric (tfidf_cosine_capped's registered
    pipeline, logged + recorded in LAST_TFIDF_DISPATCH; same
    semantics-change-at-the-design-boundary rationale as
    dedup._retier_capped). The ×10 stress row that motivated this
    (1.62× vs linear, r8) ran the stock plan at starved width."""
    return _tfidf_pairs_dispatch(spark, sf_dir)


def _tfidf_pairs_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-then-dispatch for the tfidf-cosine candidate join — the
    tfidf mirror of dedup._sparse_plan_for's corpus-mass branch. The
    constants are REUSED from dedup (CAND_ROWS_PER_PARTITION,
    MAX_CANDJOIN_WIDTH): a candidate row here is the same ~24 bytes of
    (a_id, b_id, partial sum) through the same sort/hash machinery, so
    the spill boundary is the same."""
    import logging
    import math

    from .dedup import CAND_ROWS_PER_PARTITION, MAX_CANDJOIN_WIDTH

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    vec0 = _tfidf_vec0(spark, sf_dir, docs=docs).persist()
    vec0.count()  # the probe + every dispatch target read it
    cand_rows = (
        vec0.groupBy("term")
        .agg(F.count("*").alias("dt"))
        .agg(F.sum(F.col("dt") * (F.col("dt") - 1) / 2).alias("m"))
        .collect()[0]["m"]
        or 0
    )
    LAST_TFIDF_DISPATCH.clear()
    LAST_TFIDF_DISPATCH.update(
        {"cand_rows": cand_rows, "width": None, "capped": False}
    )
    mass_width = math.ceil(cand_rows / CAND_ROWS_PER_PARTITION)
    if mass_width > MAX_CANDJOIN_WIDTH:
        # past the exchange-width budget: dispatch to the df_top-capped
        # metric — the registered tfidf_cosine_capped pipeline, results
        # pinned identical in tests/test_corpus_pipeline.py::
        # test_tfidf_dispatch_mass_probe_and_forced_cap
        LAST_TFIDF_DISPATCH.update({"capped": True})
        logging.getLogger(__name__).warning(
            "tfidf-cosine candidate mass %.2g rows wants %d partitions "
            "(> %d max) — dispatching to the df_top-capped metric "
            "(decision recorded in LAST_TFIDF_DISPATCH)",
            cand_rows,
            mass_width,
            MAX_CANDJOIN_WIDTH,
        )
        out = _cosine_pairs_from(_capped_vec_from(vec0, n))
        # the probe was this cache's consumer; _cosine_pairs_from keeps
        # its OWN derived cache, so holding vec0 too would leak two full
        # vector-table copies per dispatch (the _retier_capped fix's
        # class) — release it and accept the bounded recompute
        vec0.unpersist()
        return out
    try:
        session_width = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except (ValueError, TypeError):
        session_width = 200
    if mass_width > session_width:
        # same clamp as dedup's dispatch: the capped-tier branch above
        # already handled mass past MAX width, but a forced/probe-skewed
        # path must never ask the scheduler for an unbounded partition
        # count
        width = min(MAX_CANDJOIN_WIDTH, mass_width)
        LAST_TFIDF_DISPATCH["width"] = width
        out = _cosine_pairs_from(vec0, shuffle_width=width)
        # the width branch re-caches a term-repartitioned copy inside
        # _cosine_pairs_from — drop the original (see the capped branch)
        vec0.unpersist()
        return out
    return _cosine_pairs_from(vec0)


def _capped_vec_from(vec0: DataFrame, n: DataFrame) -> DataFrame:
    """The df_top cap applied to a top-K vector table — the shared back
    half of tfidf_cosine_capped and the mass dispatch (ONE definition of
    the capped metric's vector table; the plan-shape rationale — window
    census, repartition to undo the term layout — lives on
    tfidf_cosine_capped's docstring)."""
    return (
        vec0.withColumn("dt", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("dt")
            <= F.greatest(F.lit(2), F.floor(F.col("n_docs") / TFIDF_DF_CAP_DIVISOR))
        )
        .select("doc_id", "term", "score")
        .repartition("doc_id")
    )


@register(
    "corpus_prep_stats",
    oracle=f"""
        WITH quality AS (
            SELECT doc_id, lang, text, n_chars, n_tokens
            FROM (
                SELECT doc_id, lang, text, n_chars,
                       CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
                       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                           / length(text) AS alpha_ratio
                FROM documents
                WHERE length(text) > 0
            )
            WHERE n_chars BETWEEN 120 AND 400
              AND n_tokens >= 20
              AND alpha_ratio > 0.7
        ),
        keepers AS (
            SELECT MIN(doc_id) AS keeper_id
            FROM quality
            GROUP BY md5({_NORM_SQL})
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / COUNT(n_chars)
                    AS DOUBLE) AS avg_chars
        FROM quality JOIN keepers ON doc_id = keeper_id
        GROUP BY lang
    """,
    tags=("ext-text", "ext-dedup", "pipeline"),
)
def corpus_prep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation in ONE plan: quality gate (C4/Gopher
    heuristics: length band, token floor, alphabetic ratio) → exact dedup
    on the normalized-content hash → per-language doc/token/length stats.
    The composite every training-data pipeline runs before tokenization,
    expressed so Catalyst sees the whole flow at once.

    Physical shape: the gate is pure scan-side Column algebra (no shuffle);
    dedup keeps min(doc_id) per fingerprint via a window over the
    fingerprint partitioning — one shuffle, no aggregate-and-join-back,
    and the oracle's join-back form proves the rewrite equivalent; the
    final stats shuffle |survivors| rows to |langs| groups. Tokens are
    counted once in the gate and reused for the total — the text is never
    re-tokenized downstream."""
    from ..functions.numeric import davg

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens, alpha_ratio = quality_signals("text")
    quality = docs.select(
        "doc_id", "lang", "n_chars",
        n_tokens.alias("n_tokens"),
        F.md5(normalize_ws("text")).alias("fingerprint"),
        alpha_ratio.alias("alpha_ratio"),
    ).filter(quality_ok("n_chars", F.col("n_tokens"), F.col("alpha_ratio")))
    survivors = quality.withColumn(
        "keeper_id", F.min("doc_id").over(Window.partitionBy("fingerprint"))
    ).filter(F.col("doc_id") == F.col("keeper_id"))
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        davg("n_chars").alias("avg_chars"),
    )


@register(
    "dataset_split_assign",
    oracle="""
        WITH assigned AS (
            SELECT lang, n_chars,
                   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80
                            THEN 'train'
                        WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 90
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT lang, split, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM assigned
        GROUP BY lang, split
    """,
    tags=("ext-text", "pipeline"),
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by hashing the
    document KEY — the training-data-pipeline idiom that keeps splits stable
    under re-runs, re-partitioning, and incremental appends, where
    df.randomSplit does not (it reseeds per partition layout). Hashing the
    id rather than content also keeps exact/near duplicates from straddling
    splits only when dedup ran first — the pipeline composes as
    corpus_prep → split.

    Scale shape: pure scan-side Column algebra plus one |langs×3|-group
    aggregate; no shuffle of document rows, no Python. The md5-prefix bucket
    (first 4 hex chars % 100) is engine-portable, so DuckDB reproduces the
    assignment bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("bigint")
        % 100
    )
    assigned = docs.select(
        "lang",
        "n_chars",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "sequence_pack",
    oracle=f"""
        WITH toks AS (
            SELECT lang, doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        binned AS (
            SELECT lang, doc_id // 200 AS shard, n_tokens,
                   CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY lang, doc_id // 200
                                   ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 4096)
                        AS BIGINT) AS bin_id
            FROM toks
        )
        SELECT lang, CAST(shard AS BIGINT) AS shard, bin_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM binned
        GROUP BY lang, shard, bin_id
    """,
    tags=("ext-text", "pipeline"),
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to contiguous fixed-token-budget
    bins (4096 tokens) — the pre-tokenization step that turns a ragged
    corpus into dense training batches. A doc lands in the bin where the
    running token total before it falls, so bin boundaries are
    deterministic and independent of physical partitioning.

    The window partitions by (lang, shard = doc_id div 200), NOT by lang
    alone: packing only needs contiguity, never a global order, and a
    per-lang window caps parallelism at |languages| — with 5 languages and
    100 TB that serializes five tasks. Sharding makes parallelism
    |langs × shards| and costs at most one partially-filled bin per shard
    (bounded waste: shard_size/4096 bins per shard, one possibly short).
    The classic greedy first-fit packer is inherently sequential; this
    running-sum formulation is its order-preserving distributable form.

    Plan: ONE shuffle (hash by the window keys), cumulative sum
    sorted-within-partition, and the per-bin rollup reuses the window's
    partitioning — no second exchange (plan-asserted)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "doc_id",
        F.expr("doc_id div 200").alias("shard"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("lang", "shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    binned = toks.select(
        "lang",
        "shard",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double") / 4096)
        .cast("bigint")
        .alias("bin_id"),
    )
    return binned.groupBy("lang", "shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


@register(
    "corpus_mix_resample",
    oracle=f"""
        WITH weighted AS (
            SELECT lang,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   CASE WHEN lang = 'en' THEN 2.5 ELSE 1.25 END AS w,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000
                       AS bucket
            FROM documents
        ),
        repeated AS (
            SELECT lang, n_tokens,
                   CAST(FLOOR(w) AS INT)
                   + CASE WHEN bucket < (w - FLOOR(w)) * 10000 THEN 1 ELSE 0 END
                       AS n_rep
            FROM weighted
        )
        SELECT lang,
               COUNT(*) AS n_docs_out,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens_out
        FROM repeated, LATERAL unnest(generate_series(1, n_rep))
        GROUP BY lang
    """,
    tags=("ext-text", "pipeline"),
)
def corpus_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: upsample each language to its target mixture
    weight (en×2.5, others×1.25 here) — how a training run hits a data
    recipe when sources differ in size. Fractional weights are realized
    deterministically: every doc repeats floor(w) times, plus once more iff
    its key's md5 bucket falls below the fractional part — so the expected
    multiplicity is exactly w, the outcome is stable across re-runs and
    partitionings (unlike rand()-based sampling), and DuckDB reproduces it
    bit-for-bit.

    Plan: repeat-count is scan-side Column algebra; the repetition is one
    explode(sequence(1, n_rep)) — rows fan out map-side with no shuffle
    until the |langs|-group rollup. At 100 TB the explode feeds the writer
    directly; nothing ever materializes the upsampled corpus in memory."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.when(F.col("lang") == "en", F.lit(2.5)).otherwise(F.lit(1.25))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("bigint")
        % 10000
    )
    n_rep = (
        F.floor(w).cast("int")
        + F.when(bucket < (w - F.floor(w)) * 10000, F.lit(1)).otherwise(F.lit(0))
    )
    repeated = docs.select(
        "lang",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.explode(F.sequence(F.lit(1), n_rep)).alias("rep"),
    )
    return repeated.groupBy("lang").agg(
        F.count("*").alias("n_docs_out"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens_out"),
    )


@register(
    "quality_percentile_gate",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                       / length(text) AS score
            FROM documents
            WHERE length(text) > 0
        ),
        ranked AS (
            SELECT lang, score,
                   percent_rank() OVER (PARTITION BY lang ORDER BY score, doc_id) AS pr
            FROM scored
        )
        SELECT lang,
               COUNT(*) AS n_kept,
               MIN(score) AS min_kept_score
        FROM ranked
        WHERE pr >= 0.1
        GROUP BY lang
    """,
    tags=("ext-text", "pipeline"),
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-relative quality gate: drop the bottom decile of docs
    per language by alphabetic-ratio score — the Gopher-style practice of
    cutting by a corpus-relative threshold instead of a fixed constant
    (fixed thresholds mis-gate languages whose score distributions differ).

    percent_rank needs the per-lang ordering, so the plan is one shuffle on
    lang + a sort within partitions; doc_id in the ORDER BY makes ranks of
    tied scores deterministic on both engines. Same |langs|-bounded
    parallelism caveat as packing — at 100 TB replace the exact
    percent_rank with approxQuantile per lang (one aggregate, no global
    sort) and gate on the quantile value; that refinement is REGISTERED
    as quality_gate_bucketed (rank-guarantee contract), and this exact
    form remains its ground truth."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    score = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
        / F.length("text")
    )
    scored = docs.select("doc_id", "lang", score.alias("score"))
    ranked = scored.select(
        "lang",
        "score",
        F.percent_rank()
        .over(Window.partitionBy("lang").orderBy("score", "doc_id"))
        .alias("pr"),
    )
    return (
        ranked.filter(F.col("pr") >= 0.1)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.min("score").alias("min_kept_score"))
    )


@register(
    "doc_chunk_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t, len({_TOKS_SQL}) AS n
            FROM documents
        ),
        chunked AS (
            SELECT doc_id, n,
                   CAST(unnest(range(0, CASE WHEN n <= 64 THEN 1
                                             ELSE CAST(CEIL(CAST(n - 64 AS DOUBLE) / 48) AS INT) + 1
                                        END)) AS INT) AS chunk_id,
                   t
            FROM toks
        )
        SELECT doc_id, chunk_id,
               CAST(len(list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS INT)
                   AS chunk_len,
               md5(array_to_string(list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64), ' '))
                   AS chunk_md5
        FROM chunked
    """,
    tags=("ext-text", "pipeline"),
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, stride 48 →
    16-token overlap) — how long documents become model-sized contexts for
    training or retrieval. One row in, ceil((n-64)/48)+1 rows out, with the
    final short tail kept.

    All JVM-side: the token array materializes once per doc, chunk indices
    come from explode(sequence(...)) sized by arithmetic on the token
    count (a UDTF-shaped op without a Python UDTF), and each chunk is a
    slice of the SAME array — no re-tokenization per chunk, no shuffle at
    all until a downstream aggregate. The md5 of each chunk's joined text
    lets the oracle verify chunk CONTENT, not just counts, bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t")).withColumn("n", F.size("t"))
    n_chunks = F.when(F.col("n") <= 64, F.lit(1)).otherwise(
        F.ceil((F.col("n") - 64).cast("double") / 48).cast("int") + 1
    )
    chunked = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(F.col("t"), F.col("chunk_id") * 48 + 1, 64)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "stratified_sample",
    oracle="""
        WITH counts AS (
            SELECT lang, COUNT(*) AS cnt FROM documents
            WHERE lang IS NOT NULL GROUP BY lang
        ),
        t AS (SELECT MIN(cnt) AS target FROM counts)
        SELECT d.doc_id, d.lang
        FROM documents d
        JOIN counts c ON d.lang = c.lang
        CROSS JOIN t
        WHERE ('0x' || substr(md5('samp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              * c.cnt < t.target * 4294967296
    """,
    tags=("ext-corpus",),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (language-balancing) sample: every language
    is downsampled toward the rarest language's size, the standard rebalance
    before corpus mixing. A doc survives iff
    u(doc) < target / cnt(lang), with u a 32-bit md5-derived uniform —
    compared in INTEGER form (h·cnt < target·2³²) so neither engine does a
    float division; sampling is reproducible row-local state, never rand().

    Plan shape: the per-lang counts are one aggregate-sized collect (the
    strata table is |langs| rows — driver-side control flow over a tiny
    aggregate, like the dedup regime probe) inlined as a literal map, so
    the sampled scan is ONE pass with a pure filter: no join, no exchange,
    no second read of the fact table. At 100 TB sampling must be a
    scan-side predicate, not a shuffle; for a strata column too wide for a
    literal map, the same compare rides a broadcast join instead. h·cnt
    stays far inside int64 up to ~10⁹ docs per language; past that,
    promote the compare to DECIMAL. NULL-lang docs are excluded up front
    (a null literal map key is illegal, and the oracle's inner join drops
    them anyway — untagged docs are not a stratum)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    strata = docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    if not strata:
        # empty corpus: no strata, nothing to sample (oracle joins against
        # an empty strata CTE and returns the same empty frame)
        return docs.select("doc_id", "lang").limit(0)
    target = min(r["cnt"] for r in strata)
    cnt_map = F.create_map(
        *[F.lit(x) for r in strata for x in (r["lang"], r["cnt"])]
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        docs.filter(h * cnt_map[F.col("lang")].cast("bigint") < F.lit(target * 4294967296))
        .select("doc_id", "lang")
    )


# the one word-bigram recipe — shared with every dedup oracle so the
# cross-engine twin definition cannot drift between modules
from .dedup import _BIGRAMS_SQL as _BIGRAMS_LIST_SQL  # noqa: E402


@register(
    "repetition_ngram_ratio",
    oracle=f"""
        WITH b AS (SELECT doc_id, {_BIGRAMS_LIST_SQL} AS bg FROM documents)
        SELECT doc_id,
               CAST(len(bg) AS INT) AS n_bigrams,
               CAST(len(list_distinct(bg)) AS INT) AS n_distinct,
               CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dup_ratio
        FROM b WHERE len(bg) >= 1
    """,
    tags=("ext-quality",),
)
def repetition_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram fraction per document — the repetition signal of
    the Gopher/MassiveText quality rules (duplicated n-grams mark
    boilerplate, keyword stuffing, and decoding loops; docs above ~0.2
    are dropped or down-weighted before training).

    Scale shape: pure scan-side Column algebra — the word-bigram array is
    materialized once per row and both counts come from ``size`` /
    ``array_distinct`` on it, so there is NO explode, NO shuffle, and the
    signal costs one codegen'd pass over the scan (same tier as
    doc_quality_filter). The dup_ratio division is bigint→double in both
    engines — bit-identical. Docs with <2 tokens have no bigrams and are
    excluded (their ratio is undefined), matching the oracle's len>=1
    guard."""
    from .dedup import _bigrams

    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array BEFORE the bigram lambda touches it —
    # expressions inlined into a HOF lambda re-evaluate per element
    # (see _bigrams' docstring; O(len) vs O(len²) per row)
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    # the short-doc guard must be this CHEAP EQUIVALENT (n_bigrams >= 1 ⇔
    # size(toks) >= 2), placed before the bigram projection: a filter on
    # size(bg) pushes below the projections with the WHOLE pipeline
    # inlined, and the tokenizing split() then re-evaluates per bigram
    # element inside the filter — O(len²) regexp per row (measured 9.2 s
    # → 0.6 s at sf0.1 for this one predicate swap)
    b = toks.filter(F.size("toks") >= 2).select(
        "doc_id", _bigrams("toks").alias("bg")
    )
    n_all = F.size("bg")
    n_distinct = F.size(F.array_distinct("bg"))
    return (
        b
        .select(
            "doc_id",
            n_all.alias("n_bigrams"),
            n_distinct.alias("n_distinct"),
            ((n_all - n_distinct).cast("double") / n_all).alias("dup_ratio"),
        )
    )


@register(
    "bigram_lm_table",
    oracle=f"""
        WITH toks AS (SELECT {_TOKS_SQL} AS t FROM documents),
        pairs AS (
            SELECT t[i] AS w1, t[i + 1] AS w2
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
        ),
        c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1)
        SELECT c12.w1, c12.w2, c12.c12,
               round(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE), 6) AS cond_p
        FROM c12 JOIN c1 USING (w1)
    """,
    tags=("ext-text",),
)
def bigram_lm_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language model: P(w2 | w1) = c(w1,w2) / c(w1,·)
    over NON-distinct adjacent token pairs — the n-gram-LM training table
    (KenLM-style counts before smoothing) that powers perplexity-based
    quality filtering of training corpora (the CCNet/Gopher recipe).

    Plan: adjacent pairs come from zipping the token array with its own
    tail (two slices + arrays_zip — narrow row-local algebra, no
    positional window), then ONE hash aggregate on (w1, w2); the
    continuation counts c(w1,·) are re-aggregated from the (w1, w2) counts
    — |bigram types| rows, NOT a second pass over the corpus — and joined
    back. Both sides are integer counts; the conditional probability is
    one exact integer-valued double division, identical in both engines.

    At 100 TB the shape is the canonical n-gram count pipeline:
    the pair aggregate map-side combines to |bigram types| rows per
    partition, the c1 re-aggregation and join shuffle only the (typically
    million-scale) model table, and the corpus is read exactly once.
    Higher orders (trigram+) are the same two aggregates with a wider
    zip."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("t"))
    # adjacent (non-distinct) pairs: zip t[1..n-1] with t[2..n]
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("w1"),
                    F.slice("t", 2, F.size("t") - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    cond_p = F.round(F.col("c12").cast("double") / F.col("c1").cast("double"), 6)
    return c12.join(c1, "w1").select("w1", "w2", "c12", cond_p.alias("cond_p"))


@register(
    "unigram_logprob_score",
    oracle=f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents),
        cw AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cw),
        scored AS (
            SELECT t.doc_id,
                   round(ln(CAST(cw.c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 6) AS lp
            FROM tok t JOIN cw USING (w) CROSS JOIN tot
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               round(CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
                   AS avg_logp
        FROM scored GROUP BY doc_id
    """,
    tags=("ext-text",),
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: each document's mean token log-probability
    under the corpus's own unigram distribution — the cheapest member of
    the perplexity-filter family (documents full of out-of-distribution
    tokens score low; boilerplate scores suspiciously high; both tails get
    reviewed). Two passes: train (count every token once) and score (join
    the model back and average per doc).

    Float discipline: ln() is NOT an IEEE-exact operation, so each token's
    log-prob is rounded to 6 decimals FIRST (the argument c/N is one exact
    double division, bit-identical across engines, and a last-ulp ln()
    divergence survives the round only if the true value sits within
    ~1e-16 of a rounding boundary — checked empirically across all sf
    dirs); the per-doc mean then runs through the fixed-point sum
    (functions/numeric.py) so aggregation order cannot reorder doubles.

    At 100 TB: the model is |vocab| rows (map-side combined), broadcasts
    back against the token stream, and the per-doc mean map-side combines
    to |docs| rows — corpus read twice, shuffled never. In production the
    'train' pass runs on a held-out slice and the model table is reused
    across scoring runs."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    cw = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = cw.agg(F.sum("c").alias("n"))
    lp = F.round(F.log(F.col("c").cast("double") / F.col("n").cast("double")), 6)
    scored = (
        tok.join(F.broadcast(cw), "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
    )
    from ..functions.numeric import davg

    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.round(davg("lp"), 6).alias("avg_logp")
    )


def _cat_profile_sql(col: str) -> str:
    return f"""
        SELECT '{col}' AS column_name,
               COUNT(*) AS n_distinct,
               round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_share,
               round(1.0 - CAST(SUM(CAST(
                       (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                       * (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS gini
        FROM (
            SELECT {col} AS v, COUNT(*) AS c FROM documents GROUP BY {col}
        ), (SELECT COUNT(*) AS tot FROM documents)
    """


@register(
    "categorical_profile",
    oracle=" UNION ALL ".join(_cat_profile_sql(c) for c in ("lang", "source")),
    tags=("ext-profile",),
)
def categorical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-column profiling: distinct-value count, modal share, and
    Gini impurity (1 − Σ p²) per column — table_profile's companion for
    LOW-cardinality columns, where the interesting signal is the shape of
    the distribution, not the NDV (a stratification key with top_share
    0.99 will starve 99% of strata; Gini near 0 means the column carries
    no mixing signal).

    Gini instead of Shannon entropy is a deliberate portability choice:
    entropy needs ln() (not IEEE-exact — see unigram_logprob_score's
    mitigation), while Gini is built ONLY from exactly-rounded operations
    (integer-ratio divisions, one multiply) plus the fixed-point sum over
    the per-value squares — bit-identical across engines with no empirical
    caveat.

    Plan: one hash aggregate per column (|distinct| rows), a broadcast
    scalar for the total, and an aggregate over the counts — per column,
    one corpus scan that map-side combines; the final frame is
    |columns| rows. At 100 TB this is the profiling pass a pipeline runs
    per ingest batch, and each column's scan shares the same file read via
    column pruning."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()  # aggregate-sized control scalar (one job, reused per column)
    frames = []
    for col in ("lang", "source"):
        counts = docs.groupBy(col).agg(F.count("*").alias("c"))
        p = F.col("c").cast("double") / F.lit(float(total))
        sq = F.round(p * p * F.lit(10.0**12)).cast("bigint")
        frames.append(
            counts.agg(
                F.lit(col).alias("column_name"),
                F.count("*").alias("n_distinct"),
                F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
                    "top_share"
                ),
                F.round(
                    F.lit(1.0) - (F.sum(sq).cast("double") / F.lit(10.0**12)), 6
                ).alias("gini"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


BPE_STEPS = 3


def _bpe_step_sql(i: int) -> str:
    """One unrolled BPE iteration for the oracle: weighted pair counts →
    deterministic top pair → greedy-left merge expressed set-based (merge
    flags alternate within runs of consecutive matches — the windowed
    equivalent of the Spark side's left-to-right fold).

    ``e{i}`` joins the (≤1-row) top-pair CTE with LEFT JOIN .. ON true,
    NOT a cross join: when the merge supply dries up before the last step
    (t{i} empty), a cross join would erase every word and the encoder's
    final vocab read would return zero rows while the Spark loop breaks
    and keeps the last state — the LEFT JOIN makes an exhausted step a
    no-op (m = false everywhere), matching the break on both halves."""
    prev = f"w{i - 1}"
    return f"""
p{i} AS (
    SELECT syms[k] AS left_sym, syms[k + 1] AS right_sym, cnt
    FROM {prev}, LATERAL (SELECT unnest(range(1, len(syms))) AS k) rk
),
t{i} AS (
    SELECT left_sym, right_sym, CAST(SUM(cnt) AS BIGINT) AS c
    FROM p{i} GROUP BY left_sym, right_sym
    ORDER BY c DESC, left_sym, right_sym LIMIT 1
),
e{i} AS (
    SELECT w.word, w.cnt, u.pos, u.sym,
           COALESCE((u.sym = t.left_sym
                     AND LEAD(u.sym) OVER (PARTITION BY w.word ORDER BY u.pos) = t.right_sym),
                    false) AS m,
           t.left_sym || t.right_sym AS merged
    FROM {prev} w LEFT JOIN t{i} t ON true,
         LATERAL (SELECT unnest(w.syms) AS sym, generate_subscripts(w.syms, 1) AS pos) u
),
fa{i} AS (
    SELECT word, cnt, pos, sym, merged, m,
           pos - ROW_NUMBER() OVER (PARTITION BY word, m ORDER BY pos) AS grp
    FROM e{i}
),
fb{i} AS (
    SELECT word, cnt, pos, sym, merged,
           (m AND (ROW_NUMBER() OVER (PARTITION BY word, m, grp ORDER BY pos) % 2 = 1)) AS flag
    FROM fa{i}
),
g{i} AS (
    SELECT word, cnt, pos,
           CASE WHEN flag THEN merged ELSE sym END AS sym,
           COALESCE(LAG(flag) OVER (PARTITION BY word ORDER BY pos), false) AS dropped
    FROM fb{i}
),
w{i} AS (
    SELECT word, cnt, list(sym ORDER BY pos) AS syms
    FROM g{i} WHERE NOT dropped GROUP BY word, cnt
)"""


def _bpe_oracle(n_steps: int) -> str:
    steps = "".join("," + _bpe_step_sql(i) for i in range(1, n_steps + 1))
    selects = "\nUNION ALL ".join(
        f"SELECT {i} AS step, left_sym, right_sym, c AS pair_count FROM t{i}"
        for i in range(1, n_steps + 1)
    )
    return f"""
        WITH wtab AS (
            SELECT w AS word, COUNT(*) AS cnt
            FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents) GROUP BY w
        ),
        w0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS syms FROM wtab)
        {steps}
        {selects}
    """


@register("bpe_train_merges", oracle=_bpe_oracle(BPE_STEPS), tags=("ext-text",))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding tokenizer training, the real merge loop (Sennrich
    et al. 2016): start from characters, repeatedly (1) count adjacent
    symbol pairs weighted by word frequency, (2) adopt the most frequent
    pair as a merge rule (ties broken lexicographically — deterministic),
    (3) apply the rule greedily left-to-right in every word. Output is the
    ordered merge table — the artifact a tokenizer ships.

    Plan per step: the pair count is explode → one partial-aggregated
    hash aggregate over the VOCABULARY table (|distinct words| rows — the
    corpus itself is read once, up front, to build word counts); the
    argmax is a TakeOrdered over |pair types| rows; the chosen pair is an
    aggregate-sized control scalar collected to the driver (the same
    pattern as the merge high-water mark); the merge itself is a row-local
    array fold (F.aggregate) — no shuffle, no UDF — and each step
    localCheckpoints like the other iterative plans (k-means, connected
    components) so the loop's lineage stays flat.

    The oracle replays the SAME algorithm with the merge expressed
    set-based (flags alternating inside runs of consecutive matches,
    windows partitioned per word) — two formulations of greedy-left,
    pinned equal; the fold side is additionally property-tested against a
    driver-side replay.

    At 100 TB: the word-count aggregate is the only corpus-scale job and
    map-side combines to |vocab| rows; every later step works on the
    vocabulary table (millions of rows, not billions), which is the same
    economy real BPE trainers exploit. More steps = same loop with the
    merge table growing one row per step."""
    rules, _w = _bpe_train(spark, sf_dir, BPE_STEPS)
    return spark.createDataFrame(
        rules, "step int, left_sym string, right_sym string, pair_count bigint"
    )


def _bpe_train(
    spark: SparkSession, sf_dir: str, n_steps: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared BPE merge loop: returns (merge rules, final vocabulary state
    (word, cnt, syms)). cnt rides INSIDE the checkpointed frame, so the
    corpus is read exactly once (the word-count aggregate) no matter how
    many steps run — both registered halves (train, encode) call this.
    An exhausted step (no adjacent pairs anywhere) stops the loop and
    keeps the last state, which the oracle's LEFT JOIN step mirrors."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    w = words.select(
        "word", "cnt", F.expr("regexp_extract_all(word, '.', 0)").alias("syms")
    ).localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, int]] = []
    for step in range(1, n_steps + 1):
        pairs = (
            w.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda k: F.struct(
                            F.element_at("syms", k).alias("l"),
                            F.element_at("syms", k + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "cnt")
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .first()
        )
        if top is None:
            break
        a, b = top["l"], top["r"]
        rules.append((step, a, b, int(top["c"])))
        w = w.select(
            "word", "cnt", _bpe_merge_fold("syms", a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return rules, w


def _bpe_merge_fold(col, a: str, b: str):
    """THE greedy left-to-right merge fold — the one expression whose
    byte-identity underwrites every BPE contract in the module (train ==
    oracle window formulation == frozen-rule apply). A closure factory,
    not a default-arg lambda: pyspark rejects HOF lambdas whose signature
    carries extra (defaulted) parameters."""
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


#: Shared by bpe_encode_token_count and bpe_apply_frozen: the frozen-rule
#: apply must reproduce the trained encoder exactly, so both keys check
#: against the SAME train+apply CTE chain.
_BPE_ENCODE_ORACLE = f"""
        WITH wtab AS (
            SELECT w AS word, COUNT(*) AS cnt
            FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents) GROUP BY w
        ),
        w0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS syms FROM wtab)
        {"".join("," + _bpe_step_sql(i) for i in range(1, BPE_STEPS + 1))},
        tok AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
        )
        SELECT t.doc_id,
               CAST(SUM(len(w.syms)) AS BIGINT) AS n_bpe_tokens
        FROM tok t JOIN w{BPE_STEPS} w USING (word)
        GROUP BY t.doc_id
    """


@register(
    "bpe_encode_token_count",
    oracle=_BPE_ENCODE_ORACLE,
    tags=("ext-text",),
)
def bpe_encode_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the tokenizer roundtrip: encode every document
    under the BPE_STEPS-merge vocabulary bpe_train_merges learns and count
    its tokens — the number that actually prices a training run (token
    budgets, packing, billing are all denominated in post-merge tokens,
    not whitespace words; bpe_token_estimate is the cheap proxy, this is
    the real count).

    Plan: train exactly as bpe_train_merges (vocabulary-table loop, one
    corpus scan for word counts), then SKIP re-tokenizing the corpus —
    each word's post-merge symbol count joins back to the (doc_id, word)
    token stream by word and sums per doc. The encode join is broadcast
    (|vocab| rows carrying one int each); the per-doc sum map-side
    combines. The oracle replays train and apply in one CTE chain.

    At 100 TB the economics are the same as the trainer's: the corpus is
    scanned twice total (word counts, token stream), everything else is
    vocabulary-sized. New corpora encode against a FROZEN merge table by
    starting the fold from the shipped rules instead of re-training."""
    _rules, w = _bpe_train(spark, sf_dir, BPE_STEPS)
    vocab_len = F.broadcast(w.select("word", F.size("syms").alias("n_syms")))
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    return (
        tok.join(vocab_len, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"))
    )


def bpe_apply_rules(
    docs: DataFrame, rules: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Encode documents against a FROZEN merge table — the serving path
    the encoder's docstring promises: no training pass, just the shipped
    rules applied in order. Returns (doc_id, n_bpe_tokens).

    The fold runs over each document's DISTINCT words once (a vocabulary
    projection of the batch, not the token stream), then joins the
    per-word symbol count back — the same economy as training. Rules are
    inlined as literals; a production merge table of 50k rules would
    instead drive a chain fold generated once per job (the rule list is a
    broadcast-sized artifact either way).

    Unlike the registered pair, this is a pure-API operator: its
    correctness is pinned by equivalence to bpe_encode_token_count when
    given that query's own trained rules (tested), which is exactly the
    frozen-vocab contract — train once, apply anywhere."""
    toks = docs.select("doc_id", tokens(text_col).alias("t"))
    vocab = (
        toks.select(F.explode("t").alias("word"))
        .distinct()
        .select("word", F.expr("regexp_extract_all(word, '.', 0)").alias("syms"))
    )
    syms = F.col("syms")
    for a, b in rules:
        syms = _bpe_merge_fold(syms, a, b)
    vocab_len = F.broadcast(vocab.select("word", F.size(syms).alias("n_syms")))
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("word"))
    return (
        tok.join(vocab_len, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"))
    )


@register(
    "bpe_apply_frozen",
    oracle=_BPE_ENCODE_ORACLE,
    tags=("ext-text", "replay"),
)
def bpe_apply_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible key for the frozen-vocab serving path: train the
    BPE_STEPS merge table once (driver holds the vocabulary-sized rule
    list), then encode the corpus through ``bpe_apply_rules`` — NO
    training state in the apply plan. The oracle is the trained encoder's
    own train+apply chain, so a hash match proves the frozen-rule fold is
    byte-identical to training-then-encoding (the train-once / apply-
    anywhere contract)."""
    trained_rules, _w = _bpe_train(spark, sf_dir, BPE_STEPS)
    rules = [(a, b) for (_step, a, b, _cnt) in trained_rules]
    docs = load_table(spark, sf_dir, "documents")
    return bpe_apply_rules(docs, rules)


# --- Boilerplate span detection -----------------------------------------------

#: Span width and the document-frequency floor that makes a span
#: "boilerplate". 5 tokens is the classic shingle width for template
#: detection; 3 distinct docs is the floor that separates shared
#: template text from coincidental collocations on this corpus
#: (measured at sf0.01: 74 spans at ≥3 docs vs 1096 at ≥2). The values
#: live in functions/text.py (re-exported here) so the corpus API stage
#: shares them without importing the plans package.

_5GRAMS_SQL = (
    f"list_transform(generate_series(1, len({_TOKS_SQL}) - {BOILER_NGRAM - 1}), "
    f"i -> " + " || ' ' || ".join(f"{_TOKS_SQL}[i+{k}]" for k in range(BOILER_NGRAM)) + ")"
)


def _five_grams(toks_col):
    """Token 5-gram array (positions overlap; NOT distinct — the share
    query counts positions). Mirrors _5GRAMS_SQL; one gram definition
    repo-wide (functions.text.token_ngrams)."""
    return token_ngrams(toks_col, BOILER_NGRAM)


@register(
    "boilerplate_ngrams",
    oracle=f"""
        WITH g AS (SELECT doc_id, unnest({_5GRAMS_SQL}) AS gram FROM documents)
        SELECT gram,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences
        FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    """,
    tags=("ext-text", "pipeline"),
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate span detector: token 5-grams appearing in ≥
    BOILER_MIN_DOCS distinct documents — headers, footers, license
    blurbs, navigation text. The spans a cleaning pass strips BEFORE
    dedup and quality scoring (boilerplate inflates both shingle overlap
    and repetition metrics).

    Plan: one tokenize pass, row-local 5-gram array, explode, one
    two-level aggregate (distinct docs + occurrences share the gram
    shuffle). At 100 TB the gram should be xxhash64-ed before the
    exchange exactly as the Jaccard family hashes shingles — kept as
    strings here because the gram VALUE is the product (you need to read
    the span to strip it)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    g = toks.select("doc_id", F.explode(_five_grams("toks")).alias("gram"))
    return (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
    )


@register(
    "doc_boilerplate_share",
    oracle=f"""
        WITH g AS (SELECT doc_id, unnest({_5GRAMS_SQL}) AS gram FROM documents),
        boiler AS (
            SELECT gram FROM g GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
        ),
        pos AS (SELECT doc_id, COUNT(*) AS n_positions FROM g GROUP BY doc_id),
        hit AS (
            SELECT g.doc_id, COUNT(*) AS n_boiler
            FROM g JOIN boiler USING (gram) GROUP BY g.doc_id
        )
        SELECT pos.doc_id, pos.n_positions,
               COALESCE(hit.n_boiler, 0) AS n_boiler,
               round(CAST(COALESCE(hit.n_boiler, 0) AS DOUBLE) / pos.n_positions,
                     6) AS boiler_share
        FROM pos LEFT JOIN hit ON pos.doc_id = hit.doc_id
    """,
    tags=("ext-text", "pipeline"),
)
def doc_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a document's
    5-gram positions covered by corpus-level boilerplate spans
    (boilerplate_ngrams' floor). The per-doc score a cleaning pass
    thresholds on — a doc that is MOSTLY template text gets dropped
    whole, one with a stray footer gets span-stripped. Documents shorter
    than the span width have no positions and are excluded (nothing to
    score).

    Plan: the exploded gram table is built once and persisted; the
    boilerplate set derives from it and joins back by gram (left semi
    would lose the count — it is a counting join), then one left join
    stitches the per-doc totals. Candidate volume is bounded by the
    boilerplate set's df, the same Σ df-shaped cost as the count-join
    family."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    g = toks.select("doc_id", F.explode(_five_grams("toks")).alias("gram")).persist()
    g.count()  # three readers: boiler set, positions, hits
    boiler = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("gram")
    )
    pos = g.groupBy("doc_id").agg(F.count("*").alias("n_positions"))
    hit = g.join(boiler, "gram").groupBy("doc_id").agg(F.count("*").alias("n_boiler"))
    share = F.round(
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double") / F.col("n_positions"), 6
    )
    return (
        pos.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_positions",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            share.alias("boiler_share"),
        )
    )


@register(
    "boilerplate_strip",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS token,
                   generate_subscripts({_TOKS_SQL}, 1) AS pos
            FROM documents
        ),
        g AS (
            SELECT doc_id, unnest({_5GRAMS_SQL}) AS gram,
                   generate_subscripts({_5GRAMS_SQL}, 1) AS p
            FROM documents
        ),
        boiler AS (
            SELECT gram FROM g GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
        ),
        flagged AS (SELECT g.doc_id, g.p FROM g JOIN boiler USING (gram)),
        covered AS (
            SELECT DISTINCT doc_id, p + u.o AS pos
            FROM flagged,
                 (SELECT unnest(generate_series(0, {BOILER_NGRAM - 1})) AS o) u
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.token
            FROM toks t
            LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
            WHERE c.doc_id IS NULL
        )
        SELECT doc_id,
               COUNT(*) AS n_kept,
               md5(string_agg(token, ' ' ORDER BY pos)) AS clean_md5
        FROM kept GROUP BY doc_id
    """,
    tags=("ext-text", "pipeline"),
)
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLICATION step of the boilerplate family: rewrite each
    document with every boilerplate-covered token removed — a token is
    covered when any flagged 5-gram (boilerplate_ngrams' corpus-level
    floor) starts at most BOILER_NGRAM−1 positions before it. Detection
    (boilerplate_ngrams) and scoring (doc_boilerplate_share) exist as
    registered keys; a cleaning pass has to actually EMIT the stripped
    text, and this key drives that plumbing end to end. The output hashes
    the cleaned text (md5 of the space-rejoined kept tokens, order
    preserved) instead of shipping it — engine-portable, and exactly what
    a content-addressed corpus store records after a cleaning pass.

    Plan, all JVM Column algebra: one materialized token-array scan feeds
    both position tables (tokens and 5-gram starts — posexplode each);
    the boilerplate set gates gram starts with a left-semi join (bounded
    by the template vocabulary in production — broadcastable — and
    AQE-sized here); coverage expands each flagged start with
    sequence(p, p+4) → explode → distinct (≤ 5 rows per flagged
    position, never text); kept tokens are a left-anti join on (doc_id,
    pos); the cleaned text reassembles per doc via
    array_sort(collect_list(struct(pos, token))) — the deterministic
    ordered-concat idiom — then md5. Docs with every token covered
    vanish from the output (nothing to store), same rule as the share
    query's short-doc exclusion."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks")).persist()
    toks.count()  # two posexplode readers: token positions + gram starts
    tok = toks.select("doc_id", F.posexplode("toks").alias("pos", "token"))
    g = toks.select("doc_id", F.posexplode(_five_grams("toks")).alias("p", "gram"))
    boiler = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("gram")
    )
    flagged = g.join(boiler, "gram", "left_semi")
    covered = flagged.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(BOILER_NGRAM - 1))).alias("pos"),
    ).distinct()
    kept = tok.join(covered, ["doc_id", "pos"], "left_anti")
    clean = F.md5(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
        )
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"), clean.alias("clean_md5")
    )


@register(
    "ngram_novelty_score",
    oracle=f"""
        WITH g AS (
            SELECT DISTINCT doc_id, unnest({_BIGRAMS_LIST_SQL}) AS bigram
            FROM documents
        ),
        firsts AS (SELECT bigram, MIN(doc_id) AS first_doc FROM g GROUP BY bigram)
        SELECT g.doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS novelty
        FROM g JOIN firsts f USING (bigram)
        GROUP BY g.doc_id
    """,
    tags=("ext-text", "pipeline"),
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    word-bigrams not seen in any earlier document (doc_id order standing
    in for ingest order — in production, the crawl timestamp). The
    data-curation dual of the dedup family: dedup asks "is this a copy of
    one document", novelty asks "how much of this document is new to the
    CORPUS" — the signal curriculum/mixture builders sort by (diminishing
    novelty ⇒ a source is mined out) and the cheap first-pass filter
    before pair-level dedup.

    Plan: one distinct per-doc gram table (the dedup family's shared
    shape), a vocabulary-bounded MIN aggregate for each gram's first
    document, and one gram-keyed join back — Σ df rows, the same cost
    class as the document-frequency census every tf-idf key already
    pays. No windows, no pair joins; at 100 TB the firsts table is the
    gram vocabulary (bounded), and an incremental ingest maintains it as
    a MERGE, exactly like the snapshot high-water mark. novelty divides
    identical doubles on both engines (IEEE-exact, hash-safe)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    g = toks.select(
        "doc_id", F.explode(F.array_distinct(token_ngrams("toks", 2))).alias("bigram")
    ).persist()
    g.count()  # two readers: the firsts aggregate and the join-back
    firsts = g.groupBy("bigram").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        g.join(firsts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel).cast("double") / F.count("*")).alias("novelty"),
        )
    )


@register(
    "dataset_card_stats",
    oracle=f"""
        WITH base AS (
            SELECT source, lang, n_chars,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   CASE WHEN length(text) = 0 THEN FALSE
                        ELSE n_chars BETWEEN 120 AND 400
                             AND len({_TOKS_SQL}) >= 20
                             AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                                      AS DOUBLE) / length(text) > 0.7
                   END AS q_ok,
                   COUNT(*) OVER (PARTITION BY md5({_NORM_SQL})) > 1 AS is_dup
            FROM documents
        )
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS dup_share,
               CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS quality_rate
        FROM base GROUP BY source, lang
    """,
    tags=("ext-text", "pipeline"),
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per (source, lang) cell — document count, total
    tokens, mean length, exact-duplicate share (fingerprint seen >1 time
    anywhere in the corpus, exact_dedup's md5-of-normalized-text), and
    the quality-gate pass rate (doc_quality_filter's predicate). The one
    table a data release publishes next to the corpus, and the first
    thing a curator reads when a source's survival rate looks wrong —
    composing the registered gates into the artifact they exist to feed.

    Plan: ONE scan of documents computes every per-doc signal as Column
    algebra (token count, quality booleans); the only shuffle before the
    final cell aggregate is the fingerprint window for the duplicate
    flag — hash-partitioned by md5, bounded groups (duplicate cliques),
    no skew hazard. All ratios divide exact integers as doubles
    (IEEE-exact, hash-safe); total_tokens sums BIGINTs. At 100 TB this
    is a single map-combined aggregate over cells numbering
    |sources|×|langs| — dashboard-sized."""
    docs = load_table(spark, sf_dir, "documents")
    nt, alpha_ratio = quality_signals("text")
    n_tokens = nt.cast("bigint")
    q_ok = F.when(F.length("text") == 0, F.lit(False)).otherwise(
        quality_ok("n_chars", nt, alpha_ratio)
    )
    is_dup = F.count("*").over(Window.partitionBy(F.md5(normalize_ws("text")))) > 1
    base = docs.select(
        "source", "lang", "n_chars",
        n_tokens.alias("n_tokens"), q_ok.alias("q_ok"), is_dup.alias("is_dup"),
    )
    return base.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        (F.sum(F.col("is_dup").cast("long")).cast("double") / F.count("*")).alias("dup_share"),
        (F.sum(F.col("q_ok").cast("long")).cast("double") / F.count("*")).alias("quality_rate"),
    )


#: Head cap for the capped cosine variant: drop terms present in more than
#: n_docs // TFIDF_DF_CAP_DIVISOR of the TOP-K vectors. Divisor 2 kills
#: only the degenerate universal head (a term in EVERY short doc's top-K —
#: measured: 20k docs × one universal token → 200M candidate pairs, 100 s
#: local) while staying INACTIVE on every shipped SF (max df_top is 46-47%
#: of docs at sf0.001/0.01/0.1 — this corpus's tiny shared vocabulary puts
#: real signal in high-df_top terms, so a tighter cap like n//10 keeps 25
#: of ~5000 vector entries and degenerates the metric; measured before
#: choosing).
TFIDF_DF_CAP_DIVISOR = 2


@register(
    "tfidf_cosine_capped",
    oracle=f"""
        WITH {_TFIDF_VEC0_CTES},
        dt AS (SELECT term, COUNT(*) AS dt FROM vec0 GROUP BY term),
        vec AS (
            SELECT vec0.doc_id, vec0.term, vec0.score
            FROM vec0 JOIN dt USING (term) CROSS JOIN n
            WHERE dt.dt <= greatest(2, n.n_docs // {TFIDF_DF_CAP_DIVISOR})
        ),
        {_TFIDF_PAIRS_SQL}
    """,
    tags=("ext-text", "ext-dedup"),
)
def tfidf_cosine_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tfidf_cosine_pairs with the degenerate-head guard: terms present in
    more than n_docs // TFIDF_DF_CAP_DIVISOR of the TOP-K vectors are
    dropped from the vectors (norms included — cosine over CAPPED vectors,
    a deterministic documented metric change, same philosophy as
    ngram_jaccard_capped). A universal term carries near-zero idf weight
    but generates ALL pairs as candidates — the measured blowup is 200M
    candidate rows from 20k one-shared-token docs; under the cap that
    term never reaches the join. The cap formula is recomputed inside the
    oracle, so the driver hash-checks the planner's choice. Inactive on
    every shipped SF (pinned identical to the exact query in tests). The
    vector builder and pair arithmetic are the SAME code/SQL as the exact
    variant — only the dt filter differs.

    The dt (document-frequency-in-the-top-K-vectors) census rides a
    COUNT window partitioned by term, not an aggregate-and-join-back:
    the r4 shape evaluated the top-K window subplan twice (once for the
    dt aggregate, once through the semi-join — 2.5× the exact sibling's
    cost on an inactive cap), and the r5 persist fix still paid a full
    extra materialization of the vectors (1.55× of linear at ×10, ~2.8×
    the exact key). The window form touches the vector table ONCE — one
    shuffle by term, which the dt aggregate needed anyway, and none of
    the semi-join's second pass — so the capped plan is the exact plan
    plus one window over a TFIDF_VEC_K-per-doc table.

    The repartition("doc_id") before the pair stage undoes the window's
    LAYOUT side effect: the term window leaves the vector table hash-
    partitioned BY TERM, and since the candidate BHJ streams that cache,
    every pair a head term generates lands in the ONE task holding that
    term — the skew the exact sibling never has (its cache leaves the
    doc_id window evenly spread). Re-spreading a TFIDF_VEC_K·n_docs-row
    table is a trivial shuffle; measured on the cached pair stage at
    sf0.1: 8.0 s → 3.3 s, back in line with the exact key."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    vec0 = _tfidf_vec0(spark, sf_dir, docs=docs)
    return _cosine_pairs_from(_capped_vec_from(vec0, n))


#: DSIR selection size: the top-N documents by importance weight — at the
#: driver's correctness SF (sf0.01, ~6k docs) a meaningful subset; at
#: 100 TB this is the "sample k documents for the target mixture" knob.
DSIR_TOP_N = 100
#: The target distribution: the corpus's majority language. Production
#: DSIR targets a high-quality reference corpus (Wikipedia/books); the
#: synthetic corpus's stand-in for "looks like the target" is lang='en'.
DSIR_TARGET_LANG = "en"


#: The DSIR model CTEs (tokenize → dual-count → totals → per-token
#: log-ratio), shared by the selection key and the pipeline manifest so
#: the two oracles compute the identical model. Names (dsir_tok/cw/tot/
#: model) are prefixed to compose cleanly next to the keep-list chain.
_DSIR_CTES = f"""dsir_tok AS (
            SELECT doc_id, lang, unnest({_TOKS_SQL}) AS w FROM documents
        ),
        dsir_cw AS (
            SELECT w, COUNT(*) AS c_r,
                   COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS c_t
            FROM dsir_tok GROUP BY w
        ),
        dsir_tot AS (
            SELECT CAST(SUM(c_r) AS BIGINT) AS n_r,
                   CAST(SUM(c_t) AS BIGINT) AS n_t,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM dsir_cw
        ),
        dsir_model AS (
            SELECT w,
                   round(ln(CAST(c_t + 1 AS DOUBLE) / CAST(n_t + v AS DOUBLE)), 6)
                 - round(ln(CAST(c_r + 1 AS DOUBLE) / CAST(n_r + v AS DOUBLE)), 6)
                     AS delta
            FROM dsir_cw CROSS JOIN dsir_tot
        ),
        dsir_sel AS (
            SELECT t.doc_id,
                   COUNT(*) AS n_tokens,
                   round(CAST(SUM(CAST(m.delta AS DECIMAL(18,6))) AS DOUBLE), 6)
                       AS dsir_logweight
            FROM dsir_tok t JOIN dsir_model m USING (w)
            GROUP BY t.doc_id
            ORDER BY dsir_logweight DESC, t.doc_id
            LIMIT {DSIR_TOP_N}
        )"""


@register(
    "dsir_importance_resample",
    oracle=f"""
        WITH {_DSIR_CTES}
        SELECT doc_id, n_tokens, dsir_logweight FROM dsir_sel
        ORDER BY dsir_logweight DESC, doc_id
    """,
    tags=("ext-corpus", "pipeline"),
)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its tokens are under a TARGET unigram model than
    under the RAW-corpus model, and keep the top-N. The importance weight
    is Σ_tokens [ln p_target(w) − ln p_raw(w)] with add-one smoothing over
    the shared vocabulary; the target here is the majority-language slice
    (production targets a quality reference corpus).

    Float discipline follows unigram_logprob_score: each ln() is rounded
    to 6 decimals before the subtraction (the smoothed ratios are exact
    double divisions, identical across engines), and the per-doc sum runs
    through the fixed-point path so aggregation order cannot reorder
    doubles. Selection is a deterministic top-N (weight desc, doc_id) —
    the greedy variant of DSIR's Gumbel resampling, chosen because hash
    replayability matters more here than sampling noise.

    At 100 TB: ONE corpus scan builds both models simultaneously (the
    target count is a conditional aggregate of the same groupBy — no
    second pass), the |vocab|-row model broadcasts back against the token
    stream, the per-doc sum map-side combines to |docs| rows, and the
    top-N is a TakeOrdered, not a global sort. The corpus is read twice
    and shuffled never."""
    from ..functions.numeric import dsum

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
    # persisted because BOTH the totals branch and the model branch read
    # it — without the cache Catalyst plans two independent subtrees and
    # the corpus pays a third explode+aggregate pass (plan-verified)
    cw = (
        tok.groupBy("w")
        .agg(
            F.count("*").alias("c_r"),
            F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, F.lit(1))).alias("c_t"),
        )
        .persist()
    )
    tot = cw.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t"), F.count("*").alias("v")
    )
    lp = lambda c, n: F.round(  # noqa: E731 — two smoothed log-probs, one shape
        F.log((c + 1).cast("double") / (n + F.col("v")).cast("double")), 6
    )
    model = cw.crossJoin(F.broadcast(tot)).select(
        "w", (lp(F.col("c_t"), F.col("n_t")) - lp(F.col("c_r"), F.col("n_r"))).alias("delta")
    )
    return (
        tok.join(F.broadcast(model), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(dsum("delta"), 6).alias("dsir_logweight"),
        )
        .orderBy(F.col("dsir_logweight").desc(), "doc_id")
        .limit(DSIR_TOP_N)
    )


@register(
    "corpus_selection_manifest",
    oracle=None,  # set below — needs the keep-list CTEs from dedup.py
    tags=("ext-corpus", "pipeline"),
)
def corpus_selection_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's stages COMPOSED, per language: total docs, docs the
    dedup+quality keep-list keeps (corpus_keep_list verdicts), docs in
    the DSIR top-N, and the final selection (kept ∩ DSIR-selected) — the
    manifest a training-data owner reads before cutting a dataset. The
    Spark side literally calls the two registered stages (their plans
    compose; the shared gram/model subtrees are reused via their
    persisted intermediates), and the oracle splices the SAME keep-list
    and DSIR CTE chains into one statement — so the driver hash proves
    the composition computes exactly what the stages compute alone.

    At 100 TB each stage keeps its own scale story (documented on its
    key); the composition adds only id-keyed joins of id-sized frames
    and a |langs|-row aggregate."""
    from .dedup import corpus_keep_list

    docs = load_table(spark, sf_dir, "documents")
    verdicts = corpus_keep_list(spark, sf_dir)
    sel = dsir_importance_resample(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("in_dsir")
    )
    return (
        docs.select("doc_id", "lang")
        .join(verdicts, "doc_id")
        .join(sel, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("verdict") == "kept", F.lit(1))).alias("n_kept"),
            F.count(F.when(F.col("in_dsir"), F.lit(1))).alias("n_dsir_top"),
            F.count(
                F.when((F.col("verdict") == "kept") & F.col("in_dsir"), F.lit(1))
            ).alias("n_selected"),
        )
    )


# the manifest oracle splices dedup's keep-list chain next to the DSIR
# chain (CTE names verified disjoint); assigned post-definition because
# _KEEP_LIST_CTES lives in dedup.py and importing it at module top would
# be circular (dedup imports from this module's sibling functions)
def _set_manifest_oracle() -> None:
    import dataclasses

    from .dedup import _KEEP_LIST_CTES
    from .registry import _REGISTRY

    oracle = f"""
        WITH RECURSIVE {_KEEP_LIST_CTES},
        {_DSIR_CTES}
        SELECT d.lang,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE v.verdict = 'kept') AS n_kept,
               COUNT(*) FILTER (WHERE s.doc_id IS NOT NULL) AS n_dsir_top,
               COUNT(*) FILTER (WHERE v.verdict = 'kept' AND s.doc_id IS NOT NULL)
                   AS n_selected
        FROM documents d
        JOIN verdicts v ON d.doc_id = v.doc_id
        LEFT JOIN dsir_sel s ON d.doc_id = s.doc_id
        GROUP BY d.lang
    """
    _REGISTRY["corpus_selection_manifest"] = dataclasses.replace(
        _REGISTRY["corpus_selection_manifest"], oracle=oracle
    )


_set_manifest_oracle()


@register(
    "token_budget_select",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                       / length(text) AS score
            FROM documents WHERE length(text) > 0
        ),
        cum AS (
            SELECT doc_id, lang, n_tokens, score,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY score DESC, doc_id
                   ) AS BIGINT) AS cum_tokens,
                   CAST(FLOOR(CAST(0.25 AS DOUBLE) * SUM(n_tokens) OVER (
                       PARTITION BY lang
                   )) AS BIGINT) AS budget
            FROM scored
        )
        SELECT doc_id, lang, n_tokens, round(score, 6) AS score, cum_tokens
        FROM cum WHERE cum_tokens <= budget
    """,
    tags=("ext-text", "pipeline"),
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-aware corpus selection, the greedy form every
    pretraining run's data plan executes: per language, keep the
    highest-quality documents (alphabetic-ratio score, the
    quality_percentile_gate metric) until the language's running token
    sum crosses 25% of its total token mass — a per-language budget, not
    a global one, because a global greedy starves low-resource languages
    exactly as a global quality threshold mis-gates them (the
    quality_percentile_gate rationale, applied to budgets).

    Plan: ONE scan computes tokens + score, and BOTH the running sum and
    the language budget are windows over the same lang partitioning —
    they ride one Exchange and one sort (a groupBy+join budget would
    scan the documents twice; plan-audited, the cluster_balanced_sample
    lesson). The sort is per-language, never global; parallelism is
    |langs|-bounded only within the window stage (the packing caveat).
    At 100 TB the exact per-lang sort is replaced by quantile bucketing
    on score (approxQuantile → gate per bucket, refine only the boundary
    bucket) — the sketch-threshold half of that plan is registered as
    quality_gate_bucketed; the exact form here remains its ground
    truth, the same contract quality_percentile_gate documents."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    score = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
        / F.length("text")
    )
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        score.alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "doc_id")
    wl = Window.partitionBy("lang")
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "budget",
            F.floor(F.lit(0.25) * F.sum("n_tokens").over(wl)).cast("bigint"),
        )
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round("score", 6).alias("score"),
            "cum_tokens",
        )
    )


#: Output shard count of the manifest — dataloader-facing; a power of two
#: so downstream re-sharding (merge pairs / split halves) stays aligned.
N_SHARDS = 16


@register(
    "shard_manifest",
    oracle=f"""
        WITH per_doc AS (
            SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       % {N_SHARDS} AS shard_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   ('0x' || substr(md5({_NORM_SQL}), 1, 8))::BIGINT AS fp
            FROM documents
        )
        SELECT shard_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(fp) AS BIGINT) AS content_fp
        FROM per_doc GROUP BY shard_id
    """,
    tags=("ext-text", "pipeline"),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataloader-facing output contract of a corpus build: docs
    hash-assigned to N_SHARDS shards (md5-prefix bucket — the
    dataset_split_assign mechanism, so shard and split assignment share
    one engine-portable hash family), with per-shard doc count, token
    mass, and an ORDER-INDEPENDENT content fingerprint (sum of each
    doc's md5-of-normalized-text prefix, the doc_fingerprint hash —
    summed as BIGINT: each fp < 2^32 so the per-shard sum fits int64
    up to ~2^31 docs/shard, far past every shipped SF; at true 100 TB
    scale split the fingerprint into hi/lo 16-bit halves summed
    separately, or sum mod 2^62 — both stay engine-hashable, which
    DECIMAL(38,0) is not: decimal output columns are the one type the
    driver's value hasher rejects, and the registry bans them).
    Two runs that produce the same manifest produced the same corpus,
    shard by shard, without re-reading a byte of text — the cheap
    equality proof every resume/audit/replication step wants.

    Why hash sharding and not size-balanced packing: at 100 TB balanced
    packing needs a global sort or coordination; hash sharding is
    embarrassingly parallel, deterministic under re-runs AND under
    repartitioning, and statistically balanced (the manifest itself is
    the verification — the test pins the max/min token-mass ratio).
    Plan: pure scan-side column algebra + ONE |N_SHARDS|-group
    aggregate; no shuffle of document rows, no sort anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "bigint"
        )
        % N_SHARDS
    )
    fp = F.conv(F.substring(F.md5(normalize_ws("text")), 1, 8), 16, 10).cast("bigint")
    per_doc = docs.select(
        shard.alias("shard_id"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        fp.alias("fp"),
    )
    return per_doc.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("fp").alias("content_fp"),
    )


#: Temperature-mixture epoch budget: the fraction of the corpus's total
#: token mass one training epoch consumes under the planned mix.
MIX_BUDGET_FRAC = 0.3


@register(
    "corpus_mix_temperature",
    oracle=f"""
        WITH mass AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS token_mass
            FROM documents GROUP BY lang
            HAVING SUM(len({_TOKS_SQL})) > 0
        ),
        w AS (
            SELECT lang, n_docs, token_mass,
                   CAST(round(sqrt(CAST(token_mass AS DOUBLE)) * 1e9) AS BIGINT) AS sw
            FROM mass
        ),
        tot AS (
            SELECT CAST(SUM(sw) AS DOUBLE) / 1e9 AS sum_sqrt,
                   CAST(SUM(token_mass) AS BIGINT) AS total_mass
            FROM w
        )
        SELECT w.lang, w.n_docs, w.token_mass,
               round((CAST(w.sw AS DOUBLE) / 1e9) / t.sum_sqrt, 6) AS weight,
               CAST(FLOOR(round((CAST(w.sw AS DOUBLE) / 1e9) / t.sum_sqrt, 6)
                          * FLOOR(CAST({MIX_BUDGET_FRAC} AS DOUBLE) * t.total_mass))
                    AS BIGINT) AS target_tokens,
               round(round((CAST(w.sw AS DOUBLE) / 1e9) / t.sum_sqrt, 6)
                     * FLOOR(CAST({MIX_BUDGET_FRAC} AS DOUBLE) * t.total_mass)
                     / w.token_mass, 6) AS epochs
        FROM w CROSS JOIN tot t
    """,
    tags=("ext-text", "pipeline"),
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture planning (the XLM-R/mT5 move: sample
    language i with weight ∝ mass_i^α, α<1, so high-resource languages
    stop drowning the mix): per language, its token mass, its α=0.5
    mixture weight, the token target that weight implies under a
    MIX_BUDGET_FRAC-of-corpus epoch budget, and the implied EPOCHS over
    the language's own data — the >1.0 rows are exactly the low-resource
    languages the temperature up-samples (the repetition count a data
    plan must justify against memorization risk).

    α is pinned at 0.5 deliberately: IEEE-754 mandates correctly-rounded
    sqrt, so both engines produce bit-identical weights, while pow(x,
    0.7) carries no such guarantee (libm vs StrictMath last-bit drift
    would flake the driver hash). The sqrt values cross the cross-lang
    sum through the fixed-point form (round·1e9 → BIGINT), keeping the
    normalizer order-independent; every emitted double is divided from
    identical inputs and rounded to 6.

    Plan: one |langs|-group aggregate from the scan, then dimension-sized
    arithmetic against one broadcast scalar row — at 100 TB this is the
    scan-and-aggregate the corpus stats job already runs, with the
    mixture table falling out for free."""
    docs = load_table(spark, sf_dir, "documents")
    mass = (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens("text")).cast("bigint")).cast("bigint").alias("token_mass"),
        )
        # a language whose every text is empty has zero mass — its epochs
        # division would be 0/0 (NaN vs NULL across engines, a hash-flake
        # class); a zero-mass language has no mixture row by definition
        .filter(F.col("token_mass") > 0)
    )
    w = mass.withColumn(
        "sw", F.round(F.sqrt(F.col("token_mass").cast("double")) * F.lit(1e9)).cast("bigint")
    )
    tot = F.broadcast(
        w.agg(
            (F.sum("sw").cast("double") / F.lit(1e9)).alias("sum_sqrt"),
            F.sum("token_mass").cast("bigint").alias("total_mass"),
        )
    )
    weight = F.round((F.col("sw").cast("double") / F.lit(1e9)) / F.col("sum_sqrt"), 6)
    budget = F.floor(F.lit(MIX_BUDGET_FRAC) * F.col("total_mass"))
    return w.crossJoin(tot).select(
        "lang",
        "n_docs",
        "token_mass",
        weight.alias("weight"),
        F.floor(weight * budget).cast("bigint").alias("target_tokens"),
        F.round(weight * budget / F.col("token_mass"), 6).alias("epochs"),
    )


#: Sketch accuracy of the bucketed quality gate — the same knob
#: approx_quantile_contract pins (rank error ≤ n/accuracy per summary).
QG_ACC = 1000


@register(
    "quality_gate_bucketed",
    oracle=f"""
        SELECT lang, COUNT(*) AS n, TRUE AS gate_ok
        FROM documents WHERE length(text) > 0
        GROUP BY lang
    """,
    tags=("ext-text", "contract"),
)
def quality_gate_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the per-language quality gate, REGISTERED — both
    quality_percentile_gate and token_budget_select defer to "replace the
    exact per-lang sort with approxQuantile" in prose; this key is that
    plan, held to the approx_quantile_contract standard: ONE aggregate
    computes each language's approximate bottom-decile score threshold
    (percentile_approx, GK summaries — no per-lang sort anywhere), and
    the emitted boolean states that the threshold's admissible rank
    interval [count(<q)+1, count(≤q)] intersects the guarantee window
    ceil(0.1·n) ± (2n/acc + 1). DuckDB's quantile machinery differs from
    Spark's, so the THRESHOLD can't hash-match engines — the CONTRACT
    can: the oracle emits the same per-lang counts and literal TRUE, and
    a Spark upgrade (or merge-order sensitivity) that broke the sketch's
    guarantee flips the boolean and fails the driver hash.

    Plan: scan → one |langs|-group aggregate carrying (n, sketch) → one
    verification join computing the rank interval. At 100 TB you ship
    ONLY the first aggregate and gate `score >= q` inside the same scan
    next pass — the verification join is the eval harness, exactly the
    approx_distinct / approx_quantile_contract division of labor. The
    2ε+1 slack is the merged-summaries bound those keys document."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    score = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
        / F.length("text")
    )
    scored = docs.select("lang", score.alias("score"))
    stats = scored.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.percentile_approx("score", 0.1, QG_ACC).alias("q"),
    )
    ranked = (
        scored.join(F.broadcast(stats), "lang")
        .groupBy("lang")
        .agg(
            F.first("n").alias("n"),
            F.sum((F.col("score") < F.col("q")).cast("long")).alias("lo"),
            F.sum((F.col("score") <= F.col("q")).cast("long")).alias("hi"),
        )
    )
    eps = F.lit(2.0) * F.col("n").cast("double") / F.lit(float(QG_ACC)) + F.lit(1.0)
    target = F.ceil(F.lit(0.1) * F.col("n").cast("double")).cast("double")
    ok = ((F.col("lo") + 1).cast("double") <= target + eps) & (
        F.col("hi").cast("double") >= target - eps
    )
    return ranked.select("lang", "n", ok.alias("gate_ok"))


@register(
    "corpus_build_manifest",
    oracle=None,  # set below — needs the keep-list CTEs from dedup.py
    tags=("ext-corpus", "pipeline"),
)
def corpus_build_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's LAST MILE in one table — what ships into training,
    in which shard, at what epoch factor (r8 verdict item 6). Rows are
    (shard_id, lang): the SELECTED documents (keep-list 'kept' ∩ DSIR
    top-N — corpus_selection_manifest's n_selected population) hash-
    assigned to shard_manifest's N_SHARDS buckets, carrying per-cell doc
    count, token mass, the order-independent BIGINT content fingerprint
    (the shard_manifest audit primitive over exactly the shipped docs),
    and the language's epoch_factor from the temperature mixture plan
    (corpus_mix_temperature's epochs — the repetition factor the
    dataloader applies per language). This is the table a dataloader
    consumes: shard → files, epoch_factor → sampling repeat, fingerprint
    → resume/replication equality proof.

    Composition, not re-derivation: the Spark side literally calls the
    three registered stages (corpus_keep_list, dsir_importance_resample,
    corpus_mix_temperature) and the oracle splices their exact CTE
    chains (keep-list + DSIR + mx_-prefixed mixture) into one statement,
    so the driver hash proves the composed build computes what the
    stages compute alone — the corpus_selection_manifest discipline,
    extended through sharding and mixture.

    Scale shape: each stage keeps its own story; the composition adds
    id-keyed semi-join-shaped joins, scan-side shard/fp column algebra
    on the (small) selected set, one (shard, lang) aggregate, and a
    broadcast join against the |langs|-row mixture table. Nothing here
    outgrows the stages themselves at 100 TB."""
    from .dedup import corpus_keep_list

    docs = load_table(spark, sf_dir, "documents")
    kept = corpus_keep_list(spark, sf_dir).filter(
        F.col("verdict") == "kept"
    ).select("doc_id")
    dsir = dsir_importance_resample(spark, sf_dir).select("doc_id")
    mix = corpus_mix_temperature(spark, sf_dir).select(
        "lang", F.col("epochs").alias("epoch_factor")
    )
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "bigint"
        )
        % N_SHARDS
    )
    fp = F.conv(F.substring(F.md5(normalize_ws("text")), 1, 8), 16, 10).cast("bigint")
    selected = (
        docs.join(kept, "doc_id", "left_semi")
        .join(dsir, "doc_id", "left_semi")
        .select(
            shard.alias("shard_id"),
            "lang",
            F.size(tokens("text")).cast("bigint").alias("n_tokens"),
            fp.alias("fp"),
        )
    )
    return (
        selected.groupBy("shard_id", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("fp").alias("content_fp"),
        )
        .join(F.broadcast(mix), "lang")
        .select(
            "shard_id", "lang", "n_docs", "total_tokens", "content_fp",
            "epoch_factor",
        )
    )


def _set_build_manifest_oracle() -> None:
    import dataclasses

    from .dedup import _KEEP_LIST_CTES
    from .registry import _REGISTRY

    oracle = f"""
        WITH RECURSIVE {_KEEP_LIST_CTES},
        {_DSIR_CTES},
        mx_mass AS (
            SELECT lang, CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS token_mass
            FROM documents GROUP BY lang
            HAVING SUM(len({_TOKS_SQL})) > 0
        ),
        mx_w AS (
            SELECT lang, token_mass,
                   CAST(round(sqrt(CAST(token_mass AS DOUBLE)) * 1e9) AS BIGINT) AS sw
            FROM mx_mass
        ),
        mx_tot AS (
            SELECT CAST(SUM(sw) AS DOUBLE) / 1e9 AS sum_sqrt,
                   CAST(SUM(token_mass) AS BIGINT) AS total_mass
            FROM mx_w
        ),
        mx AS (
            SELECT w.lang,
                   round(round((CAST(w.sw AS DOUBLE) / 1e9) / t.sum_sqrt, 6)
                         * FLOOR(CAST({MIX_BUDGET_FRAC} AS DOUBLE) * t.total_mass)
                         / w.token_mass, 6) AS epoch_factor
            FROM mx_w w CROSS JOIN mx_tot t
        ),
        sel_docs AS (
            SELECT d.doc_id, d.lang,
                   ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
                       % {N_SHARDS} AS shard_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   ('0x' || substr(md5({_NORM_SQL}), 1, 8))::BIGINT AS fp
            FROM documents d
            WHERE EXISTS (SELECT 1 FROM verdicts v
                          WHERE v.doc_id = d.doc_id AND v.verdict = 'kept')
              AND EXISTS (SELECT 1 FROM dsir_sel s WHERE s.doc_id = d.doc_id)
        )
        SELECT g.shard_id, g.lang, g.n_docs, g.total_tokens, g.content_fp,
               mx.epoch_factor
        FROM (
            SELECT shard_id, lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(SUM(fp) AS BIGINT) AS content_fp
            FROM sel_docs GROUP BY shard_id, lang
        ) g JOIN mx USING (lang)
    """
    _REGISTRY["corpus_build_manifest"] = dataclasses.replace(
        _REGISTRY["corpus_build_manifest"], oracle=oracle
    )


_set_build_manifest_oracle()


#: The arriving-batch convention for the manifest diff — the similarity
#: family's INCR_BATCH_MOD (vec_id ≡ 7 mod 8 is the batch), applied to
#: doc_id so the corpus and vector surfaces simulate the SAME ingest.
DIFF_BATCH_MOD = 8


@register(
    "shard_manifest_diff",
    oracle=f"""
        WITH per_doc AS (
            SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       % {N_SHARDS} AS shard_id,
                   CAST(doc_id % {DIFF_BATCH_MOD} = {DIFF_BATCH_MOD - 1} AS INT)
                       AS is_added,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   ('0x' || substr(md5({_NORM_SQL}), 1, 8))::BIGINT AS fp
            FROM documents
        )
        SELECT shard_id,
               COUNT(*) FILTER (WHERE is_added = 0) AS n_docs_base,
               COUNT(*) FILTER (WHERE is_added = 1) AS n_docs_added,
               CAST(COALESCE(SUM(n_tokens) FILTER (WHERE is_added = 1), 0)
                    AS BIGINT) AS tokens_added,
               CAST(COALESCE(SUM(fp) FILTER (WHERE is_added = 0), 0)
                    AS BIGINT) AS fp_base,
               CAST(COALESCE(SUM(fp) FILTER (WHERE is_added = 1), 0)
                    AS BIGINT) AS fp_delta
        FROM per_doc GROUP BY shard_id
    """,
    tags=("ext-text", "pipeline"),
)
def shard_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-over-build shard audit — what changed between the standing
    corpus build and the build after an ingest batch landed (batch =
    doc_id ≡ 7 mod DIFF_BATCH_MOD, the similarity family's arriving-batch
    convention on the document surface). Per shard: base/added doc
    counts, the added token mass, and the fingerprint algebra that makes
    the audit O(batch) instead of O(corpus): shard_manifest's content
    fingerprint is a SUM, so it is ADDITIVE — fp(after) − fp(before) is
    exactly the fingerprint of the added documents. A resume/audit job
    therefore verifies an incremental build by fingerprinting ONLY the
    batch and checking fp_base + fp_delta against the new manifest; no
    re-read of shipped shards, ever. (The same additivity gives free
    DELETION auditing — a removed doc subtracts its fp — which
    content-hash or order-sensitive fingerprints cannot do.)

    Plan shape: identical to shard_manifest — pure scan-side column
    algebra plus ONE |N_SHARDS|-group conditional aggregate; the diff
    costs one extra flag column over the manifest it extends. Both
    emitted fps are BIGINT (the r9 decimal rule: each fp < 2^32, sums
    fit int64 at every shipped SF; hi/lo split at true 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "bigint"
        )
        % N_SHARDS
    )
    fp = F.conv(F.substring(F.md5(normalize_ws("text")), 1, 8), 16, 10).cast("bigint")
    is_added = (
        F.pmod(F.col("doc_id"), F.lit(DIFF_BATCH_MOD)) == DIFF_BATCH_MOD - 1
    ).cast("int")
    per_doc = docs.select(
        shard.alias("shard_id"),
        is_added.alias("is_added"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        fp.alias("fp"),
    )
    zero = F.lit(0).cast("bigint")
    return per_doc.groupBy("shard_id").agg(
        F.count(F.when(F.col("is_added") == 0, 1)).alias("n_docs_base"),
        F.count(F.when(F.col("is_added") == 1, 1)).alias("n_docs_added"),
        F.coalesce(
            F.sum(F.when(F.col("is_added") == 1, F.col("n_tokens"))), zero
        ).cast("bigint").alias("tokens_added"),
        F.coalesce(
            F.sum(F.when(F.col("is_added") == 0, F.col("fp"))), zero
        ).cast("bigint").alias("fp_base"),
        F.coalesce(
            F.sum(F.when(F.col("is_added") == 1, F.col("fp"))), zero
        ).cast("bigint").alias("fp_delta"),
    )
