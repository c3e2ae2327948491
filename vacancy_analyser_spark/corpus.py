"""Composable training-corpus pipeline API (SURVEY §2.11 [ext]).

The registered queries (plans/textops.py, plans/dedup.py) are the
driver-visible, oracle-checked instances of these stages; this module is
the *programmatic* surface a pipeline author composes:

    docs = load_table(spark, sf_dir, "documents")
    corpus = quality_gate(docs)
    corpus = dedup_exact(corpus)
    corpus = dedup_near(corpus, ngram_jaccard_dedup(spark, sf_dir))
    corpus = decontaminate(corpus, benchmark_docs)
    corpus = assign_split(corpus)
    packed = pack_sequences(corpus.filter("split = 'train'"))

Every stage is DataFrame → DataFrame (lazy, single logical plan across the
whole chain — Catalyst sees the composite, so scan-side predicates from a
later stage still push down past earlier ones where legal). Each stage's
scale rationale lives in the matching query's docstring; parameters here
are the knobs a real run tunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .functions.text import (
    BOILER_MIN_DOCS,
    BOILER_NGRAM,
    normalize_ws,
    token_ngrams,
    tokens,
)

__all__ = [
    "quality_gate",
    "boilerplate_filter",
    "dedup_exact",
    "dedup_near",
    "dedup_keep_best",
    "decontaminate",
    "assign_split",
    "pack_sequences",
    "mix_resample",
    "sample_per_group",
    "strip_boilerplate",
    "novelty_scores",
    "contamination_report",
    "dataset_card",
]


def _bigrams_of(text_col: str = "text") -> Column:
    return token_ngrams(tokens(text_col), 2)


def quality_gate(
    docs: DataFrame,
    min_chars: int = 120,
    max_chars: int = 400,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.7,
) -> DataFrame:
    """C4/Gopher-style heuristic gate. Adds `n_tokens`; scan-side only."""
    out = docs.filter(F.length("text") > 0).withColumn(
        "n_tokens", F.size(tokens("text")).cast("int")
    )
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
        / F.length("text")
    )
    return out.filter(
        F.col("n_chars").between(min_chars, max_chars)
        & (F.col("n_tokens") >= min_tokens)
        & (alpha_ratio > min_alpha_ratio)
    )


def boilerplate_filter(
    docs: DataFrame,
    max_share: float = 0.5,
    min_docs: int = BOILER_MIN_DOCS,
    ngram: int = BOILER_NGRAM,
    key: str = "doc_id",
) -> DataFrame:
    """Drop documents whose token-``ngram`` positions are more than
    ``max_share`` covered by corpus-level boilerplate spans (spans in ≥
    ``min_docs`` distinct docs) — the API form of the registered
    boilerplate_ngrams / doc_boilerplate_share pair. Documents shorter
    than the span width carry no positions and pass (nothing to score).

    Lazy like the other stages: the boilerplate set and the share are
    joins over the same input frame, one composite plan. The caller
    persists ``docs`` first when the input is itself expensive (the
    frame is read three ways here)."""
    toks = docs.select(key, tokens("text").alias("_t"))
    g = toks.select(key, F.explode(token_ngrams("_t", ngram)).alias("_gram"))
    boiler = (
        g.groupBy("_gram")
        .agg(F.countDistinct(key).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gram")
    )
    pos = g.groupBy(key).agg(F.count("*").alias("_n_pos"))
    hit = g.join(boiler, "_gram").groupBy(key).agg(F.count("*").alias("_n_boiler"))
    over = (
        pos.join(hit, key)
        .filter(F.col("_n_boiler").cast("double") / F.col("_n_pos") > max_share)
        .select(key)
    )
    return docs.join(over, key, "left_anti")


def dedup_exact(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Keep min(key) per normalized-content fingerprint — one shuffle on
    the 128-bit hash, window form (no aggregate-and-join-back)."""
    fp = F.md5(normalize_ws("text"))
    return (
        docs.withColumn("_fp", fp)
        .withColumn("_keep", F.min(key).over(Window.partitionBy("_fp")))
        .filter(F.col(key) == F.col("_keep"))
        .drop("_fp", "_keep")
    )


def dedup_near(docs: DataFrame, pairs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Collapse near-dup CLUSTERS to their canonical (minimum-key) member:
    connected components over a pair table (any tier's output — Jaccard,
    MinHash-LSH, SimHash, embedding-LSH pairs all fit the (a_id, b_id)
    shape), then anti-join the non-canonical members away. Docs absent
    from every pair pass through untouched. Pairs alone under-delete:
    A~B plus B~C must drop BOTH B and C, which only the transitive
    closure sees (the registered near_dup_groups query is the
    driver-checked instance of the same labeling).

    Note this stage is eager where the others are lazy: components are an
    iterative fixpoint (operators/components.py), so the pair table is
    consumed here, not fused into the surrounding plan."""
    from .operators.components import connected_components

    comp = connected_components(pairs.select(F.col("a_id"), F.col("b_id")))
    losers = (
        comp.filter(F.col("component") != F.col("id"))
        .select(F.col("id").alias(key))
    )
    return docs.join(losers, key, "left_anti")


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str = "n_chars",
    key: str = "doc_id",
) -> DataFrame:
    """dedup_near with a QUALITY-argmax keeper instead of the canonical
    min-key member: per near-dup component, retain the row maximizing
    ``score_col`` (key tie-break) — the registered dedup_keep_best query
    is the driver-checked instance of the same selection. Eager like
    dedup_near (the component fixpoint is iterative)."""
    from .operators.components import connected_components

    comp = connected_components(pairs.select(F.col("a_id"), F.col("b_id")))
    members = comp.select(F.col("id").alias(key), F.col("component").alias("_grp"))
    scored = members.join(docs.select(key, score_col), key)
    w = Window.partitionBy("_grp").orderBy(F.col(score_col).desc(), key)
    losers = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(key)
    )
    return docs.join(losers, key, "left_anti")


def decontaminate(
    train: DataFrame, benchmark: DataFrame, min_shared: int = 3, key: str = "doc_id"
) -> DataFrame:
    """Remove training docs sharing ≥min_shared distinct bigrams with the
    benchmark corpus. Benchmark shingles broadcast when small (the real
    case: eval suites are fixed-size) — AQE decides, no hint."""
    bench_grams = benchmark.select(F.explode(_bigrams_of()).alias("bigram")).distinct()
    train_grams = train.select(key, F.explode(_bigrams_of()).alias("bigram")).distinct()
    flagged = (
        train_grams.join(bench_grams, "bigram")
        .groupBy(key)
        .agg(F.count("*").alias("_n_shared"))
        .filter(F.col("_n_shared") >= min_shared)
        .select(key)
    )
    return train.join(flagged, key, "left_anti")


def assign_split(
    docs: DataFrame,
    key: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic key-hash split (stable under re-runs/partitionings).
    Adds `split` ∈ {train, val, test}."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10).cast("bigint")
        % 100
    )
    return docs.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 4096,
    shard_docs: int = 200,
    key: str = "doc_id",
    group: str = "lang",
) -> DataFrame:
    """Contiguous token-budget binning per (group, shard). Adds `shard` and
    `bin_id`; requires `n_tokens` (from quality_gate or caller)."""
    out = docs.withColumn("shard", F.expr(f"{key} div {shard_docs}"))
    w = Window.partitionBy(group, "shard").orderBy(key).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return out.withColumn(
        "bin_id",
        F.floor(running_before.cast("double") / budget_tokens).cast("bigint"),
    )


def sample_per_group(
    docs: DataFrame, n: int, key: str = "doc_id", group: str = "lang"
) -> DataFrame:
    """Deterministic fixed-size sample per group (the distributed stand-in
    for reservoir sampling): rank by md5(key) within each group, keep the
    first ``n``. Reproducible row-local state — never rand() — so re-runs,
    repartitionings, and a SQL oracle all agree. One shuffle on ``group``;
    at scale the rank prunes map-side via WindowGroupLimit before the
    exchange."""
    order = F.md5(F.col(key).cast("string"))
    rn = F.row_number().over(Window.partitionBy(group).orderBy(order, key))
    return docs.withColumn("_rn", rn).filter(F.col("_rn") <= n).drop("_rn")


def mix_resample(
    docs: DataFrame, weights: dict[str, float], default_weight: float = 1.0, key: str = "doc_id", group: str = "lang"
) -> DataFrame:
    """Deterministic fractional upsampling to a mixture recipe: each doc
    repeats floor(w) times plus one iff its key-hash bucket < frac(w)
    (expected multiplicity exactly w). Adds `rep` (1..n)."""
    w: Column = F.lit(default_weight)
    for g, wt in weights.items():
        w = F.when(F.col(group) == g, F.lit(float(wt))).otherwise(w)
    bucket = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10).cast("bigint")
        % 10000
    )
    n_rep = (
        F.floor(w).cast("int")
        + F.when(bucket < (w - F.floor(w)) * 10000, F.lit(1)).otherwise(F.lit(0))
    )
    return docs.withColumn("rep", F.explode(F.sequence(F.lit(1), n_rep)))


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int = BOILER_MIN_DOCS,
    ngram: int = BOILER_NGRAM,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """REWRITE documents with boilerplate spans removed (the apply form of
    boilerplate_filter's drop form, mirroring the registered
    boilerplate_strip): any token covered by a flagged ``ngram``-gram
    (span in ≥ ``min_docs`` distinct docs) is cut, and ``text_col`` is
    replaced by the space-rejoined remainder in original order.
    Documents whose every token is covered drop out (inner join —
    nothing left to keep), same rule as the registered key. Coverage
    expands flagged gram STARTS by position only; document text never
    rides the candidate shuffle."""
    toks = docs.select(key, tokens(text_col).alias("_t"))
    tok = toks.select(key, F.posexplode("_t").alias("_pos", "_token"))
    g = toks.select(key, F.posexplode(token_ngrams("_t", ngram)).alias("_p", "_gram"))
    boiler = (
        g.groupBy("_gram")
        .agg(F.countDistinct(key).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gram")
    )
    covered = (
        g.join(boiler, "_gram", "left_semi")
        .select(
            key,
            F.explode(F.sequence(F.col("_p"), F.col("_p") + F.lit(ngram - 1))).alias("_pos"),
        )
        .distinct()
    )
    kept = tok.join(covered, [key, "_pos"], "left_anti")
    clean = kept.groupBy(key).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_token"))),
                lambda s: s["_token"],
            ),
        ).alias("_clean")
    )
    return (
        docs.join(clean, key, "inner")
        .withColumn(text_col, F.col("_clean"))
        .drop("_clean")
    )


def novelty_scores(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(key, n_grams, n_novel, novelty) per document — the fraction of a
    doc's distinct word-bigrams not seen in any earlier document (order =
    ascending ``key``; pass the crawl-timestamp column as ``key`` for
    true ingest order). The API form of ngram_novelty_score — the
    curriculum/mined-out signal, composable before sampling stages."""
    toks = docs.select(key, tokens(text_col).alias("_t"))
    g = toks.select(
        key, F.explode(F.array_distinct(token_ngrams("_t", 2))).alias("_gram")
    )
    firsts = g.groupBy("_gram").agg(F.min(key).alias("_first"))
    novel = (F.col("_first") == F.col(key)).cast("long")
    return (
        g.join(firsts, "_gram")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel).cast("double") / F.count("*")).alias("novelty"),
        )
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    min_span: int = 5,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Longest contiguous benchmark-overlap run per document — the API
    generalization of the registered contamination_spans key, taking a
    REAL benchmark frame (any DataFrame with ``text_col``) instead of
    the harness's synthetic held-out split. Returns (key, max_span,
    n_matched, n_spans) for documents whose longest run of word-bigram
    positions matching the benchmark's gram set reaches ``min_span``.
    The benchmark's distinct gram vocabulary is the semi-join build side
    — fixed-size in production, so it broadcasts and the corpus side
    never shuffles for the gate."""
    toks = docs.select(key, tokens(text_col).alias("_t"))
    pg = toks.select(key, F.posexplode(token_ngrams("_t", 2)).alias("_pos", "_gram"))
    bt = benchmark.select(tokens(text_col).alias("_t"))
    bench = bt.select(F.explode(token_ngrams("_t", 2)).alias("_gram")).distinct()
    matched = pg.join(bench, "_gram", "left_semi")
    w = Window.partitionBy(key).orderBy("_pos")
    isl = matched.select(key, (F.col("_pos") - F.row_number().over(w)).alias("_grp"))
    spans = isl.groupBy(key, "_grp").agg(F.count("*").alias("_len"))
    return (
        spans.groupBy(key)
        .agg(
            F.max("_len").alias("max_span"),
            F.sum("_len").alias("n_matched"),
            F.count("*").alias("n_spans"),
        )
        .filter(F.col("max_span") >= min_span)
    )


def dataset_card(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
    n_chars_col: str = "n_chars",
) -> DataFrame:
    """The release table per ``group_cols`` cell: doc count, total tokens,
    mean length, exact-duplicate share (normalized-content fingerprint
    seen more than once anywhere in the frame), quality-gate pass rate —
    the API form of dataset_card_stats, for a frame mid-pipeline (run it
    before AND after cleaning; the delta is the cleaning report)."""
    from .functions.text import quality_ok, quality_signals

    nt, alpha_ratio = quality_signals(text_col)
    q_ok = F.when(F.length(text_col) == 0, F.lit(False)).otherwise(
        quality_ok(n_chars_col, nt, alpha_ratio)
    )
    is_dup = F.count("*").over(Window.partitionBy(F.md5(normalize_ws(text_col)))) > 1
    base = docs.select(
        *group_cols,
        F.col(n_chars_col).alias("_nc"),
        nt.cast("bigint").alias("_nt"),
        q_ok.alias("_q"),
        is_dup.alias("_d"),
    )
    return base.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        (F.sum("_nc").cast("double") / F.count("*")).alias("avg_chars"),
        (F.sum(F.col("_d").cast("long")).cast("double") / F.count("*")).alias("dup_share"),
        (F.sum(F.col("_q").cast("long")).cast("double") / F.count("*")).alias("quality_rate"),
    )
