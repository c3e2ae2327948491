"""Scalar text helpers (SURVEY.md §2.9).

All JVM-side Column expressions — no Python UDFs — so they stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cut_text(col: str | Column, limit: int = 128) -> Column:
    """Clip text to ``limit`` chars and append '...' when clipped.

    Reference semantics: feeder_postgres.py:105-109 (``cut_text``).
    """
    c = _c(col)
    return F.when(F.length(c) > limit, F.concat(F.substring(c, 1, limit), F.lit("..."))).otherwise(c)


def normalize_ws(col: str | Column) -> Column:
    """Lowercase + collapse whitespace runs + trim — canonical text form used
    by dedup fingerprints and tokenization."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization → array<string> (notebook cells 15/27 use
    ``str.split``; split on space after whitespace normalization)."""
    return F.split(normalize_ws(col), " ")


def quality_signals(col: str | Column = "text") -> tuple[Column, Column]:
    """(n_tokens, alpha_ratio) — the per-document signals the quality gate
    reads. One definition, so the gate's inputs cannot drift between the
    registered quality keys and the composites that embed them."""
    t = _c(col)
    n_tokens = F.size(tokens(t)).cast("int")
    alpha_ratio = (
        F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("double") / F.length(t)
    )
    return n_tokens, alpha_ratio


def quality_ok(
    n_chars: str | Column, n_tokens: Column, alpha_ratio: Column
) -> Column:
    """THE C4/Gopher-style gate predicate — length band, token floor,
    alphabetic-ratio floor. Shared by doc_quality_filter,
    corpus_prep_stats, corpus_keep_list, and dataset_card_stats (one
    definition: retuning the band in one key retunes all four; the
    oracles bake the same literals and are pinned by parity). Callers
    gate empty text themselves (filter length > 0 or a when/otherwise):
    alpha_ratio is NULL-by-zero-division there, and each call site
    documents its own empty-document policy."""
    return _c(n_chars).between(120, 400) & (n_tokens >= 20) & (alpha_ratio > 0.7)


#: Boilerplate-span defaults shared by the registered boilerplate queries
#: (plans/textops.py — their oracle SQL bakes these in) and the corpus
#: API stage (corpus.boilerplate_filter) — ONE definition so the two
#: surfaces cannot drift.
BOILER_NGRAM = 5
BOILER_MIN_DOCS = 3


def token_ngrams(toks_col: str | Column, n: int) -> Column:
    """Overlapping token ``n``-gram array over a *materialized* token-array
    column — THE one gram definition (dedup bigrams, boilerplate 5-grams,
    the corpus API all build windows through here, so the span shape
    cannot drift between the registered queries and the pipeline stages).

    Takes a column reference to the token ARRAY, not the tokenization
    expression: expressions inlined into a higher-order-function lambda
    are re-evaluated per array element (no CSE across lambda boundaries),
    which turns an O(len) regexp into O(len²) per row — materialize the
    array in a prior projection (measured in plans/dedup.py: 12.8s →
    0.9s for the bigram stage at sf0.1). The ≥n guard is load-bearing:
    Spark's sequence(1, 0) auto-steps *descending* to [1, 0], so a
    shorter-than-n document would evaluate element_at past the array end
    and throw; the guard returns an empty array instead (DuckDB's
    generate_series(1, 0) is empty — oracle replays never hit this).

    Second materialization rule (r12, found in repetition_ngram_ratio):
    a downstream FILTER on the n-gram array (e.g. ``size(grams) >= 1``)
    gets pushed below the projections into the scan filter with the
    whole pipeline inlined — the tokenizer then re-evaluates per element
    inside the filter, O(len²) per row again. Guard on the PRE-ARRAY
    column instead (``size(toks) >= n`` is equivalent and stays cheap in
    the pushed filter)."""
    toks = _c(toks_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, i + k) if k else F.element_at(toks, i) for k in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


#: PII patterns a training-data scrub redacts, applied longest-match-first
#: so an email is one [EMAIL], not a [USER]@[HOST] mangle. All three are
#: plain POSIX-class regexes that mean the same thing to Spark's and
#: DuckDB's regex engines, so a future registered query can oracle-check
#: the redaction verbatim (stage for the r3 registry rotation).
_PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+?\d[\d\s().-]{7,}\d", "[PHONE]"),
)


def redact_pii(col: str | Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholders — the standard scrub before corpus publication.
    Pure regexp_replace chain: scan-side, codegen'd, no UDF."""
    out = _c(col)
    for pattern, token in _PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out
