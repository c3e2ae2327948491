"""Tests for the physical-layer decisions: fixed-point money aggregation,
nanos-domain time-filter pushdown, and the dedup building blocks.

These encode *intent* the oracle-parity suite cannot: parity proves the
current data agrees, these prove the mechanisms (rounding behavior, filter
placement, bit packing) hold on adversarial inputs.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from vacancy_analyser_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from vacancy_analyser_spark.functions.text import tokens
from vacancy_analyser_spark.io import load_table
from vacancy_analyser_spark.plans.dedup import _bigrams


# --- fixed-point aggregation -------------------------------------------------

ADVERSARIAL_MONEY = [
    0.07,  # classic binary-unrepresentable cent value
    123.455,  # odd digit at the rounding boundary
    -0.000001,  # smallest negative at scale 6
    0.0000005,  # half-way at the 6th decimal
    -98765.432101,
    1e9 + 0.25,
    0.1 + 0.2,  # 0.30000000000000004
    None,
]


def test_dsum_davg_match_duckdb_decimal_semantics(spark):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL_MONEY], "x double")
    got = df.agg(dsum("x").alias("s"), davg("x").alias("a")).collect()[0]
    con = duckdb.connect()
    vals = ", ".join("(NULL)" if v is None else f"({v!r})" for v in ADVERSARIAL_MONEY)
    want = con.sql(
        f"SELECT {dsum_sql('x')} AS s, {davg_sql('x')} AS a FROM (VALUES {vals}) t(x)"
    ).fetchone()
    assert got["s"] == want[0]  # bit-for-bit, not approx
    assert got["a"] == want[1]


def test_dsum_is_partitioning_invariant(spark):
    rows = [(float(i) * 0.000003,) for i in range(1, 500)]
    df1 = spark.createDataFrame(rows, "x double").repartition(1)
    df7 = spark.createDataFrame(rows, "x double").repartition(7)
    assert df1.agg(dsum("x")).collect() == df7.agg(dsum("x")).collect()


# --- ts_filters pushdown -----------------------------------------------------


def test_ts_filters_match_post_conversion_filter(spark, sf_dir):
    lo, hi = "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    pushed = load_table(spark, sf_dir, "events", ts_filters=[("ts", ">=", lo), ("ts", "<", hi)])
    naive = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(lo).cast("timestamp")) & (F.col("ts") < F.lit(hi).cast("timestamp"))
    )
    assert pushed.count() == naive.count()
    assert sorted(r["event_id"] for r in pushed.select("event_id").collect()) == sorted(
        r["event_id"] for r in naive.select("event_id").collect()
    )


def test_ts_filters_reach_parquet_scan(spark, sf_dir):
    pushed = load_table(
        spark, sf_dir, "events", ts_filters=[("ts", ">=", "2024-01-05 00:00:00")]
    )
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts," in plan.split("PushedFilters")[1].split("]")[0]


def test_ts_filters_on_native_timestamp_column(spark, sf_dir):
    # lineitem.l_shipdate is a real timestamp column — the same API must
    # filter it without the nanos translation.
    df = load_table(
        spark, sf_dir, "lineitem", ts_filters=[("l_shipdate", "<=", "1998-01-01 00:00:00")]
    )
    mx = df.agg(F.max("l_shipdate").cast("string")).collect()[0][0]
    assert mx is not None and mx <= "1998-01-01 00:00:00"


# --- dedup building blocks ---------------------------------------------------


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        ("a b c", ["a b", "b c"]),
        ("  A \n B  ", ["a b"]),  # normalization folds case + whitespace
        ("solo", []),
        ("", []),
        ("чёрный кот спит", ["чёрный кот", "кот спит"]),  # unicode survives
    ],
)
def test_bigrams_edges(spark, text, expected):
    df = spark.createDataFrame([(text,)], "text string").select(
        tokens("text").alias("toks")
    )
    got = df.select(_bigrams("toks").alias("b")).collect()[0]["b"]
    assert got == expected


def test_jaccard_bitmap_matches_bruteforce(spark, sf_dir, monkeypatch):
    """The vocab-bitmap plan must equal a literal per-pair set Jaccard."""
    from vacancy_analyser_spark.plans.dedup import ngram_jaccard_dedup

    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_dedup(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    import re

    sets = {}
    for row in docs:
        toks = re.sub(r"\s+", " ", row["text"].lower()).strip().split(" ")
        sets[row["doc_id"]] = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= 0.5:
                want[(a, b)] = inter / union
    assert got == pytest.approx(want)


def test_jaccard_regime_paths_agree(spark, sf_dir):
    """The density-regime chooser is a planner rule, not a semantic switch:
    both physical plans must return identical pairs and values."""
    from vacancy_analyser_spark.plans.dedup import (
        _doc_bigrams,
        _jaccard_bitmap,
        _jaccard_countjoin,
    )

    g = _doc_bigrams(spark, sf_dir).persist()
    n_vocab = g.select("bigram").distinct().count()
    bitmap = sorted(map(tuple, _jaccard_bitmap(g, n_vocab).collect()))
    countjoin = sorted(map(tuple, _jaccard_countjoin(g).collect()))
    g.unpersist()
    assert bitmap == countjoin
    assert len(bitmap) > 0  # the fixture corpus does contain near-dups
