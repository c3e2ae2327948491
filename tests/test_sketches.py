"""heavy_hitters: the Misra-Gries candidate pass may only ever bound the
candidate set — the reported items and counts must be EXACTLY the
brute-force answer, at every threshold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vacancy_analyser_spark.operators.sketches import heavy_hitters


def _exact(items, col, frac):
    total = items.count()
    return {
        (r[col], r["freq"])
        for r in items.groupBy(col)
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > frac * total)
        .collect()
    }


@pytest.mark.parametrize("frac", [0.02, 0.05, 0.2])
def test_matches_bruteforce_on_skewed_data(spark, frac):
    # zipf-ish: item i appears ~1000/(i+1) times → a heavy head, long tail
    rows = [(f"item-{i}",) for i in range(60) for _ in range(1000 // (i + 1))]
    items = spark.createDataFrame(rows, "token string").repartition(8)
    got = {(r["token"], r["freq"]) for r in heavy_hitters(items, "token", frac).collect()}
    assert got == _exact(items, "token", frac)
    assert got  # the head exists at every tested threshold


def test_matches_bruteforce_on_corpus_tokens(spark, sf_dir):
    from vacancy_analyser_spark.functions.text import tokens
    from vacancy_analyser_spark.io import load_table

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("token"))
    )
    got = {(r["token"], r["freq"]) for r in heavy_hitters(toks, "token", 0.005).collect()}
    assert got == _exact(toks, "token", 0.005)


def test_sketch_is_bounded(spark):
    # the candidate pass must emit at most k rows per partition
    from vacancy_analyser_spark.operators.sketches import _mg_partition

    import pandas as pd

    k = 10
    batches = iter([pd.DataFrame({"t": [f"v{i % 500}" for i in range(5000)]})])
    (out,) = list(_mg_partition(k, "t")(batches))
    assert len(out) <= k


def test_nan_heavy_hitter_counts_as_null(spark):
    """A NaN-valued heavy hitter on a double column must surface (counted
    under the NULL group, like the pandas pass normalizes it) — not be
    silently dropped by the NULL≠NaN mismatch in the verify join."""
    rows = [(float("nan"),)] * 60 + [(1.5,)] * 30 + [(float(i),) for i in range(10)]
    items = spark.createDataFrame(rows, "score double").repartition(4)
    got = {(r["score"], r["freq"]) for r in heavy_hitters(items, "score", 0.25).collect()}
    assert got == {(None, 60), (1.5, 30)}
